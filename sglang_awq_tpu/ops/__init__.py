"""Pallas TPU kernels and XLA fallbacks for the serving hot path.

Inventory (TPU-native re-design of the reference's CUDA kernel set,
SURVEY.md §2.7):
  awq_matmul.py       fused INT4 dequant + bf16 matmul (replaces marlin GEMM,
                      sgl-kernel/csrc/gemm/marlin/ + awq_kernel.cu)
  paged_attention.py  decode-time paged flash attention over the KV pool
                      (replaces triton_ops/decode_attention.py semantics)
  flash_prefill.py    causal flash attention with prefix offset for extend
                      (replaces triton_ops/extend_attention.py semantics)
"""
