"""Pallas TPU kernels and XLA fallbacks for the serving hot path.

Inventory (TPU-native re-design of the reference's CUDA kernel set,
SURVEY.md §2.7):
  awq_matmul.py        fused INT4 dequant + bf16 matmul (replaces marlin GEMM,
                       sgl-kernel/csrc/gemm/marlin/ + awq_kernel.cu)
  ragged_attention.py  paged attention over the combined token-major KV pool:
                       ragged_decode (decode + spec verify) and ragged_extend
                       (batched multi-request prefill) — replaces
                       triton_ops/decode_attention.py + extend_attention.py
  kv_write.py          in-place KV pool row/page writes
"""
