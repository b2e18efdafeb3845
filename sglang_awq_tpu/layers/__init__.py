"""Model building blocks (functional JAX).

The reference implements these as torch nn.Modules
(`python/sglang/srt/layers/` — SURVEY.md §2.5); here they are pure functions
over a param pytree, jit/scan/shard_map-friendly:
  norm.py     RMSNorm (+ fused residual add) — reference layernorm.py
  rotary.py   RoPE incl. llama3/linear/dynamic scaling — reference rotary_embedding.py
  linear.py   quantized (AWQ) / bf16 linear apply + param builders — reference linear.py
  activation.py  SiLU-and-mul, GELU — reference activation.py
  sampler.py  greedy/top-k/top-p/min-p sampling — reference sampler.py:36
  logits.py   last-token logits + vocab projection — reference logits_processor.py:233
"""
