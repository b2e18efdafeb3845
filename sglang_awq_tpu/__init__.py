"""sglang_awq_tpu — a TPU-native AWQ serving engine.

A from-scratch re-design of the SGLang serving stack (reference:
kvcache-ai/sglang_awq) for TPU hardware: JAX/XLA/Pallas compute path,
SPMD sharding over a `jax.sharding.Mesh`, bucketed-jit execution in place
of CUDA graphs, and a fused Pallas W4A16 (AWQ INT4) matmul feeding the MXU.

Top-level layout (mirrors the reference's layer map, SURVEY.md §1):
  entrypoints/    HTTP server (aiohttp), OpenAI protocol, in-process Engine
  managers/       tokenizer manager, continuous-batching scheduler, detokenizer
  mem_cache/      paged KV allocator, radix prefix cache, device KV pool
  model_executor/ bucketed-jit model runner, ForwardBatch metadata
  models/         model zoo (functional JAX, scan-over-layers)
  layers/         linear/norm/rotary/attention/logits/sampler building blocks
  ops/            Pallas TPU kernels (AWQ matmul, paged attention, ...)
  quantization/   quant configs (AWQ detection per reference awq.py:89-158)
  model_loader/   safetensors -> sharded pytree, AWQ layout conversion
  parallel/       mesh + named-sharding rules (tp/dp/ep axes)
  sampling/       sampling params and penalties
"""

__version__ = "0.1.0"
