"""Qwen2/Qwen2.5 and Qwen3 causal LMs.

Reference: `python/sglang/srt/models/qwen2.py` (Llama graph + QKV bias) and
`qwen3.py` (no bias, per-head q/k RMSNorm before RoPE).
"""

from __future__ import annotations

import dataclasses

from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class Qwen2ForCausalLM(LlamaForCausalLM):
    qkv_bias: bool = True


@dataclasses.dataclass
class Qwen3ForCausalLM(LlamaForCausalLM):
    qkv_bias: bool = False
    qk_norm: bool = True
