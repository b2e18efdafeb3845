"""Qwen2/Qwen2.5 causal LM.

Reference: `python/sglang/srt/models/qwen2.py` — identical graph to Llama
except QKV projection bias.  (Qwen3 drops the bias but adds q/k norm; the
bias-free path is covered; qk-norm support is tracked for the model-zoo
widening phase.)
"""

from __future__ import annotations

import dataclasses

from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class Qwen2ForCausalLM(LlamaForCausalLM):
    qkv_bias: bool = True
