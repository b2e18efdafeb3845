"""OLMoE (AI2 OLMoE-1B-7B) causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/olmoe.py`.  The Qwen2-MoE
dense-all-expert graph (models/qwen2_moe.py) with:

* softmax-then-top-k routing over `num_experts` (norm_topk_prob optional),
  expert size = intermediate_size, NO shared expert;
* RMSNorm over the FLAT q / k projections before RoPE (full-width, not
  per-head — the base class's qk_norm_full path, TP-correct via psum);
* no projection biases.
"""

from __future__ import annotations

import dataclasses

from sglang_awq_tpu.models.qwen2_moe import Qwen2MoeForCausalLM


@dataclasses.dataclass
class OlmoeForCausalLM(Qwen2MoeForCausalLM):
    qkv_bias: bool = False
    qk_norm_full: bool = True

    def __post_init__(self):
        hf = self.config.hf_config
        hf.setdefault("num_local_experts", hf.get("num_experts", 64))
        hf.setdefault("moe_intermediate_size", hf["intermediate_size"])
        hf.setdefault("shared_expert_intermediate_size", 0)
        super().__post_init__()
