"""IBM Granite 3 causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/granite.py`.  Granite is
the Llama graph with four scalar multipliers (the muP-style scaling knobs
in the HF config): `embedding_multiplier` on the token embeddings,
`attention_multiplier` replacing 1/sqrt(D) as the softmax scale,
`residual_multiplier` on every sub-block output before its residual add,
and `logits_scaling` dividing the lm_head output.
"""

from __future__ import annotations

import dataclasses

import jax

from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class GraniteForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        hf = self.config.hf_config
        self.embed_multiplier = float(hf.get("embedding_multiplier", 1.0))
        self.residual_multiplier = float(hf.get("residual_multiplier", 1.0))
        super().__post_init__()
        self.sm_scale = float(hf.get("attention_multiplier", self.sm_scale))
        self.logits_scaling = float(hf.get("logits_scaling", 1.0))

    def _logits(self, params, h: jax.Array) -> jax.Array:
        logits = super()._logits(params, h)
        if self.logits_scaling != 1.0:
            logits = logits / self.logits_scaling
        return logits
