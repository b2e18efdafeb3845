"""Gemma (v1) causal LM.

Role model: reference `python/sglang/srt/models/gemma.py`.  Differences vs
the Llama graph, all expressed through base-class hooks:

* embeddings scale by sqrt(hidden_size) (normalizer)
* RMSNorm uses the (1 + weight) convention — folded into the weights at
  load (postprocess_params), so the shared norm kernel runs unchanged
* GeGLU activation (gelu_and_mul)
* lm_head is tied to the embedding (HF config default)

(Gemma-2/3's sliding-window-alternating layers and logit softcaps need
attention-kernel support and land with the SWA work.)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp


from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class GemmaForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        self.embed_multiplier = float(self.config.hidden_size) ** 0.5
        self.mlp_act = "gelu"

    def postprocess_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Fold Gemma's (1 + w) norm convention into the stacked weights."""
        lp = params["layers"]
        lp["input_norm"] = lp["input_norm"] + 1.0
        lp["post_norm"] = lp["post_norm"] + 1.0
        params["final_norm"] = params["final_norm"] + 1.0
        return params
