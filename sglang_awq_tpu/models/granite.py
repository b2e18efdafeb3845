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
from sglang_awq_tpu.models.mixtral import MixtralForCausalLM


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


@dataclasses.dataclass
class GraniteMoeForCausalLM(MixtralForCausalLM):
    """IBM Granite 3 MoE.  Role model: reference
    `python/sglang/srt/models/granitemoe.py`.  The Mixtral dense
    all-expert graph (its renormalized router weights are mathematically
    the post-top-k softmax GraniteMoe uses) plus Granite's four scalar
    multipliers.  Checkpoints store fused 3D expert tensors —
    `input_linear [E, 2I, H]` ([gate|up] rows) and `output_linear
    [E, H, I]` — split back to per-expert w1/w3/w2 in pretranslate."""

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

    def pretranslate_tensors(self, tensors):
        import numpy as np

        c = self.config
        I = c.intermediate_size
        out = {}
        for name, arr in tensors.items():
            if name.endswith("block_sparse_moe.input_linear.weight"):
                base = name[: -len("input_linear.weight")]
                for e in range(arr.shape[0]):
                    out[f"{base}experts.{e}.w1.weight"] = arr[e, :I]
                    out[f"{base}experts.{e}.w3.weight"] = arr[e, I:]
            elif name.endswith("block_sparse_moe.output_linear.weight"):
                base = name[: -len("output_linear.weight")]
                for e in range(arr.shape[0]):
                    out[f"{base}experts.{e}.w2.weight"] = arr[e]
            elif name.endswith("block_sparse_moe.router.layer.weight"):
                out[name.replace("router.layer.weight", "gate.weight")] = arr
            else:
                out[name] = arr
        return out
