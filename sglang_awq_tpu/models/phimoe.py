"""PhiMoE (Phi-3.5-MoE) causal LM.

Role model: reference `python/sglang/srt/models/phimoe.py` — Mixtral-shaped
MoE with three Phi twists handled here:

* **sparsemixer routing** (inference form): expert k is the argmax of the
  (previous-expert-masked) router logits, and its multiplier is the softmax
  over the jitter-threshold-masked logits taken AT that argmax — weights
  are NOT renormalized across the top-2.
* full `nn.LayerNorm` (weight + bias) for every norm — the bias rides in a
  [2, H] row pair folded at pretranslate so the stock loader stacks it.
* optional attention / lm_head biases (Phi-3.5-MoE sets both).

longrope rope_scaling comes from the shared rotary table machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.norm import layer_norm_bias
from sglang_awq_tpu.models.mixtral import MixtralForCausalLM


@dataclasses.dataclass
class PhimoeForCausalLM(MixtralForCausalLM):
    def __post_init__(self):
        hf = self.config.hf_config
        self.qkv_bias = bool(hf.get("attention_bias", False))
        super().__post_init__()
        self.router_jitter = float(hf.get("router_jitter_noise", 0.01))
        self.lm_head_bias = bool(hf.get("lm_head_bias", False))

    # --- norms: LayerNorm with bias, packed as [2, H] rows ---

    def _norm(self, x, w, eps):
        return layer_norm_bias(x, w[0], w[1], eps)

    def _final_norm(self, params, h):
        return self._norm(h, params["final_norm"], self.config.rms_norm_eps)

    def _logits(self, params, h):
        logits = super()._logits(params, h)
        if "bias" in params["lm_head"]:
            logits = logits + params["lm_head"]["bias"]
        return logits

    def pretranslate_tensors(self, tensors):
        out = dict(tensors)
        L = self.config.num_layers
        for l in range(L):
            for which in ("input_layernorm", "post_attention_layernorm"):
                base = f"model.layers.{l}.{which}."
                out[base + "weight"] = np.stack(
                    [np.asarray(tensors[base + "weight"]),
                     np.asarray(tensors[base + "bias"])]
                )
                out.pop(base + "bias", None)
        out["model.norm.weight"] = np.stack(
            [np.asarray(tensors["model.norm.weight"]),
             np.asarray(tensors["model.norm.bias"])]
        )
        out.pop("model.norm.bias", None)
        self._lm_head_bias = tensors.get("lm_head.bias")
        return out

    def postprocess_params(self, params):
        b = getattr(self, "_lm_head_bias", None)
        if b is not None:
            params["lm_head"]["bias"] = jnp.asarray(
                np.asarray(b), jnp.float32)
        self._lm_head_bias = None
        return params

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, H = c.num_layers, c.hidden_size
        shapes["layers"]["input_norm"] = ((L, 2, H), jnp.float32)
        shapes["layers"]["post_norm"] = ((L, 2, H), jnp.float32)
        shapes["final_norm"] = ((2, H), jnp.float32)
        if self.lm_head_bias:
            shapes["lm_head"]["bias"] = ((c.vocab_size,), jnp.float32)
        return shapes

    # --- sparsemixer routing (inference semantics) ---

    def _pick_expert(self, scores):
        """One sparsemixer round: argmax expert + its threshold-masked
        softmax multiplier (HF modeling_phimoe.sparsemixer, eval path)."""
        mx = jnp.max(scores, axis=-1, keepdims=True)
        factor = jnp.maximum(jnp.abs(scores), mx)
        drop = ((mx - scores) / factor) > (2.0 * self.router_jitter)
        masked = jnp.where(drop, -jnp.inf, scores)
        e = jnp.argmax(scores, axis=-1)
        w = jnp.take_along_axis(
            jax.nn.softmax(masked, axis=-1), e[:, None], axis=-1
        )[:, 0]
        return e.astype(jnp.int32), w

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        logits = jnp.dot(
            h2, lp["router"][l], preferred_element_type=jnp.float32
        )  # [T, E]
        e1, w1 = self._pick_expert(logits)
        masked2 = logits.at[jnp.arange(logits.shape[0]), e1].set(-jnp.inf)
        e2, w2 = self._pick_expert(masked2)
        self._record_experts(jnp.stack([e1, e2], axis=1), l)
        topi = jnp.stack([e1, e2], axis=1)
        topv = jnp.stack([w1, w2], axis=1)
        return self._experts_apply(lp, h2, topi, topv, l)
