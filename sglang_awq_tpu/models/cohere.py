"""Cohere Command-R causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/commandr.py`.  Differences
from Llama, all handled by overriding `_layer` / `_final_norm` / `_logits`:

* PARALLEL residual: one shared input LayerNorm feeds BOTH attention and
  MLP; `x = x + attn_out + mlp_out` (no post-attention norm exists in the
  checkpoint — the loader slot is satisfied with a unit weight).
* LayerNorm (mean-centered, weight-only) everywhere RMSNorm would be.
* INTERLEAVED rotary: HF Cohere rotates (2i, 2i+1) feature pairs instead
  of Llama's (i, i+D/2).  Permuting q/k features (even indices first)
  turns that into the standard half-split rotation — and because q and k
  get the SAME permutation, attention dot products are unchanged, so the
  permuted k can go straight into the KV cache.
* `logit_scale` multiplies the lm_head output (embeddings are tied).

Command-R+'s use_qk_norm variant is not wired yet (asserted off).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.layers.linear import linear_apply
from sglang_awq_tpu.layers.norm import layer_norm
from sglang_awq_tpu.layers.rotary import apply_rope
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class CohereForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        assert not hf.get("use_qk_norm", False), (
            "Command-R+ qk_norm variant not wired yet"
        )
        self.logit_scale = float(hf.get("logit_scale", 1.0))
        D = self.head_dim
        # interleaved -> half-split feature permutation (see module doc)
        self._rope_perm = np.concatenate(
            [np.arange(0, D, 2), np.arange(1, D, 2)]
        )

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        # no post-attention norm in the parallel-residual checkpoint
        c = self.config
        out = dict(tensors)
        for l in range(c.num_layers):
            out[f"model.layers.{l}.post_attention_layernorm.weight"] = (
                np.ones(c.hidden_size, np.float32)
            )
        return out

    def _final_norm(self, params, h: jax.Array) -> jax.Array:
        return layer_norm(h, params["final_norm"], self.config.rms_norm_eps)

    def _logits(self, params, h: jax.Array) -> jax.Array:
        logits = super()._logits(params, h)
        if self.logit_scale != 1.0:
            logits = logits * self.logit_scale
        return logits

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,
        l: jax.Array,
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
        lora_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        c = self.config
        lp = params["layers"]
        lora = params.get("lora") if lora_idx is not None else None
        T = x.shape[0]
        D = self.head_dim

        h = layer_norm(x, lp["input_norm"][l], c.rms_norm_eps)

        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        if lora is not None:
            qkv = qkv + self._lora_delta(lora, "qkv", h, l, lora_idx)
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        perm = jnp.asarray(self._rope_perm)
        q = q.reshape(T, self.qh, D)[..., perm]
        k = k.reshape(T, self.kvh, D)[..., perm]
        v = v.reshape(T, self.kvh, D)
        q, k = apply_rope(q, k, positions, rope_tab)

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        if lora is not None:
            o = o + self._lora_delta(lora, "o", attn, l, lora_idx)

        d = self._mlp(lp, h, l, lora=lora, lora_idx=lora_idx)

        both = (o.astype(jnp.float32) + d.astype(jnp.float32))
        return x + self._maybe_psum(both).astype(x.dtype)
