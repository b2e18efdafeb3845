"""EXAONE 4.0 (LG AI) causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/exaone.py` lineage /
model-zoo coverage; HF `Exaone4ForCausalLM`.  Differences vs the Llama
base:

* POST-norm residual structure: no pre-norms — the attention and MLP
  outputs are RMSNormed BEFORE the residual add
  (`x + norm(attn(x))`, `x + norm(mlp(x))`).  The checkpoint's
  post_attention_layernorm / post_feedforward_layernorm are renamed onto
  the standard input_norm / post_norm slots at load.
* Per-head q/k RMSNorm before RoPE (base qk_norm).
* Hybrid attention: 3-of-4 layers slide (`sliding_window_pattern`), and
  global (full-attention) layers use NoPE — no rotary at all (the
  SmolLM3 identity-rope-table trick).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.layers.linear import linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class Exaone4ForCausalLM(LlamaForCausalLM):
    qk_norm: bool = True

    def __post_init__(self):
        super().__post_init__()
        c = self.config
        hf = c.hf_config
        sw = hf.get("sliding_window")
        lt = hf.get("layer_types")
        if sw and not lt:
            pat = int(hf.get("sliding_window_pattern", 4))
            lt = [
                "full_attention" if (i + 1) % pat == 0 else "sliding_attention"
                for i in range(c.num_layers)
            ]
        if sw and lt:
            self.layer_windows = tuple(
                int(sw) if t == "sliding_attention" else 0 for t in lt
            )
            # hybrid: global layers are NoPE (identity rope table idx 1)
            self._rope_idx = tuple(
                0 if t == "sliding_attention" else 1 for t in lt
            )
        else:
            self._rope_idx = tuple(0 for _ in range(c.num_layers))

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """Post-norm weights ride the standard slots: post_attention ->
        input_norm (attn-out norm), post_feedforward -> post_norm
        (mlp-out norm)."""
        out = {}
        for name, arr in tensors.items():
            name = name.replace(
                ".post_feedforward_layernorm.", ".__mlpnorm__."
            ).replace(
                ".post_attention_layernorm.", ".input_layernorm."
            ).replace(
                ".__mlpnorm__.", ".post_attention_layernorm."
            )
            out[name] = arr
        return out

    def rope(self):
        tab = super().rope()
        half = tab.shape[-1] // 2
        ident = jnp.concatenate(
            [jnp.ones_like(tab[:, :half]), jnp.zeros_like(tab[:, half:])],
            axis=-1,
        )
        return jnp.stack([tab, ident])

    def _rope_for_layer(self, rope_tab, l):
        idx = jnp.asarray(np.asarray(self._rope_idx, np.int32))[l]
        return rope_tab[idx]

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
        T = x.shape[0]
        D = self.head_dim

        qkv = linear_apply(self.specs["qkv"], lp["qkv"], x, l)
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        q = rms_norm(q, lp["q_norm"][l], c.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"][l], c.rms_norm_eps)
        q, k = apply_rope(q, k, positions, self._rope_for_layer(rope_tab, l))

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        oc = self._maybe_psum(o.astype(jnp.float32))
        oc = rms_norm(oc, lp["input_norm"][l], c.rms_norm_eps)
        x = x + oc.astype(x.dtype)

        d = self._mlp(lp, x, l)
        dc = self._maybe_psum(d.astype(jnp.float32))
        dc = rms_norm(dc, lp["post_norm"][l], c.rms_norm_eps)
        return x + dc.astype(x.dtype)
