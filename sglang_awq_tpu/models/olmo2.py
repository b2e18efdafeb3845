"""OLMo-2 causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/olmo2.py`.  OLMo-2 is a
Llama-family graph with two twists, both handled by overriding `_layer`:

* POST-norm residual stream: no input layernorm; `post_attention_layernorm`
  / `post_feedforward_layernorm` apply to the sub-block OUTPUT (after the
  TP psum) before the residual add.
* Full-width q/k RMSNorm: the norm reduces over ALL heads jointly
  (`Olmo2RMSNorm(num_heads * head_dim)`), not per-head like Qwen3 — under
  TP the sum of squares crosses shards (psum) and each shard applies its
  slice of the norm weight.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.linear import linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class Olmo2ForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        self.qk_norm = True  # loader picks up self_attn.{q,k}_norm.weight
        super().__post_init__()
        c = self.config
        assert self.tp_size == 1 or c.num_kv_heads % self.tp_size == 0, (
            "OLMo-2 full-width k_norm needs evenly sharded kv heads"
        )

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        # post-norm arch has no input_layernorm; satisfy the loader with a
        # unit weight (never used: _layer below doesn't read input_norm)
        c = self.config
        out = dict(tensors)
        for l in range(c.num_layers):
            out[f"model.layers.{l}.input_layernorm.weight"] = np.ones(
                c.hidden_size, np.float32
            )
        return out

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, D = c.num_layers, self.head_dim
        shapes["layers"]["q_norm"] = ((L, c.num_attention_heads * D),
                                      jnp.float32)
        shapes["layers"]["k_norm"] = ((L, c.num_kv_heads * D), jnp.float32)
        shapes["layers"]["post_ffw_norm"] = ((L, c.hidden_size), jnp.float32)
        return shapes

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        return {
            "post_ffw_norm": jnp.asarray(
                np.stack(
                    [
                        t(f"model.layers.{l}.post_feedforward_layernorm.weight")
                        for l in range(L)
                    ]
                ),
                jnp.float32,
            )
        }

    def _shard_rms(self, vec, w_all, l, global_width: int, local_width: int):
        """RMSNorm over the GLOBAL projection width of a TP-sharded [T,
        local_width] slab; each shard applies its slice of the weight."""
        c = self.config
        f = vec.astype(jnp.float32)
        ss = jnp.sum(f * f, axis=-1, keepdims=True)
        if self.tp_axis is not None:
            ss = lax.psum(ss, self.tp_axis)
        inv = lax.rsqrt(ss / global_width + c.rms_norm_eps)
        w = w_all[l]
        if self.tp_axis is not None and global_width != local_width:
            w = lax.dynamic_slice_in_dim(
                w, lax.axis_index(self.tp_axis) * local_width, local_width
            )
        return (f * inv * w).astype(vec.dtype)

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

        qkv = linear_apply(self.specs["qkv"], lp["qkv"], x, l)
        if lora is not None:
            qkv = qkv + self._lora_delta(lora, "qkv", x, l, lora_idx)
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = self._shard_rms(q, lp["q_norm"], l,
                            c.num_attention_heads * D, self.qh * D)
        k = self._shard_rms(k, lp["k_norm"], l,
                            c.num_kv_heads * D, self.kvh * D)
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        q, k = apply_rope(q, k, positions,
                          self._rope_for_layer(rope_tab, l))

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        if lora is not None:
            o = o + self._lora_delta(lora, "o", attn, l, lora_idx)
        o = self._maybe_psum(o.astype(jnp.float32)).astype(jnp.bfloat16)
        o = rms_norm(o, lp["post_norm"][l], c.rms_norm_eps)
        x = x + o.astype(x.dtype)

        d = self._mlp(lp, x, l, lora=lora, lora_idx=lora_idx)
        d = self._maybe_psum(d.astype(jnp.float32)).astype(jnp.bfloat16)
        d = rms_norm(d, lp["post_ffw_norm"][l], c.rms_norm_eps)
        x = x + d.astype(x.dtype)
        return x


@dataclasses.dataclass
class Olmo3ForCausalLM(Olmo2ForCausalLM):
    """OLMo 3.  Role model: reference model-zoo coverage (olmo lineage).
    The OLMo-2 post-norm / full-width-qk-norm graph with 3-of-4 sliding-
    window layers; when rope_scaling is set it applies to the GLOBAL
    (full-attention) layers only — sliding layers keep default rope
    (dual rope tables selected per layer)."""

    def __post_init__(self):
        super().__post_init__()
        c = self.config
        hf = c.hf_config
        sw = int(hf.get("sliding_window") or 0)
        lt = hf.get("layer_types") or [
            "full_attention" if (i + 1) % 4 == 0 else "sliding_attention"
            for i in range(c.num_layers)
        ]
        if sw:
            self.layer_windows = tuple(
                sw if t == "sliding_attention" else 0 for t in lt
            )
        # table 0 = scaled rope (global layers), table 1 = default rope
        self._rope_idx = tuple(
            0 if t == "full_attention" else 1 for t in lt
        )

    def rope(self):
        from sglang_awq_tpu.layers.rotary import rope_table

        c = self.config
        scaled = super().rope()
        plain = rope_table(
            c.context_length, self.head_dim, c.rope_theta, None,
            trained_max=c.max_position_embeddings,
        )
        return jnp.stack([scaled, plain])

    def _rope_for_layer(self, rope_tab, l):
        idx = jnp.asarray(np.asarray(self._rope_idx, np.int32))[l]
        return rope_tab[idx]
