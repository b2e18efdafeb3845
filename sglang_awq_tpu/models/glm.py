"""GLM-4 causal LMs, TPU-native.

Role model: reference `python/sglang/srt/models/glm4.py` / `chatglm.py`.

* `GlmForCausalLM` (glm-4-9b-chat lineage): Llama graph with qkv biases,
  a fused `gate_up_proj` checkpoint tensor (split in pretranslate), and
  PARTIAL-INTERLEAVED rotary — only the leading half of each head
  rotates, in (2i, 2i+1) pairs.  The base class's `rope_interleaved`
  permutation now interleaves just the rotated prefix, so the narrow
  rope table (partial_rotary_factor) composes with it.
* `Glm4ForCausalLM` (GLM-4-0414 / Z1): adds post_self_attn_layernorm and
  post_mlp_layernorm — sandwich norms on the sub-block OUTPUTS (after
  the TP psum) on top of the usual pre-norms.
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
class GlmForCausalLM(LlamaForCausalLM):
    qkv_bias: bool = True
    rope_interleaved: bool = True

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        out = {}
        for name, arr in tensors.items():
            if name.endswith("mlp.gate_up_proj.weight"):
                base = name[: -len("gate_up_proj.weight")]
                inter = arr.shape[0] // 2  # rows are [gate | up]
                out[base + "gate_proj.weight"] = arr[:inter]
                out[base + "up_proj.weight"] = arr[inter:]
            else:
                out[name] = arr
        return out


@dataclasses.dataclass
class Glm4ForCausalLM(GlmForCausalLM):
    qkv_bias: bool = False

    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        self.qkv_bias = bool(hf.get("attention_bias", False))

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, H = c.num_layers, c.hidden_size
        shapes["layers"]["post_attn_out_norm"] = ((L, H), jnp.float32)
        shapes["layers"]["post_mlp_out_norm"] = ((L, H), jnp.float32)
        return shapes

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        def stack(name):
            return jnp.asarray(
                np.stack([t(f"model.layers.{l}.{name}") for l in range(L)]),
                jnp.float32,
            )

        return {
            "post_attn_out_norm": stack("post_self_attn_layernorm.weight"),
            "post_mlp_out_norm": stack("post_mlp_layernorm.weight"),
        }

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

        h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        if "bias" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["bias"][l]
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        perm = jnp.asarray(self._rope_perm)
        q, k = q[..., perm], k[..., perm]
        q, k = apply_rope(q, k, positions, rope_tab)

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        o = self._maybe_psum(o.astype(jnp.float32))
        o = rms_norm(o.astype(jnp.bfloat16), lp["post_attn_out_norm"][l],
                     c.rms_norm_eps)
        x = x + o.astype(x.dtype)

        h2 = rms_norm(x, lp["post_norm"][l], c.rms_norm_eps)
        d = self._mlp(lp, h2, l)
        d = self._maybe_psum(d.astype(jnp.float32))
        d = rms_norm(d.astype(jnp.bfloat16), lp["post_mlp_out_norm"][l],
                     c.rms_norm_eps)
        x = x + d.astype(x.dtype)
        return x
