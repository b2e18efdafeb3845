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
        for key in list(lp):
            if key.endswith("norm"):
                lp[key] = lp[key] + 1.0
        params["final_norm"] = params["final_norm"] + 1.0
        return params


@dataclasses.dataclass
class Gemma2ForCausalLM(GemmaForCausalLM):
    """Gemma-2: sandwich norms (post-attention and post-feedforward norms
    apply to the SUBLAYER OUTPUT before the residual add), attention-logit
    and final-logit softcapping, query_pre_attn_scalar attention scale,
    and sliding-window attention on alternating layers (the window rides
    the ragged kernels' per-layer window support)."""

    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        c = self.config
        self.sm_scale = float(
            hf.get("query_pre_attn_scalar", c.head_dim)
        ) ** -0.5
        self.attn_softcap = float(hf.get("attn_logit_softcapping") or 0.0)
        self.final_softcap = float(hf.get("final_logit_softcapping") or 0.0)
        sw = int(hf.get("sliding_window") or 0)
        # HF Gemma2: even layer indices slide, odd are full
        self.layer_windows = tuple(
            sw if (i % 2 == 0 and sw) else 0 for i in range(c.num_layers)
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, H = c.num_layers, c.hidden_size
        shapes["layers"]["pre_ffw_norm"] = ((L, H), jnp.float32)
        shapes["layers"]["post_ffw_norm"] = ((L, H), jnp.float32)
        return shapes

    def extra_layer_params(self, t, L: int) -> Dict[str, Any]:
        import numpy as np

        return {
            "pre_ffw_norm": jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.pre_feedforward_layernorm.weight")
                    for l in range(L)
                ]), jnp.float32,
            ),
            "post_ffw_norm": jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.post_feedforward_layernorm.weight")
                    for l in range(L)
                ]), jnp.float32,
            ),
        }

    def _layer(self, params, x, l, positions, rope_tab, attn_fn,
               lora_idx=None):
        from sglang_awq_tpu.layers.linear import linear_apply
        from sglang_awq_tpu.layers.norm import rms_norm
        from sglang_awq_tpu.layers.rotary import apply_rope

        c = self.config
        lp = params["layers"]
        T = x.shape[0]
        D = self.head_dim

        h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        if self.qk_norm:  # Gemma3 per-head (1+w)-folded RMSNorm
            q = rms_norm(q, lp["q_norm"][l], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"][l], c.rms_norm_eps)
        q, k = apply_rope(q, k, positions, self._rope_for_layer(rope_tab, l))
        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        o = self._maybe_psum(o.astype(jnp.float32))
        # sandwich: post-attention norm on the sublayer OUTPUT
        o = rms_norm(o.astype(jnp.bfloat16), lp["post_norm"][l],
                     c.rms_norm_eps)
        x = x + o.astype(x.dtype)

        h2 = rms_norm(x, lp["pre_ffw_norm"][l], c.rms_norm_eps)
        d = self._mlp(lp, h2, l)
        d = self._maybe_psum(d.astype(jnp.float32))
        d = rms_norm(d.astype(jnp.bfloat16), lp["post_ffw_norm"][l],
                     c.rms_norm_eps)
        x = x + d.astype(x.dtype)
        return x

    def _rope_for_layer(self, rope_tab, l):
        """Gemma2: one table for every layer; Gemma3 selects per layer."""
        return rope_tab

    def _logits(self, params, h):
        logits = super()._logits(params, h)
        if self.final_softcap:
            logits = self.final_softcap * jnp.tanh(logits / self.final_softcap)
        return logits


@dataclasses.dataclass
class Gemma3ForCausalLM(Gemma2ForCausalLM):
    """Gemma-3 (text): Gemma-2's sandwich-norm graph plus per-head q/k
    RMSNorm ((1+w)-folded like every Gemma norm), `layer_types`-driven
    sliding pattern (5:1 by default instead of Gemma-2's alternation), and
    DUAL rope tables — sliding layers rotate with `rope_local_base_freq`
    and no scaling, full layers with `rope_theta` + `rope_scaling` — the
    stacked [2, P, D] table is selected per layer inside the scan.

    Role model: reference `python/sglang/srt/models/gemma3_causal.py`."""

    def __post_init__(self):
        self.qk_norm = True
        super().__post_init__()
        hf = self.config.hf_config
        c = self.config
        sw = int(hf.get("sliding_window") or 0)
        lt = hf.get("layer_types")
        if lt is None:
            pattern = int(hf.get("sliding_window_pattern", 6))
            lt = [
                "full_attention" if (i + 1) % pattern == 0
                else "sliding_attention"
                for i in range(c.num_layers)
            ]
        self.layer_windows = tuple(
            sw if t == "sliding_attention" else 0 for t in lt
        )
        self._rope_idx = tuple(
            1 if t == "sliding_attention" else 0 for t in lt
        )
        self.local_rope_theta = float(hf.get("rope_local_base_freq", 10000.0))

    def rope(self):
        from sglang_awq_tpu.layers.rotary import rope_table

        c = self.config
        glob = rope_table(
            c.context_length, c.head_dim, c.rope_theta, c.rope_scaling,
            trained_max=c.max_position_embeddings,
        )
        loc = rope_table(
            c.context_length, c.head_dim, self.local_rope_theta, None
        )
        return jnp.stack([glob, loc])  # [2, P, D]

    def _rope_for_layer(self, rope_tab, l):
        import numpy as np

        idx = jnp.asarray(np.asarray(self._rope_idx, np.int32))[l]
        return rope_tab[idx]
