"""GPT-OSS (OpenAI gpt-oss-20b / -120b) causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/gpt_oss.py` (sinks wired
through the attention backends, clamped-SwiGLU MoE, alternating sliding
windows).  Structure vs the Llama base:

* Attention sinks: a learned per-head logit joins each softmax denominator
  (kernel support in ops/ragged_attention.py `sinks=`); alternating
  sliding_attention / full_attention layers ride the per-layer window
  machinery.
* MoE with softmax-AFTER-top-k routing (HF GptOssTopKRouter): router
  logits get a bias, top-k logits are softmaxed, non-top-k weights are 0.
* Experts use the clamped SwiGLU variant (HF GptOssExperts):
      gate = min(gate, limit); up = clip(up, -limit, limit)
      out  = (up + 1) * gate * sigmoid(alpha * gate)
  with per-expert biases on BOTH projections; the down biases combine as
  sum_e w_e * b_e (linear in the routing weights), computed as one [T, E]
  x [E, H] matmul.
* Expert layout follows models/mixtral.py's dense all-expert formulation
  (merged [H, E*2I] / [E*I, H] matmuls; EP = model-axis sharding).

Checkpoint notes: HF stores experts as stacked parameters
(`mlp.experts.gate_up_proj` [E, H, 2I] with INTERLEAVED gate/up columns);
`pretranslate_tensors` de-interleaves and splits them into per-expert
pseudo-Linear tensors for the stock merge machinery.  MXFP4-packed
checkpoints must be dequantized to bf16 first (HF `dequantize=True` load);
native MXFP4 faces are a later upgrade.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class GptOssForCausalLM(LlamaForCausalLM):
    attn_sinks: bool = True

    def __post_init__(self):
        hf = self.config.hf_config
        self.qkv_bias = bool(hf.get("attention_bias", True))
        super().__post_init__()
        c = self.config
        self.num_experts = int(hf.get("num_local_experts", 32))
        self.top_k = int(hf.get("num_experts_per_tok", 4))
        assert self.num_experts % self.tp_size == 0
        self.experts_local = self.num_experts // self.tp_size
        self.swiglu_alpha = 1.702
        self.swiglu_limit = float(hf.get("swiglu_limit", 7.0))
        sw = int(hf.get("sliding_window") or 0)
        lt = hf.get("layer_types") or [
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(c.num_layers)
        ]
        self.layer_windows = tuple(
            sw if t == "sliding_attention" else 0 for t in lt
        )
        E, I, H = self.num_experts, c.intermediate_size, c.hidden_size
        q = c.quant_config
        self.specs["gate_up"] = LinearSpec.make(
            "gate_up", H, E * 2 * I, q, "column", self.tp_size
        )
        self.specs["down"] = LinearSpec.make(
            "down", E * I, H, q, "row", self.tp_size
        )

    # ------------------------------------------------------------------
    # loader hooks
    # ------------------------------------------------------------------

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        I = c.intermediate_size
        out = {}
        for name, arr in tensors.items():
            if name.endswith("mlp.experts.gate_up_proj"):
                base = name[: -len("gate_up_proj")]
                for e in range(self.num_experts):
                    w = arr[e]  # [H, 2I] interleaved gate/up columns
                    out[f"{base}{e}.gate.weight"] = np.ascontiguousarray(
                        w[:, 0::2].T
                    )
                    out[f"{base}{e}.up.weight"] = np.ascontiguousarray(
                        w[:, 1::2].T
                    )
            elif name.endswith("mlp.experts.gate_up_proj_bias"):
                base = name[: -len("gate_up_proj_bias")]
                for e in range(self.num_experts):
                    out[f"{base}{e}.gate_bias"] = np.ascontiguousarray(
                        arr[e, 0::2]
                    )
                    out[f"{base}{e}.up_bias"] = np.ascontiguousarray(
                        arr[e, 1::2]
                    )
            elif name.endswith("mlp.experts.down_proj"):
                base = name[: -len("down_proj")]
                for e in range(self.num_experts):
                    out[f"{base}{e}.down.weight"] = np.ascontiguousarray(
                        arr[e].T  # [I, H] -> Linear-style [H, I]
                    )
            else:
                out[name] = arr
        return out

    def merge_schema(self) -> Dict[str, tuple]:
        E = self.num_experts
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "gate_up": (
                [
                    f"mlp.experts.{e}.{w}"
                    for e in range(E)
                    for w in ("gate", "up")
                ],
                "ne",
            ),
            "down": ([f"mlp.experts.{e}.down" for e in range(E)], "k"),
        }

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        E, I = self.num_experts, self.config.intermediate_size

        def stack(fn, dtype=jnp.float32):
            return jnp.asarray(np.stack([fn(l) for l in range(L)]), dtype)

        def gub(l):
            # per-expert [gate_e | up_e] blocks matching the merged layout
            return np.concatenate(
                [
                    np.concatenate(
                        [
                            t(f"model.layers.{l}.mlp.experts.{e}.gate_bias"),
                            t(f"model.layers.{l}.mlp.experts.{e}.up_bias"),
                        ]
                    )
                    for e in range(E)
                ]
            )

        return {
            "router": stack(
                lambda l: t(f"model.layers.{l}.mlp.router.weight").T,
                jnp.bfloat16,
            ),
            "router_bias": stack(
                lambda l: t(f"model.layers.{l}.mlp.router.bias")
            ),
            "gate_up_bias": stack(gub),
            "down_bias": stack(
                lambda l: t(f"model.layers.{l}.mlp.experts.down_proj_bias")
            ),
            "sinks": stack(lambda l: t(f"model.layers.{l}.self_attn.sinks")),
        }

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        L, H, E, I = c.num_layers, c.hidden_size, self.num_experts, \
            c.intermediate_size
        shapes["layers"]["o"]["bias"] = ((L, H), jnp.bfloat16)
        shapes["layers"]["router"] = ((L, H, E), jnp.bfloat16)
        shapes["layers"]["router_bias"] = ((L, E), jnp.float32)
        shapes["layers"]["gate_up_bias"] = ((L, E * 2 * I), jnp.float32)
        shapes["layers"]["down_bias"] = ((L, E, H), jnp.float32)
        shapes["layers"]["sinks"] = (
            (L, self.qh * self.tp_size), jnp.float32
        )
        return shapes

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        c = self.config
        T = h2.shape[0]
        E, K, I = self.num_experts, self.top_k, c.intermediate_size
        El = self.experts_local

        logits = jnp.dot(
            h2, lp["router"][l], preferred_element_type=jnp.float32
        ) + lp["router_bias"][l]  # [T, E]
        topv, topi = lax.top_k(logits, K)
        topv = jax.nn.softmax(topv, axis=-1)  # softmax AFTER top-k (HF)
        w = jnp.sum(
            jax.nn.one_hot(topi, E, dtype=topv.dtype) * topv[..., None],
            axis=1,
        )  # [T, E] dense routing weights
        wl, gub, dnb = w, lp["gate_up_bias"][l], lp["down_bias"][l]
        if self.tp_axis is not None:
            e0 = lax.axis_index(self.tp_axis)
            wl = lax.dynamic_slice_in_dim(w, e0 * El, El, axis=1)
            gub = lax.dynamic_slice_in_dim(gub, e0 * El * 2 * I, El * 2 * I)
            dnb = lax.dynamic_slice_in_dim(dnb, e0 * El, El, axis=0)

        gu = linear_apply(self.specs["gate_up"], lp["gate_up"], h2, l)
        gu = gu.astype(jnp.float32) + gub  # [T, El*2I]
        gu = gu.reshape(T, El, 2 * I)
        gate, up = gu[..., :I], gu[..., I:]
        lim = self.swiglu_limit
        gate = jnp.minimum(gate, lim)
        up = jnp.clip(up, -lim, lim)
        glu = gate * jax.nn.sigmoid(self.swiglu_alpha * gate)
        act = (up + 1.0) * glu  # [T, El, I]
        act = (act * wl[..., None]).astype(jnp.bfloat16)
        y = linear_apply(
            self.specs["down"], lp["down"], act.reshape(T, El * I), l
        )
        # per-expert down bias, combined linearly by the routing weights
        # (the row-parallel psum after _mlp completes the EP reduction)
        return y.astype(jnp.float32) + jnp.dot(
            wl, dnb, preferred_element_type=jnp.float32
        )
