"""Llama 4 (Scout/Maverick text stack), TPU-native.

Role model: reference `python/sglang/srt/models/llama4.py`.  Four new
mechanisms over the Llama graph, each mapped to existing TPU machinery:

* **Chunked attention** on rope layers (`attention_chunk_size`): keys
  outside the query's chunk are masked.  Encoded as a NEGATIVE per-layer
  window — the ragged kernels interpret win < 0 as chunk size |win|
  (ops/ragged_attention.py), so no new kernel.
* **NoPE layers** (`no_rope_layers[l] == 0`): full attention, no rotary —
  the SmolLM3 identity-rope-table trick — plus **temperature tuning**
  (q scaled by `log1p(floor(pos / floor_scale)) * attn_scale + 1`).
* **QK l2norm** (weightless RMS) after rope, on rope layers only.
* **Interleaved MoE** (`moe_layers`): top-1 sigmoid router that scales the
  expert INPUT (not the output — the scale passes through the gate
  nonlinearity, matching HF), one always-on shared expert, dense MLP
  (`intermediate_size_mlp`) on the remaining layers.  Expert weights ride
  the Mixtral merged layout, so dense-all-expert decode and the grouped
  prefill dispatch both apply; interleaving is a `lax.cond` over two
  renumbered stacks (the DeepSeek first-k-dense pattern, generalized to
  arbitrary layer sets).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.activation import silu_and_mul
from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.models.mixtral import MixtralForCausalLM
from sglang_awq_tpu.models.smollm3 import SmolLM3ForCausalLM


def _l2norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(
        jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)).astype(x.dtype)


@dataclasses.dataclass
class Llama4ForCausalLM(SmolLM3ForCausalLM):
    def __post_init__(self):
        c = self.config
        hf = c.hf_config
        self.moe_layers = list(hf.get("moe_layers") or [])
        if not self.moe_layers and hf.get("interleave_moe_layer_step"):
            step = int(hf["interleave_moe_layer_step"])
            self.moe_layers = [
                l for l in range(c.num_layers) if (l + 1) % step == 0
            ]
        # HF llama4 rotates complex (even, odd) pairs (view_as_complex)
        self.rope_interleaved = True
        super().__post_init__()  # smollm3: no_rope_layers -> _rope_idx
        self.use_qk_l2norm = bool(hf.get("use_qk_norm", True))
        self.attn_temp_tuning = bool(hf.get("attn_temperature_tuning", True))
        self.floor_scale = float(hf.get("floor_scale", 8192.0))
        self.attn_scale = float(hf.get("attn_scale", 0.1))
        chunk = int(hf.get("attention_chunk_size") or 0)
        # rope layers attend within their chunk; NoPE layers attend fully
        if chunk:
            self.layer_windows = tuple(
                -chunk if self._rope_idx[l] == 0 else 0
                for l in range(c.num_layers)
            )

        # --- MoE geometry ---
        self.num_experts = int(hf.get("num_local_experts", 16))
        self.top_k = int(hf.get("num_experts_per_tok", 1))
        assert self.top_k == 1, "llama4 routes top-1"
        assert self.num_experts % self.tp_size == 0
        self.experts_local = self.num_experts // self.tp_size
        self.moe_inter = int(hf["intermediate_size"])
        self.expert_inter = self.moe_inter
        self.dense_inter = int(
            hf.get("intermediate_size_mlp", hf["intermediate_size"]))
        self.expert_dist_sink = None
        self._is_moe = np.zeros(c.num_layers, np.int32)
        self._li_moe = np.zeros(c.num_layers, np.int32)
        self._li_dense = np.zeros(c.num_layers, np.int32)
        mi = di = 0
        for l in range(c.num_layers):
            if l in self.moe_layers:
                self._is_moe[l] = 1
                self._li_moe[l] = mi
                mi += 1
            else:
                self._li_dense[l] = di
                di += 1
        self.n_moe, self.n_dense = mi, di

        q = c.quant_config
        H = c.hidden_size
        E, I = self.num_experts, self.moe_inter
        del self.specs["gate_up"], self.specs["down"]
        if self.n_dense:
            self.specs["dense_gate_up"] = LinearSpec.make(
                "dense_gate_up", H, 2 * self.dense_inter, q, "column",
                self.tp_size)
            self.specs["dense_down"] = LinearSpec.make(
                "dense_down", self.dense_inter, H, q, "row", self.tp_size)
        if self.n_moe:
            self.specs["gate_up"] = LinearSpec.make(
                "gate_up", H, E * 2 * I, q, "column", self.tp_size)
            self.specs["down"] = LinearSpec.make(
                "down", E * I, H, q, "row", self.tp_size, k_align=I)
            self.specs["shared_gate_up"] = LinearSpec.make(
                "shared_gate_up", H, 2 * I, q, "column", self.tp_size)
            self.specs["shared_down"] = LinearSpec.make(
                "shared_down", I, H, q, "row", self.tp_size)

    # Mixtral machinery for the routed experts
    _experts_apply = MixtralForCausalLM._experts_apply
    _record_experts = MixtralForCausalLM._record_experts

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------

    def pretranslate_tensors(self, tensors):
        """Split the fused expert tensors, renumber the interleaved
        MoE/dense stacks to contiguous virtual layer indices."""
        out = {}
        I = self.moe_inter
        for name, arr in tensors.items():
            if ".feed_forward." not in name:
                out[name] = arr
                continue
            parts = name.split(".")
            l = int(parts[2])
            rest = ".".join(parts[4:])
            if self._is_moe[l]:
                mi = self._li_moe[l]
                base = f"model.layers.{mi}.moe_ff."
                a = np.asarray(arr)
                if rest == "experts.gate_up_proj":  # [E, H, 2I] fused
                    for e in range(a.shape[0]):
                        out[base + f"experts.{e}.w1.weight"] = (
                            np.ascontiguousarray(a[e][:, :I].T))
                        out[base + f"experts.{e}.w3.weight"] = (
                            np.ascontiguousarray(a[e][:, I:].T))
                elif rest == "experts.down_proj":  # [E, I, H] fused
                    for e in range(a.shape[0]):
                        out[base + f"experts.{e}.w2.weight"] = (
                            np.ascontiguousarray(a[e].T))
                elif rest.startswith("shared_expert."):
                    out[base + "shared." + rest[len("shared_expert."):]] = a
                elif rest == "router.weight":
                    out[base + "router.weight"] = a
                else:
                    out[name] = arr
            else:
                di = self._li_dense[l]
                out[f"model.layers.{di}.dense_ff.{rest}"] = arr
        return out

    def merge_schema(self) -> Dict[str, tuple]:
        E, L = self.num_experts, self.config.num_layers
        schema: Dict[str, tuple] = {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n", (0, L)),
            "o": (["self_attn.o_proj"], "n", (0, L)),
        }
        if self.n_dense:
            schema["dense_gate_up"] = (
                ["dense_ff.gate_proj", "dense_ff.up_proj"], "n",
                (0, self.n_dense))
            schema["dense_down"] = (
                ["dense_ff.down_proj"], "n", (0, self.n_dense))
        if self.n_moe:
            schema["gate_up"] = (
                [f"moe_ff.experts.{e}.{w}" for e in range(E)
                 for w in ("w1", "w3")], "ne", (0, self.n_moe))
            schema["down"] = (
                [f"moe_ff.experts.{e}.w2" for e in range(E)], "k",
                (0, self.n_moe))
            schema["shared_gate_up"] = (
                ["moe_ff.shared.gate_proj", "moe_ff.shared.up_proj"], "n",
                (0, self.n_moe))
            schema["shared_down"] = (
                ["moe_ff.shared.down_proj"], "n", (0, self.n_moe))
        return schema

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        if not self.n_moe:
            return {}
        return {
            "router": jnp.asarray(
                np.stack([
                    t(f"model.layers.{mi}.moe_ff.router.weight").T
                    for mi in range(self.n_moe)
                ]), jnp.bfloat16),
        }

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        seg = {"dense_gate_up": self.n_dense, "dense_down": self.n_dense,
               "gate_up": self.n_moe, "down": self.n_moe,
               "shared_gate_up": self.n_moe, "shared_down": self.n_moe}
        for name, n in seg.items():
            if name in self.specs:
                shapes["layers"][name] = self.specs[name].param_shapes(n)
        if self.n_moe:
            shapes["layers"]["router"] = (
                (self.n_moe, c.hidden_size, self.num_experts), jnp.bfloat16)
        return shapes

    # ------------------------------------------------------------------
    # attention hooks
    # ------------------------------------------------------------------

    def _post_rope_qk(self, q, k, positions, l):
        if self.use_qk_l2norm:
            # rope layers only (HF: use_qk_norm and layer_uses_rope)
            use_rope = 1 - jnp.asarray(
                np.asarray(self._rope_idx, np.int32))[l]
            qn, kn = _l2norm(q), _l2norm(k)
            q = jnp.where(use_rope.astype(bool), qn, q)
            k = jnp.where(use_rope.astype(bool), kn, k)
        if self.attn_temp_tuning:
            # NoPE layers: position-temperature on q (HF attn_scale)
            is_nope = jnp.asarray(np.asarray(self._rope_idx, np.int32))[l]
            scale = (
                jnp.log1p(jnp.floor(
                    (positions.astype(jnp.float32) + 1.0) / self.floor_scale
                )) * self.attn_scale + 1.0
            )
            scale = jnp.where(is_nope.astype(bool), scale, 1.0)
            q = (q.astype(jnp.float32) * scale[:, None, None]).astype(q.dtype)
        return q, k

    # ------------------------------------------------------------------
    # MLP: interleaved MoE / dense
    # ------------------------------------------------------------------

    def _dense_mlp(self, lp, h2, li):
        gu = linear_apply(self.specs["dense_gate_up"], lp["dense_gate_up"],
                          h2, li)
        return linear_apply(self.specs["dense_down"], lp["dense_down"],
                            silu_and_mul(gu), li)

    def _moe_mlp(self, lp, h2, li):
        T = h2.shape[0]
        logits = jnp.dot(h2, lp["router"][li],
                         preferred_element_type=jnp.float32)  # [T, E]
        topv, topi = lax.top_k(logits, 1)
        self._record_experts(topi, li)
        s = jax.nn.sigmoid(topv[:, 0])
        # llama4 scales the expert INPUT by the sigmoid score: the scale
        # passes through the gate nonlinearity, so it cannot be folded into
        # the post-act weight — scale x, select the expert with weight 1
        xs = (h2.astype(jnp.float32) * s[:, None]).astype(h2.dtype)
        routed = self._experts_apply(
            lp, xs, topi, jnp.ones_like(topv), li)
        sgu = linear_apply(self.specs["shared_gate_up"],
                           lp["shared_gate_up"], h2, li)
        shared = linear_apply(self.specs["shared_down"], lp["shared_down"],
                              silu_and_mul(sgu), li)
        return routed + shared

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        if not self.n_moe:
            return self._dense_mlp(lp, h2, jnp.asarray(
                np.asarray(self._li_dense, np.int32))[l])
        if not self.n_dense:
            return self._moe_mlp(lp, h2, jnp.asarray(
                np.asarray(self._li_moe, np.int32))[l])
        li_m = jnp.asarray(np.asarray(self._li_moe, np.int32))[l]
        li_d = jnp.asarray(np.asarray(self._li_dense, np.int32))[l]
        return lax.cond(
            jnp.asarray(np.asarray(self._is_moe, np.int32))[l] == 1,
            lambda: self._moe_mlp(lp, h2, li_m),
            lambda: self._dense_mlp(lp, h2, li_d),
        )
