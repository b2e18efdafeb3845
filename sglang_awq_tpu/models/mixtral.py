"""Mixtral (sparse MoE) causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/mixtral.py` (MixtralMoE
block: gate + fused_moe) with AWQ expert weights handled by `AWQMoEMethod`
(`python/sglang/srt/layers/quantization/awq.py:661`) and the fused MoE
Triton path (`layers/moe/fused_moe_triton/fused_moe.py`).

TPU re-design — dense all-expert formulation instead of gather/scatter
dispatch:

* gate_up for ALL experts is ONE matmul: experts are merged along the
  output dim ([H, E*2I], per-expert blocks [gate_e | up_e]), so the packed
  AWQ Pallas kernel runs unchanged.  down is ONE matmul with experts merged
  along the contraction dim ([E*I, H]): Y = sum_e act_e @ W2_e == concat_e
  act_e @ vstack_e W2_e.  Router weights (0 for non-top-k) scale the
  activations between the two matmuls, which is algebraically identical to
  the reference's post-expert scaling (the down projection is linear).
* Why dense beats dispatch at serving batch sizes: decode is memory-bound
  and every expert's weights are read anyway (E=8, top-2 of 64 requests hits
  all experts w.h.p.), so the extra FLOPs of scoring every token against
  every expert ride along free on the MXU — and there is no sort, no
  capacity overflow, no ragged dispatch, no host round trip.  (A capacity-
  bucketed prefill path is a later optimization for very long extends.)
* Expert parallelism IS the existing TP sharding: column-sharding [H, E*2I]
  and row-sharding [E*I, H] over the model axis places E/tp whole experts
  per device (asserted), and the row-parallel psum that already follows the
  MLP is the expert combine.  No all-to-all: tokens are replicated across
  the model axis (as for TP attention), expert outputs reduce over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from sglang_awq_tpu.layers.activation import silu_and_mul
from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class MixtralForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        c = self.config
        self.num_experts = int(c.hf_config.get("num_local_experts", 8))
        self.top_k = int(c.hf_config.get("num_experts_per_tok", 2))
        assert self.num_experts % self.tp_size == 0, (
            f"expert count {self.num_experts} must divide by tp {self.tp_size}"
        )
        self.experts_local = self.num_experts // self.tp_size
        # routed-expert intermediate size (qwen2_moe overrides via moe_inter)
        self.expert_inter = getattr(self, "moe_inter", c.intermediate_size)
        # EPLB observability sink (eplb/expert_distribution.py); None = off
        self.expert_dist_sink = None
        E, I, H = self.num_experts, c.intermediate_size, c.hidden_size
        q = c.quant_config
        # replace the dense-MLP specs with expert-merged ones
        self.specs["gate_up"] = LinearSpec.make(
            "gate_up", H, E * 2 * I, q, "column", self.tp_size
        )
        self.specs["down"] = LinearSpec.make(
            "down", E * I, H, q, "row", self.tp_size, k_align=I
        )

    # ------------------------------------------------------------------
    # loader hooks (consumed by model_loader/loader.py)
    # ------------------------------------------------------------------

    def merge_schema(self) -> Dict[str, tuple]:
        """target -> (HF source projections, merge kind).

        kind "n"  : concat along output dim, TP-interleaved per shard
        kind "ne" : concat along output dim, whole blocks per shard (experts)
        kind "k"  : concat along contraction dim
        """
        E = self.num_experts
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "gate_up": (
                [
                    f"block_sparse_moe.experts.{e}.{w}"
                    for e in range(E)
                    for w in ("w1", "w3")
                ],
                "ne",
            ),
            "down": ([f"block_sparse_moe.experts.{e}.w2" for e in range(E)], "k"),
        }

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        """Router gate (never quantized in AWQ checkpoints)."""
        import numpy as np

        return {
            "router": jnp.asarray(
                np.stack(
                    [
                        t(f"model.layers.{l}.block_sparse_moe.gate.weight").T
                        for l in range(L)
                    ]
                ),
                jnp.bfloat16,
            )
        }

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        shapes["layers"]["router"] = (
            (c.num_layers, c.hidden_size, self.num_experts),
            jnp.bfloat16,
        )
        return shapes

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------


    # ------------------------------------------------------------------
    # EPLB (eplb/expert_distribution.py; reference srt/eplb/)
    # ------------------------------------------------------------------

    def _record_experts(self, topi: jax.Array, l) -> None:
        """Stream per-layer expert counts to the host recorder (when on).

        io_callback inside jit: the traced program is unchanged when the
        sink is None; toggling clears the runner's jit cache to retrace.
        """
        if self.expert_dist_sink is None:
            return
        cnt = jnp.sum(
            jax.nn.one_hot(topi.reshape(-1), self.num_experts,
                           dtype=jnp.int32),
            axis=0,
        )
        jax.experimental.io_callback(
            self.expert_dist_sink, None, l, cnt, ordered=False
        )

    def permute_experts(self, layers: Dict[str, Any], perm) -> Dict[str, Any]:
        """Relocate experts per an EPLB permutation (shard s owns experts
        perm[s*El:(s+1)*El] afterwards).  Router columns move with their
        expert blocks, so logits are invariant — pinned by
        tests/test_eplb.py.  bf16 weights only (AWQ block repack is the
        later upgrade)."""
        assert not self.specs["gate_up"].quantized, (
            "EPLB relocation supports unquantized expert weights (v1)"
        )
        import numpy as np

        E, I = self.num_experts, self.expert_inter
        perm = np.asarray(perm, np.int32)
        assert sorted(perm.tolist()) == list(range(E)), perm
        out = dict(layers)
        out["router"] = layers["router"][..., perm]
        gu = layers["gate_up"]["weight"]  # [L, H, E*2I]
        L, H = gu.shape[0], gu.shape[1]
        out["gate_up"] = {
            "weight": gu.reshape(L, H, E, 2 * I)[:, :, perm].reshape(
                L, H, E * 2 * I
            )
        }
        dn = layers["down"]["weight"]  # [L, E*I, H]
        out["down"] = {
            "weight": dn.reshape(L, E, I, -1)[:, perm].reshape(dn.shape)
        }
        return out

    def _experts_apply(self, lp: Dict[str, Any], h2: jax.Array,
                       topi: jax.Array, topv: jax.Array, li) -> jax.Array:
        """Routed-experts MLP given per-assignment weights topv [T, K].

        Dense all-expert formulation at decode sizes (every expert's weights
        are read anyway — FLOPs ride free on the MXU); grouped megablocks-
        style dispatch (ops/moe_grouped.py) at prefill sizes for large E,
        where dense would be E/topk x the reference FLOPs.
        """
        from sglang_awq_tpu.ops.moe_grouped import (
            moe_grouped_enabled,
            moe_grouped_mlp,
        )

        T = h2.shape[0]
        E, I, El = self.num_experts, self.expert_inter, self.experts_local
        spec_gu, spec_d = self.specs["gate_up"], self.specs["down"]
        e0 = (lax.axis_index(self.tp_axis) * El
              if self.tp_axis is not None else 0)
        if moe_grouped_enabled(T, E, spec_gu, spec_d, I):
            return moe_grouped_mlp(
                spec_gu, lp["gate_up"], spec_d, lp["down"], h2, topi, topv,
                li, e0=e0, n_local=El, inter=I,
            )
        w = jnp.sum(
            jax.nn.one_hot(topi, E, dtype=topv.dtype) * topv[..., None], axis=1
        )  # [T, E]
        if self.tp_axis is not None:
            w = lax.dynamic_slice_in_dim(w, e0, El, axis=1)
        gu = linear_apply(spec_gu, lp["gate_up"], h2, li)
        act = silu_and_mul(gu.reshape(T, El, 2 * I))  # [T, El, I]
        act = (act.astype(jnp.float32) * w[..., None]).astype(gu.dtype)
        return linear_apply(spec_d, lp["down"], act.reshape(T, El * I), li)

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx  # LoRA-on-MoE: not supported (reference parity)
        K = self.top_k

        router_logits = jnp.dot(
            h2, lp["router"][l], preferred_element_type=jnp.float32
        )  # [T, E]
        probs = jax.nn.softmax(router_logits, axis=-1)
        topv, topi = lax.top_k(probs, K)  # [T, K]
        self._record_experts(topi, l)
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        return self._experts_apply(lp, h2, topi, topv, l)
