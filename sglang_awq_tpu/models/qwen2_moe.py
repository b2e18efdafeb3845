"""Qwen2-MoE (e.g. Qwen1.5-MoE-A2.7B, Qwen2-57B-A14B).

Role model: reference `python/sglang/srt/models/qwen2_moe.py` (routed
experts + a SHARED expert gated by sigmoid(shared_expert_gate)).  Builds on
the Mixtral dense-all-expert formulation (models/mixtral.py): routed
experts merge into two matmuls; the shared expert is a plain SwiGLU MLP
whose output adds in scaled by the sigmoid gate.

Differences vs Mixtral handled here:
* expert size comes from `moe_intermediate_size` (not intermediate_size)
* top-k probs renormalize only when `norm_topk_prob` is set
* qkv bias (Qwen2 family)
* every layer is sparse (v1: `mlp_only_layers` / sparse-step != 1 are
  rejected loudly rather than silently mis-served)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax

from sglang_awq_tpu.layers.activation import silu_and_mul
from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.models.mixtral import MixtralForCausalLM


@dataclasses.dataclass
class Qwen2MoeForCausalLM(MixtralForCausalLM):
    qkv_bias: bool = True

    def __post_init__(self):
        c = self.config
        hf = c.hf_config
        # the Mixtral base reads these; map Qwen2-MoE's names first
        hf.setdefault("num_local_experts", hf.get("num_experts", 60))
        if hf.get("mlp_only_layers") or hf.get("decoder_sparse_step", 1) != 1:
            raise NotImplementedError(
                "qwen2_moe with dense layers (mlp_only_layers / "
                "decoder_sparse_step != 1) is not supported yet"
            )
        self.moe_inter = int(hf["moe_intermediate_size"])
        self.shared_inter = int(
            hf.get("shared_expert_intermediate_size", 0)
        )
        self.norm_topk = bool(hf.get("norm_topk_prob", False))
        super().__post_init__()
        E, H = self.num_experts, c.hidden_size
        q = c.quant_config
        # routed experts use moe_intermediate_size
        self.specs["gate_up"] = LinearSpec.make(
            "gate_up", H, E * 2 * self.moe_inter, q, "column", self.tp_size
        )
        self.specs["down"] = LinearSpec.make(
            "down", E * self.moe_inter, H, q, "row", self.tp_size,
            k_align=self.moe_inter,
        )
        if self.shared_inter:
            self.specs["shared_gate_up"] = LinearSpec.make(
                "shared_gate_up", H, 2 * self.shared_inter, q, "column",
                self.tp_size,
            )
            self.specs["shared_down"] = LinearSpec.make(
                "shared_down", self.shared_inter, H, q, "row", self.tp_size
            )

    def merge_schema(self) -> Dict[str, tuple]:
        E = self.num_experts
        schema = {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "gate_up": (
                [f"mlp.experts.{e}.{w}" for e in range(E)
                 for w in ("gate_proj", "up_proj")],
                "ne",
            ),
            "down": ([f"mlp.experts.{e}.down_proj" for e in range(E)], "k"),
        }
        if self.shared_inter:
            schema["shared_gate_up"] = (
                ["mlp.shared_expert.gate_proj", "mlp.shared_expert.up_proj"],
                "n",
            )
            schema["shared_down"] = (["mlp.shared_expert.down_proj"], "n")
        return schema

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        import numpy as np

        out = {
            "router": jnp.asarray(
                np.stack(
                    [t(f"model.layers.{l}.mlp.gate.weight").T
                     for l in range(L)]
                ),
                jnp.bfloat16,
            )
        }
        if self.shared_inter:
            out["shared_gate"] = jnp.asarray(
                np.stack(
                    [t(f"model.layers.{l}.mlp.shared_expert_gate.weight").T
                     for l in range(L)]
                ),
                jnp.bfloat16,
            )  # [L, H, 1]
        return out

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        if self.shared_inter:
            shapes["layers"]["shared_gate"] = (
                (c.num_layers, c.hidden_size, 1), jnp.bfloat16,
            )
        return shapes

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        router_logits = jnp.dot(
            h2, lp["router"][l], preferred_element_type=jnp.float32
        )
        probs = jax.nn.softmax(router_logits, axis=-1)
        topv, topi = lax.top_k(probs, self.top_k)
        self._record_experts(topi, l)
        if self.norm_topk:
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        out = self._experts_apply(lp, h2, topi, topv, l)
        if self.shared_inter:
            sg = jax.nn.sigmoid(
                jnp.dot(h2, lp["shared_gate"][l],
                        preferred_element_type=jnp.float32)
            )  # [T, 1]
            sgu = linear_apply(
                self.specs["shared_gate_up"], lp["shared_gate_up"], h2, l
            )
            sact = silu_and_mul(sgu)
            shared = linear_apply(
                self.specs["shared_down"], lp["shared_down"], sact, l
            )
            out = out + (shared.astype(jnp.float32) * sg).astype(out.dtype)
        return out


@dataclasses.dataclass
class Qwen3MoeForCausalLM(Qwen2MoeForCausalLM):
    """Qwen3-MoE: the Qwen2-MoE graph without the shared expert, without
    qkv biases, and with Qwen3's per-head q/k RMSNorm.  Role model:
    reference `python/sglang/srt/models/qwen3_moe.py`."""

    qkv_bias: bool = False
    qk_norm: bool = True

    def __post_init__(self):
        self.config.hf_config.setdefault("shared_expert_intermediate_size", 0)
        super().__post_init__()
