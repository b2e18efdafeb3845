"""GLM-4.5 / GLM-4.6 MoE causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/glm4_moe.py`.  Standard
GQA attention with STANDARD half-split partial rotary (unlike dense GLM's
interleaved pairs), optional per-head qk-norm, optional qkv biases + the DeepSeek-V3 MoE block:
sigmoid scoring with an `e_score_correction_bias` shaping selection only
(noaux-tc), optional group-limited top-k, norm_topk_prob renormalization,
`routed_scaling_factor`, always-on shared experts, and
`first_k_dense_replace` dense layers up front.

The MoE forward/merge machinery is shared with models/deepseek_v2.py —
the methods are borrowed directly; only the attention side differs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.layers.linear import LinearSpec
from sglang_awq_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class Glm4MoeForCausalLM(LlamaForCausalLM):
    # unlike GLM/GLM-4 dense, the MoE models rotate standard half-split
    # pairs (HF glm4_moe rotate_half), partial over the first half

    def __post_init__(self):
        c = self.config
        hf = c.hf_config
        hf.setdefault("partial_rotary_factor", 0.5)
        self.qkv_bias = bool(hf.get("attention_bias", False))
        self.qk_norm = bool(hf.get("use_qk_norm", False))
        super().__post_init__()

        # --- DeepSeek-style MoE geometry (deepseek_v2.py attrs) ---
        self.num_experts = int(hf.get("n_routed_experts") or 0)
        self.first_k_dense = int(hf.get("first_k_dense_replace", 0))
        if self.first_k_dense >= c.num_layers:
            self.num_experts = 0
            self.first_k_dense = c.num_layers
        self.top_k = int(hf.get("num_experts_per_tok", 8))
        self.moe_inter = int(hf.get("moe_intermediate_size") or 0)
        self.n_shared = int(hf.get("n_shared_experts") or 0)
        self.routed_scale = float(hf.get("routed_scaling_factor", 1.0))
        self.topk_method = "noaux_tc"  # sigmoid + e_score_correction_bias
        self.n_group = int(hf.get("n_group") or 1)
        self.topk_group = int(hf.get("topk_group") or 1)
        self.norm_topk = bool(hf.get("norm_topk_prob", True))
        self.expert_dist_sink = None
        self.expert_inter = self.moe_inter
        if self.num_experts:
            assert self.num_experts % self.tp_size == 0, (
                self.num_experts, self.tp_size)
        self.experts_local = (
            self.num_experts // self.tp_size if self.num_experts else 0
        )

        q = c.quant_config
        H = c.hidden_size
        del self.specs["gate_up"], self.specs["down"]
        k = self.first_k_dense
        if k > 0:
            self.specs["dense_gate_up"] = LinearSpec.make(
                "dense_gate_up", H, 2 * c.intermediate_size, q, "column",
                self.tp_size)
            self.specs["dense_down"] = LinearSpec.make(
                "dense_down", c.intermediate_size, H, q, "row", self.tp_size)
        if self.num_experts:
            E, I = self.num_experts, self.moe_inter
            self.specs["gate_up"] = LinearSpec.make(
                "gate_up", H, E * 2 * I, q, "column", self.tp_size)
            self.specs["down"] = LinearSpec.make(
                "down", E * I, H, q, "row", self.tp_size, k_align=I)
            if self.n_shared:
                si = self.n_shared * I
                self.specs["shared_gate_up"] = LinearSpec.make(
                    "shared_gate_up", H, 2 * si, q, "column", self.tp_size)
                self.specs["shared_down"] = LinearSpec.make(
                    "shared_down", si, H, q, "row", self.tp_size)

    # MoE forward + expert recording: shared with DeepSeek-V2/V3
    _seg_layers = DeepseekV2ForCausalLM._seg_layers
    _dense_mlp = DeepseekV2ForCausalLM._dense_mlp
    _moe_mlp = DeepseekV2ForCausalLM._moe_mlp
    _experts_apply = DeepseekV2ForCausalLM._experts_apply
    _record_experts = DeepseekV2ForCausalLM._record_experts
    _mlp = DeepseekV2ForCausalLM._mlp

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_layers, c.hidden_size
        shapes = super().param_shapes()
        for name, spec in self.specs.items():
            shapes["layers"][name] = spec.param_shapes(
                self._seg_layers(name), tp_size=1
            )
        if self.num_experts:
            Lm = L - self.first_k_dense
            shapes["layers"]["router"] = (
                (Lm, H, self.num_experts), jnp.bfloat16)
            shapes["layers"]["router_bias"] = (
                (Lm, self.num_experts), jnp.float32)
        return shapes

    def merge_schema(self) -> Dict[str, tuple]:
        L = self.config.num_layers
        k = self.first_k_dense
        schema: Dict[str, tuple] = {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
        }
        if k > 0:
            schema["dense_gate_up"] = (
                ["mlp.gate_proj", "mlp.up_proj"], "n", (0, k))
            schema["dense_down"] = (["mlp.down_proj"], "n", (0, k))
        if self.num_experts:
            E = self.num_experts
            schema["gate_up"] = (
                [f"mlp.experts.{e}.{w}" for e in range(E)
                 for w in ("gate_proj", "up_proj")],
                "ne", (k, L))
            schema["down"] = (
                [f"mlp.experts.{e}.down_proj" for e in range(E)], "k", (k, L))
            if self.n_shared:
                schema["shared_gate_up"] = (
                    ["mlp.shared_experts.gate_proj",
                     "mlp.shared_experts.up_proj"], "n", (k, L))
                schema["shared_down"] = (
                    ["mlp.shared_experts.down_proj"], "n", (k, L))
        return schema

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        k = self.first_k_dense
        out: Dict[str, jax.Array] = {}
        if self.num_experts:
            out["router"] = jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.mlp.gate.weight").T
                    for l in range(k, L)
                ]), jnp.bfloat16)
            out["router_bias"] = jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.mlp.gate.e_score_correction_bias")
                    for l in range(k, L)
                ]), jnp.float32)
        return out


@dataclasses.dataclass
class Dots1ForCausalLM(Glm4MoeForCausalLM):
    """rednote-hilab dots.llm1.  Role model: reference
    `python/sglang/srt/models/dots_vlm.py` text stack / model-zoo coverage.
    The GLM-4-MoE graph with Qwen3-style ALWAYS-ON per-head q/k RMSNorm and
    full (non-partial) standard rotary."""

    def __post_init__(self):
        hf = self.config.hf_config
        hf.setdefault("partial_rotary_factor", 1.0)
        hf["use_qk_norm"] = True
        super().__post_init__()


@dataclasses.dataclass
class MiniMaxM2ForCausalLM(Glm4MoeForCausalLM):
    """MiniMax-M2.  Role model: reference
    `python/sglang/srt/models/minimax_m2.py` (MiniMaxM2Attention :329 —
    FULL-width q/k RMSNormTP + partial rope by absolute `rotary_dim`;
    MiniMaxM2MoE :128 — every layer sparse, sigmoid scoring with optional
    `use_routing_bias` correction bias, renormalized top-k, no shared
    experts; expert checkpoints use w1/w2/w3 names).

    The GLM-4-MoE graph covers everything: config keys normalize to the
    DeepSeek names, the per-head qk-norm flag swaps for the FULL-width
    one (OLMoE machinery, TP-correct psum variance), and w1/w2/w3 expert
    tensors pretranslate to gate/up/down."""

    def __post_init__(self):
        hf = self.config.hf_config
        hf.setdefault("n_routed_experts", hf.get("num_local_experts"))
        hf.setdefault("moe_intermediate_size", hf.get("intermediate_size"))
        hf.setdefault("first_k_dense_replace", 0)
        hf.setdefault("n_shared_experts", 0)
        hf.setdefault("norm_topk_prob", True)
        head_dim = int(hf.get("head_dim")
                       or hf["hidden_size"] // hf["num_attention_heads"])
        rd = int(hf.get("rotary_dim") or head_dim)
        hf.setdefault("partial_rotary_factor", rd / head_dim)
        self._m2_qk_norm = bool(hf.get("use_qk_norm", False)) and \
            str(hf.get("qk_norm_type", "per_layer")) == "per_layer"
        hf["use_qk_norm"] = False  # glm4 would take the PER-HEAD variant
        super().__post_init__()
        self.qk_norm_full = self._m2_qk_norm
        assert str(hf.get("scoring_func", "sigmoid")) == "sigmoid"
        if not hf.get("use_routing_bias", False):
            self._no_router_bias = True

    def pretranslate_tensors(self, tensors):
        out = {}
        for name, arr in tensors.items():
            if ".experts." in name:
                name = name.replace(".w1.", ".gate_proj.").replace(
                    ".w2.", ".down_proj.").replace(".w3.", ".up_proj.")
            out[name] = arr
        return out

    def extra_layer_params(self, t, L: int):
        if not getattr(self, "_no_router_bias", False):
            return super().extra_layer_params(t, L)
        out = {"router": jnp.asarray(np.stack([
            t(f"model.layers.{l}.mlp.gate.weight").T for l in range(L)
        ]), jnp.bfloat16)}
        out["router_bias"] = jnp.zeros(
            (L, self.num_experts), jnp.float32)  # bias-free routing
        return out
