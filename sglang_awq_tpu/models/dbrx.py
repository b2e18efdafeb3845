"""Databricks DBRX causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/dbrx.py`.  The Qwen2-MoE
dense-all-expert graph with DBRX's conventions:

* LayerNorm (mean-centered, weight-only, no bias) everywhere — the base
  class's `_norm` hook;
* fused Wqkv with `clip_qkv` clamping (base `qkv_clip`);
* softmax-then-top-k routing, top-k weights L1-renormalized when
  `moe_normalize_expert_weights` is set;
* experts stored as stacked [E*I, H] parameters (w1 = gate, v1 = up,
  w2 = down) — split into per-expert pseudo-Linear tensors at load.

Checkpoint naming (transformer.blocks.*, wte/norm_f, norm_attn_norm) is
canonicalized in `pretranslate_tensors`; config naming (d_model/n_heads/
attn_config/ffn_config) in configs/model_config.py.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import numpy as np

from sglang_awq_tpu.layers.norm import layer_norm
from sglang_awq_tpu.models.qwen2_moe import Qwen2MoeForCausalLM


@dataclasses.dataclass
class DbrxForCausalLM(Qwen2MoeForCausalLM):
    qkv_bias: bool = False

    def __post_init__(self):
        hf = self.config.hf_config
        fc = hf.get("ffn_config") or {}
        hf.setdefault("num_local_experts", fc.get("moe_num_experts", 16))
        hf.setdefault("moe_intermediate_size", fc.get("ffn_hidden_size"))
        hf.setdefault("num_experts_per_tok", fc.get("moe_top_k", 4))
        hf.setdefault("shared_expert_intermediate_size", 0)
        hf.setdefault(
            "norm_topk_prob",
            fc.get("moe_normalize_expert_weights") is not None,
        )
        super().__post_init__()
        self.qkv_clip = float(hf.get("clip_qkv") or 0.0)

    def _norm(self, x, w, eps):
        return layer_norm(x, w, eps)

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        H = c.hidden_size
        nq = c.num_attention_heads * c.head_dim
        nkv = c.num_kv_heads * c.head_dim
        E, I = self.num_experts, self.moe_inter
        out = {}
        for name, arr in tensors.items():
            name = (
                name.replace("transformer.wte.", "model.embed_tokens.")
                .replace("transformer.norm_f.", "model.norm.")
                .replace("transformer.blocks.", "model.layers.")
                .replace(".norm_attn_norm.norm_1.", ".input_layernorm.")
                .replace(".norm_attn_norm.norm_2.",
                         ".post_attention_layernorm.")
                .replace(".ffn.router.layer.", ".mlp.gate.")
            )
            if name.endswith(".norm_attn_norm.attn.Wqkv.weight"):
                base = name[: -len("norm_attn_norm.attn.Wqkv.weight")]
                out[base + "self_attn.q_proj.weight"] = arr[:nq]
                out[base + "self_attn.k_proj.weight"] = arr[nq : nq + nkv]
                out[base + "self_attn.v_proj.weight"] = arr[nq + nkv :]
            elif name.endswith(".norm_attn_norm.attn.out_proj.weight"):
                base = name[: -len("norm_attn_norm.attn.out_proj.weight")]
                out[base + "self_attn.o_proj.weight"] = arr
            elif name.endswith(".ffn.experts.mlp.w1"):
                base = name[: -len("ffn.experts.mlp.w1")]
                for e in range(E):
                    out[f"{base}mlp.experts.{e}.gate_proj.weight"] = arr[
                        e * I : (e + 1) * I
                    ]  # [I, H] torch-Linear layout already
            elif name.endswith(".ffn.experts.mlp.v1"):
                base = name[: -len("ffn.experts.mlp.v1")]
                for e in range(E):
                    out[f"{base}mlp.experts.{e}.up_proj.weight"] = arr[
                        e * I : (e + 1) * I
                    ]
            elif name.endswith(".ffn.experts.mlp.w2"):
                base = name[: -len("ffn.experts.mlp.w2")]
                for e in range(E):
                    out[f"{base}mlp.experts.{e}.down_proj.weight"] = (
                        np.ascontiguousarray(arr[e * I : (e + 1) * I].T)
                    )  # stored [I, H]; Linear layout is [H, I]
            else:
                out[name] = arr
        return out

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        import jax.numpy as jnp

        return {
            "router": jnp.asarray(
                np.stack(
                    [t(f"model.layers.{l}.mlp.gate.weight").T
                     for l in range(L)]
                ),
                jnp.bfloat16,
            )
        }
