"""Baidu ERNIE 4.5 MoE (e.g. ERNIE-4.5-21B-A3B) causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/ernie4.py` MoE classes.
The GLM-4-MoE skeleton (models/glm4_moe.py — standard GQA + DeepSeek-style
merged-expert MoE) with ERNIE's conventions:

* INTERLEAVED rotary pairs (like dense ERNIE 4.5) and optional use_bias;
* softmax router scores with an `e_score_correction_bias` that shapes
  SELECTION only ("noaux_softmax"); selected weights renormalize;
* dense layers before `moe_layer_start_index` (maps onto first-k-dense);
  `moe_layer_interval != 1` / early `moe_layer_end_index` are rejected
  loudly;
* one shared-experts MLP of width moe_intermediate_size * n_shared.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.glm4_moe import Glm4MoeForCausalLM


@dataclasses.dataclass
class Ernie45MoeForCausalLM(Glm4MoeForCausalLM):
    rope_interleaved: bool = True

    def __post_init__(self):
        hf = self.config.hf_config
        L = int(hf["num_hidden_layers"])
        if int(hf.get("moe_layer_interval", 1)) != 1:
            raise NotImplementedError("ernie moe_layer_interval != 1")
        end = int(hf.get("moe_layer_end_index", L - 1))
        if end < L - 1:
            raise NotImplementedError("ernie trailing dense layers")
        # map ERNIE names onto the GLM-4-MoE/DeepSeek config surface
        hf.setdefault("n_routed_experts", hf.get("moe_num_experts", 64))
        hf.setdefault("num_experts_per_tok", hf.get("moe_k", 6))
        hf.setdefault("n_shared_experts", hf.get("moe_num_shared_experts", 0))
        hf.setdefault("first_k_dense_replace",
                      hf.get("moe_layer_start_index", 0))
        hf.setdefault("partial_rotary_factor", 1.0)
        hf.setdefault("attention_bias", bool(hf.get("use_bias", False)))
        hf.setdefault("norm_topk_prob", True)
        super().__post_init__()
        self.topk_method = "noaux_softmax"

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        k = self.first_k_dense
        return {
            "router": jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.mlp.gate.weight").T
                    for l in range(k, L)
                ]), jnp.bfloat16),
            "router_bias": jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.mlp.moe_statics."
                      f"e_score_correction_bias").reshape(-1)
                    for l in range(k, L)
                ]), jnp.float32),
        }
