"""Tencent HunYuan v1 dense causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/hunyuan.py` (dense path).
The Llama graph with per-head q/k RMSNorm applied AFTER RoPE
(`query_layernorm` / `key_layernorm` — the base class's
qk_norm_post_rope flag); standard half-split rotary, gated silu MLP,
no biases.  The MoE / cross-layer-attention variants are a later step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class HunYuanDenseV1ForCausalLM(LlamaForCausalLM):
    qk_norm: bool = True
    qk_norm_post_rope: bool = True

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        out = {}
        for name, arr in tensors.items():
            out[
                name.replace(".self_attn.query_layernorm.",
                             ".self_attn.q_norm.")
                .replace(".self_attn.key_layernorm.", ".self_attn.k_norm.")
            ] = arr
        return out
