"""Phi-3 causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/phi3_small.py` /
`llama.py`-family handling of `Phi3ForCausalLM` (the reference loads
Phi-3's fused `qkv_proj` / `gate_up_proj` through stacked_params_mapping).

Differences from Llama, all handled here:

* Checkpoints store FUSED projections: `self_attn.qkv_proj` = [Q|K|V] and
  `mlp.gate_up_proj` = [gate|up] (HF Phi3Attention/Phi3MLP chunk order).
  `pretranslate_tensors` splits them back to canonical per-projection
  names so the standard merge schema (and its TP interleave) applies.
* LongRoPE scaling (`rope_scaling.type == "longrope"`, per-dim
  short/long factor lists + original_max_position_embeddings) —
  implemented in layers/rotary.py and validated against HF's
  ROPE_INIT_FUNCTIONS in tests/test_rotary.py.
* A uniform sliding window on every layer when `sliding_window` is set
  (the existing per-layer window path the Gemma2 kernels use).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class Phi3ForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        c = self.config
        hf = c.hf_config
        sw = int(hf.get("sliding_window") or 0)
        if sw:
            self.layer_windows = tuple(sw for _ in range(c.num_layers))
        super().__post_init__()

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        D = c.head_dim
        nq = c.num_attention_heads * D
        nkv = c.num_kv_heads * D
        out = {}
        for name, arr in tensors.items():
            if name.endswith("self_attn.qkv_proj.weight"):
                base = name[: -len("qkv_proj.weight")]
                # torch Linear layout [out, in]; rows are [Q | K | V]
                out[base + "q_proj.weight"] = arr[:nq]
                out[base + "k_proj.weight"] = arr[nq : nq + nkv]
                out[base + "v_proj.weight"] = arr[nq + nkv : nq + 2 * nkv]
            elif name.endswith("mlp.gate_up_proj.weight"):
                base = name[: -len("gate_up_proj.weight")]
                inter = arr.shape[0] // 2  # rows are [gate | up]
                out[base + "gate_proj.weight"] = arr[:inter]
                out[base + "up_proj.weight"] = arr[inter:]
            else:
                out[name] = arr
        return out
