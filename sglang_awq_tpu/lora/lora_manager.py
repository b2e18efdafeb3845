"""LoRA adapter batching: multiple adapters served in one batch.

Role model: reference `python/sglang/srt/lora/lora_manager.py:50,242`
(adapter registry + unified memory pool `lora/mem_pool.py` + batched
sgemm `lora/triton_ops/`).  TPU re-design — dense-over-slots instead of
gather/dispatch (the same decision as the MoE layer, models/mixtral.py):

* All S adapter slots live stacked in HBM per merged projection:
  A [S, L, K, R], B [S, L, R, N] (R = max rank over loaded adapters,
  smaller ranks zero-padded; the lora alpha/r scaling is folded into B).
* The forward contracts x against EVERY slot and selects with a per-token
  one-hot of the request's slot index: two einsums per projection, no
  gather, no ragged dispatch, MXU-shaped.  Tokens with no adapter carry
  index -1 -> an all-zero one-hot -> exact base-model output.
* Adapter weights target the MERGED projections (qkv / o / gate_up /
  down): q/k/v (and gate/up) A-B pairs from the PEFT checkpoint are
  placed into the merged output layout; modules an adapter does not
  adapt stay zero.

PEFT weight schema handled:
    base_model.model.model.layers.{l}.self_attn.{q,k,v,o}_proj.lora_{A,B}.weight
    base_model.model.model.layers.{l}.mlp.{gate,up,down}_proj.lora_{A,B}.weight
    (the `base_model.model.` prefix and `.default` infix are optional)
with scaling = lora_alpha / r from adapter_config.json.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import re
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# merged projection -> (hf module names, their offsets in the merged N dim)
_TARGETS = {
    "qkv": ["q_proj", "k_proj", "v_proj"],
    "o": ["o_proj"],
    "gate_up": ["gate_proj", "up_proj"],
    "down": ["down_proj"],
}


def _norm_key(k: str) -> str:
    k = re.sub(r"^base_model\.model\.", "", k)
    k = re.sub(r"^model\.", "", k)
    k = k.replace(".default.weight", ".weight")
    return k


def load_peft_adapter(path: str) -> Tuple[dict, Dict[str, np.ndarray]]:
    """-> (adapter_config dict, normalized tensor dict)."""
    with open(os.path.join(path, "adapter_config.json")) as f:
        cfg = json.load(f)
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if files:
        from safetensors import safe_open

        for fn in files:
            with safe_open(fn, framework="np") as sf:
                for name in sf.keys():
                    tensors[_norm_key(name)] = sf.get_tensor(name)
    else:  # .bin fallback
        import torch

        for fn in glob.glob(os.path.join(path, "*.bin")):
            sd = torch.load(fn, map_location="cpu", weights_only=True)
            for name, v in sd.items():
                tensors[_norm_key(name)] = v.float().numpy()
    return cfg, tensors


class LoraManager:
    """Stacked adapter pool + name -> slot registry."""

    def __init__(self, model, max_loras: int, max_rank: int = 32):
        self.model = model
        self.max_loras = max_loras
        # FIXED pool rank: array shapes never change across load/unload, so
        # no executable ever recompiles (adapters above max_rank rejected)
        self.max_rank = max_rank
        self.registry: Dict[str, int] = {}
        c = model.config
        L, H = c.num_layers, c.hidden_size
        self._adapters: List[Optional[dict]] = [None] * max_loras
        self.pool: Dict[str, Dict[str, jnp.ndarray]] = {}
        # GLOBAL geometry: pool arrays are global like the base weights;
        # NamedSharding splits them over the model axis (lora_pspecs)
        tp = model.tp_size
        if tp > 1:
            assert c.num_kv_heads % tp == 0, (
                "LoRA + tp > kv heads (replicated-KV shards) not supported")
        qh_g = model.qh * tp
        kvh_g = model.kvh * tp
        D = model.head_dim
        I = c.intermediate_size
        self._geometry = {
            "qkv": (H, (qh_g + 2 * kvh_g) * D),
            "o": (qh_g * D, H),
            "gate_up": (H, 2 * I),
            "down": (I, H),
        }
        self._module_offsets = {
            "qkv": {
                "q_proj": (0, qh_g * D),
                "k_proj": (qh_g * D, kvh_g * D),
                "v_proj": ((qh_g + kvh_g) * D, kvh_g * D),
            },
            "o": {"o_proj": (0, H)},
            "gate_up": {
                "gate_proj": (0, I),
                "up_proj": (I, I),
            },
            "down": {"down_proj": (0, H)},
        }
        # column-parallel merged layouts are SHARD-MAJOR interleaved
        # (loader interleave_concat): B columns must permute the same way
        self._col_spans = {
            "qkv": [qh_g * D, kvh_g * D, kvh_g * D],
            "gate_up": [I, I],
        }
        self._rebuild()

    def _interleave_cols(self, B: np.ndarray, spans) -> np.ndarray:
        tp = self.model.tp_size
        if tp == 1:
            return B
        parts = np.split(B, np.cumsum(spans)[:-1], axis=-1)
        chunks = []
        for s in range(tp):
            for p, w in zip(parts, spans):
                n = w // tp
                chunks.append(p[..., s * n : (s + 1) * n])
        return np.concatenate(chunks, axis=-1)

    # ------------------------------------------------------------------

    def load_adapter(self, name: str, path: str) -> int:
        """Register + load an adapter into a free slot -> slot index."""
        if name in self.registry:
            return self.registry[name]
        try:
            slot = self._adapters.index(None)
        except ValueError:
            raise RuntimeError(
                f"all {self.max_loras} LoRA slots in use "
                f"(--max-loras-per-batch)"
            )
        cfg, tensors = load_peft_adapter(path)
        r = int(cfg.get("r", 8))
        if r > self.max_rank:
            raise ValueError(
                f"adapter {name!r} rank {r} > --max-lora-rank {self.max_rank}"
            )
        scaling = float(cfg.get("lora_alpha", r)) / r
        self._adapters[slot] = {"name": name, "tensors": tensors,
                                "rank": r, "scaling": scaling}
        self.registry[name] = slot
        self._rebuild()
        logger.info("loaded LoRA %r (rank %d) into slot %d", name, r, slot)
        return slot

    def unload_adapter(self, name: str):
        slot = self.registry.pop(name)
        self._adapters[slot] = None
        self._rebuild()

    def slot_of(self, name: Optional[str]) -> int:
        if not name:
            return -1
        if name not in self.registry:
            raise KeyError(f"unknown LoRA adapter {name!r}")
        return self.registry[name]

    # ------------------------------------------------------------------

    def _rebuild(self):
        """Re-stack every slot into the pool arrays (rank growth or
        load/unload).  Cheap: adapters are MBs, not GBs."""
        L = self.model.config.num_layers
        R = self.max_rank
        S = self.max_loras
        pool = {}
        for tgt, (K, N) in self._geometry.items():
            A = np.zeros((S, L, K, R), np.float32)
            B = np.zeros((S, L, R, N), np.float32)
            for s, ad in enumerate(self._adapters):
                if ad is None:
                    continue
                r, sc = ad["rank"], ad["scaling"]
                for mod, (off, width) in self._module_offsets[tgt].items():
                    for l in range(L):
                        ka = f"layers.{l}.self_attn.{mod}.lora_A.weight"
                        kb = f"layers.{l}.self_attn.{mod}.lora_B.weight"
                        if mod in ("gate_proj", "up_proj", "down_proj"):
                            ka = f"layers.{l}.mlp.{mod}.lora_A.weight"
                            kb = f"layers.{l}.mlp.{mod}.lora_B.weight"
                        if ka not in ad["tensors"]:
                            continue
                        a = ad["tensors"][ka]  # [r, K] torch layout
                        b = ad["tensors"][kb]  # [width, r]
                        A[s, l, :, :r] = a.T
                        B[s, l, :r, off : off + width] = b.T * sc
            if tgt in self._col_spans:
                B = self._interleave_cols(B, self._col_spans[tgt])
            pool[tgt] = {
                "A": jnp.asarray(A, jnp.bfloat16),
                "B": jnp.asarray(B, jnp.bfloat16),
            }
        self.pool = pool

    def as_params(self) -> Dict[str, Dict[str, jnp.ndarray]]:
        return self.pool
