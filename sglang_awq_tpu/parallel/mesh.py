"""Device mesh construction.

Role model: reference `initialize_model_parallel`
(`python/sglang/srt/distributed/parallel_state.py:1550` — TP/PP/EP group
construction over NCCL).  TPU-native: one `jax.sharding.Mesh` with named
axes; XLA emits the collectives (SURVEY.md §2.6 "TPU-native equivalent").

Axis names:
    "data"  — data parallel (batch replicas; DCN-friendly)
    "stage" — pipeline parallel (layer ranges; batch rotates via ppermute)
    "model" — tensor parallel (weights/KV-heads; rides ICI)
Expert parallel rides the "model" axis (expert-merged matmul dims —
models/mixtral.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
STAGE_AXIS = "stage"
MODEL_AXIS = "model"


def make_mesh(
    dp_size: int = 1, tp_size: int = 1, pp_size: int = 1, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = dp_size * pp_size * tp_size
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(dp_size, pp_size, tp_size)
    return Mesh(arr, (DATA_AXIS, STAGE_AXIS, MODEL_AXIS))
