"""Multi-host scaffolding.

Role model: reference multi-node launch (`--nnodes/--node-rank/
--dist-init-addr`, engine.py:116-137 — rank 0 serves HTTP, other ranks run
workers).  JAX translation (SURVEY.md §2.6/§A.8): same binary on every host,
`jax.distributed.initialize`, one global mesh; batch metadata is broadcast
host0 -> all so every host issues identical jit calls (SPMD lockstep — any
divergence deadlocks the collectives).

STATUS: scaffolding — single-host TP is tested (virtual mesh + one real
chip); multi-host lockstep serving needs real pod hardware to validate and
is wired for round 2+.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax

logger = logging.getLogger(__name__)

_INITIALIZED = False


def initialize_multihost(
    dist_init_addr: Optional[str], nnodes: int, node_rank: int
) -> bool:
    """jax.distributed bring-up; returns True when part of a multi-host job."""
    global _INITIALIZED
    if nnodes <= 1:
        return False
    if _INITIALIZED:
        return True
    jax.distributed.initialize(
        coordinator_address=dist_init_addr,
        num_processes=nnodes,
        process_id=node_rank,
    )
    _INITIALIZED = True
    logger.info(
        "multihost: process %d/%d, %d local / %d global devices",
        node_rank,
        nnodes,
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def broadcast_from_host0(tree: Any) -> Any:
    """Replicate host0's batch metadata to every host (the DCN control
    channel replacing the reference's ZMQ broadcast)."""
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def is_host0() -> bool:
    return jax.process_index() == 0
