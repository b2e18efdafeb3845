"""Multi-host serving: lockstep SPMD across processes.

Role model: reference multi-node launch (`--nnodes/--node-rank/
--dist-init-addr`, engine.py:116-137 — rank 0 serves HTTP, other ranks run
workers).  JAX translation (SURVEY.md §2.6/§A.8): same binary on every
host, `jax.distributed.initialize`, ONE global mesh; host0 runs the
scheduler and MIRRORS every runner step to all hosts (a two-phase
broadcast of a pickled step descriptor — the DCN control channel that
replaces the reference's ZMQ broadcast), so every process issues identical
jit calls and XLA's collectives stay in lockstep (any divergence deadlocks
them).  Workers run `worker_loop`, executing each received descriptor
against their own ModelRunner replica.

Validated by a 2-process CPU-mesh integration test
(tests/test_multihost.py); the same wiring drives real pods.
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, Optional

import jax
import numpy as np

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


# ---------------------------------------------------------------------------
# lockstep step mirroring
# ---------------------------------------------------------------------------

_ALIGN = 4096


def _broadcast_payload(payload: Optional[bytes]) -> bytes:
    """Two-phase host0 -> all broadcast of a variable-size byte string.
    Workers pass None and receive host0's bytes."""
    n = np.int32(len(payload)) if payload is not None else np.int32(0)
    n = int(broadcast_from_host0(np.asarray(n)))
    padded = (n + _ALIGN - 1) // _ALIGN * _ALIGN
    buf = np.zeros(padded, np.uint8)
    if payload is not None:
        buf[:n] = np.frombuffer(payload, np.uint8)
    buf = np.asarray(broadcast_from_host0(buf))
    return bytes(buf[:n])


# runner methods mirrored to every host (each issues jit computations).
# DEVICE-STATE mutations must all be here: under cross-host tensor
# parallelism each host computes with its own weight/KV shards, so ANY
# device-state divergence (a token fed from a stale sampling row, a KV
# write skipped) corrupts host0's collective results, not just the
# workers' discarded outputs.
MIRRORED_METHODS = frozenset(
    {
        "forward_extend_batch",
        "forward_decode",
        "forward_decode_overlap",
        "forward_decode_multi",
        "forward_spec_verify",
        "forward_embed",
        "eagle_draft_chain",
        "eagle_commit_fixup",
        "update_weights_from_disk",
    }
)
MIRRORED_STATE_METHODS = frozenset(
    {"seed_rows", "reset_counts", "upload_counts", "reset_rows"}
)

STOP = "__stop__"


class _MirroredSamplingState:
    """Proxy over DeviceSamplingState: device-array mutations broadcast."""

    def __init__(self, state):
        object.__setattr__(self, "_state", state)

    def __getattr__(self, name):
        target = getattr(self._state, name)
        if name not in MIRRORED_STATE_METHODS or not callable(target):
            return target

        def mirrored(*args, **kwargs):
            _broadcast_payload(
                pickle.dumps(("sampling_state." + name, args, kwargs))
            )
            return target(*args, **kwargs)

        return mirrored

    def __setattr__(self, name, value):
        setattr(self._state, name, value)


class MirroredRunner:
    """host0-side proxy: broadcasts (method, args, kwargs) before running
    the step locally, keeping all workers in lockstep."""

    def __init__(self, runner):
        self._runner = runner
        self._mirrored_state = _MirroredSamplingState(runner.sampling_state)

    def __getattr__(self, name):
        if name == "sampling_state":
            return self._mirrored_state
        target = getattr(self._runner, name)
        if name not in MIRRORED_METHODS or not callable(target):
            return target

        def mirrored(*args, **kwargs):
            _broadcast_payload(pickle.dumps((name, args, kwargs)))
            return target(*args, **kwargs)

        return mirrored

    def stop_workers(self):
        _broadcast_payload(pickle.dumps((STOP, (), {})))


def worker_loop(runner) -> None:
    """Non-host0 event loop: execute mirrored steps until STOP.

    Results are computed (keeping device state — KV pool, sampling rows —
    identical to host0's) and dropped; only host0 talks to clients."""
    logger.info("multihost worker %d: entering lockstep loop", jax.process_index())
    while True:
        name, args, kwargs = pickle.loads(_broadcast_payload(None))
        if name == STOP:
            logger.info("multihost worker: stop")
            return
        try:
            obj = runner
            if name.startswith("sampling_state."):
                obj = runner.sampling_state
                name = name.split(".", 1)[1]
            getattr(obj, name)(*args, **kwargs)
        except Exception:
            logger.exception("worker step %s failed — lockstep broken", name)
            raise
