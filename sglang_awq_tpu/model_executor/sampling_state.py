"""Device-resident per-request sampling state (round 2 overlap scheduling).

Role model: the reference's overlap-mode FutureMap + penaltylib orchestrator
(`python/sglang/srt/managers/overlap_utils.py:32` — sampled ids stay on
device and resolve into the next batch's input_ids;
`sampling/penaltylib/orchestrator.py` — penalty accumulators live on the
device and are updated by `cumulate_output_tokens` each step).

TPU re-design: one fixed-capacity row table on the device.  Each running
request owns a row for its lifetime:

  last_ids   [cap + 1] int32 — the request's most recent token.  Decode
             steps read their input token from here (device-to-device) and
             write the newly sampled one back, so the host never has to see
             token N before dispatching step N+1.
  out_counts [cap + 1, V] int32 — output-token counts backing
             frequency/presence/repetition penalties.  Updated in-step by a
             scatter-add of the sampled id; the O(B*V) host-side rebuild
             that round 1 shipped every step is gone.

Row `cap` is a trash row: padded batch slots point at it so in-step updates
need no masking.  `out_counts` is allocated lazily on the first step that
needs penalties (16 MB at cap=128, V=128k).

All mutation is functional-with-donation: step functions take the arrays as
donated args and return the updated ones; the small helpers here do the
same for host-initiated corrections (prefill seeding, retraction resume).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, donate_argnums=(0,))
def _set_rows_1d(arr: jax.Array, rows: jax.Array, vals: jax.Array) -> jax.Array:
    return arr.at[rows].set(vals, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def _zero_rows_2d(arr: jax.Array, rows: jax.Array) -> jax.Array:
    z = jnp.zeros((rows.shape[0], arr.shape[1]), arr.dtype)
    return arr.at[rows, :].set(z, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0,))
def _add_tokens_2d(arr: jax.Array, rows: jax.Array, tokens: jax.Array) -> jax.Array:
    """Scatter-add 1 at (rows[i], tokens[i][j]) for every valid j."""
    r = jnp.repeat(rows, tokens.shape[1])
    t = tokens.reshape(-1)
    valid = (t >= 0) & (t < arr.shape[1])
    r = jnp.where(valid, r, arr.shape[0])  # invalid -> dropped
    return arr.at[r, t].add(1, mode="drop")


class DeviceSamplingState:
    """Host-side handle for the device row table (allocation + row pool)."""

    def __init__(self, capacity: int, vocab_size: int):
        self.capacity = capacity
        self.vocab_size = vocab_size
        self.trash_row = capacity
        self.last_ids = jnp.zeros(capacity + 1, jnp.int32)
        self.out_counts: Optional[jax.Array] = None  # lazy [cap+1, V]
        self._free = list(range(capacity - 1, -1, -1))

    # -- row pool ----------------------------------------------------------
    def acquire_row(self) -> int:
        return self._free.pop()

    def release_row(self, row: int) -> None:
        self._free.append(row)

    def available(self) -> int:
        return len(self._free)

    def reset_rows(self) -> None:
        """Reclaim every row (failure recovery: all requests dropped)."""
        self._free = list(range(self.capacity - 1, -1, -1))

    # -- device updates ----------------------------------------------------
    def ensure_counts(self) -> jax.Array:
        if self.out_counts is None:
            self.out_counts = jnp.zeros(
                (self.capacity + 1, self.vocab_size), jnp.int32
            )
        return self.out_counts

    def seed_rows(self, rows: np.ndarray, last_tokens: np.ndarray) -> None:
        """Set last_ids for freshly admitted / corrected rows."""
        self.last_ids = _set_rows_1d(
            self.last_ids, jnp.asarray(rows, jnp.int32),
            jnp.asarray(last_tokens, jnp.int32),
        )

    def reset_counts(self, rows: np.ndarray) -> None:
        """Zero penalty counts for rows being (re)assigned."""
        if self.out_counts is not None and len(rows):
            self.out_counts = _zero_rows_2d(
                self.out_counts, jnp.asarray(rows, jnp.int32)
            )

    def upload_counts(self, row: int, token_ids) -> None:
        """Rebuild one row's counts from host history (retraction resume)."""
        self.ensure_counts()
        ids = np.asarray(token_ids, np.int32).reshape(1, -1)
        if ids.size == 0:
            return
        self.out_counts = _add_tokens_2d(
            self.out_counts, jnp.asarray([row], jnp.int32), jnp.asarray(ids)
        )
