"""EPLB: expert distribution recording + expert-parallel load balancing.

Role model: reference `python/sglang/srt/eplb/` (`expert_distribution.py`
recorder, `eplb_manager.py` rebalancing, `expert_location_updater.py`
runtime relocation) behind /start_expert_distribution_record etc.
(`http_server.py`).

TPU re-design notes:

* Recording rides `jax.experimental.io_callback` inside the jitted step —
  the router's top-k indices are reduced to a per-layer count vector [E]
  on device and streamed to a host accumulator.  Toggling the recorder
  clears the runner's jit cache so step functions retrace with (or
  without) the callback; when off, the traced computation is unchanged.
* With the dense all-expert MoE formulation (models/mixtral.py) every
  device computes every *local* expert for every token, so compute load is
  balanced BY CONSTRUCTION and EPLB relocation is a no-op for throughput.
  The recorder is still valuable for observability (hot-expert analysis),
  and `rebalance_order` + `permute_experts` implement the reference's
  relocation mechanics for a future capacity-bucketed dispatch path —
  logits are invariant under the permutation (router columns move with
  their expert blocks), which the tests pin.
"""

from __future__ import annotations

import threading
from typing import List

import numpy as np


class ExpertDistributionRecorder:
    """Host-side accumulator fed by the in-jit io_callback.

    counts[l, e] = number of (token, slot) routings of expert e at layer l
    since the last reset.  Thread-safe: the callback fires from XLA's
    runtime threads.
    """

    def __init__(self, num_layers: int, num_experts: int):
        self.counts = np.zeros((num_layers, num_experts), np.int64)
        self._lock = threading.Lock()

    def __call__(self, layer, counts) -> None:
        with self._lock:
            self.counts[int(layer)] += np.asarray(counts, np.int64)

    def snapshot(self) -> np.ndarray:
        with self._lock:
            return self.counts.copy()

    def reset(self) -> None:
        with self._lock:
            self.counts[:] = 0


def rebalance_order(counts, n_shards: int) -> List[int]:
    """Greedy LPT assignment of experts to equal-size EP shards.

    counts: per-expert load [E] (e.g. recorder.snapshot().sum(0)).
    Returns a permutation of expert ids such that shard s should own
    experts perm[s*E/n : (s+1)*E/n]; heavy experts are spread across
    shards (reference `eplb_manager.py` role, without redundancy).
    """
    counts = np.asarray(counts, np.float64)
    E = counts.shape[0]
    assert E % n_shards == 0, (E, n_shards)
    per = E // n_shards
    loads = np.zeros(n_shards)
    fill = [0] * n_shards
    slots: List[List[int]] = [[] for _ in range(n_shards)]
    for e in np.argsort(-counts, kind="stable"):
        open_shards = [s for s in range(n_shards) if fill[s] < per]
        s = min(open_shards, key=lambda s: loads[s])
        slots[s].append(int(e))
        loads[s] += counts[e]
        fill[s] += 1
    return [e for group in slots for e in group]
