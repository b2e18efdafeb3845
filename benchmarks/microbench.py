"""Micro-benchmark helpers for high-latency device tunnels.

Empirically determined properties of the benched device path (axon relay):
  * per-dispatch round trip ~45-50 ms
  * `block_until_ready()` does NOT reliably wait for device completion —
    only fetching result bytes (device_get) synchronizes
  * identical repeated dispatches may be served from a cache

Reliable recipe (validated against a known-bandwidth 2 GB reduce -> ~700 GB/s
measured vs ~820 GB/s spec):
  1. run the op in an on-device `fori_loop` with a data-dependent carry
     (so XLA cannot hoist, simplify, or parallelize iterations),
  2. vary the input on every timed call (defeat relay caching),
  3. synchronize by FETCHING the (small) result,
  4. report the SLOPE between two loop trip counts (cancels the fixed
     round-trip latency), min over trials.
"""

from __future__ import annotations

import functools
import os
import struct
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fetch_sync(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def bench_loop_fn(
    make_loop: Callable[..., jax.Array],
    x0: jax.Array,
    *consts,
    iters_pair: Tuple[int, int] = (4, 32),
    trials: int = 3,
) -> float:
    """Seconds per iteration of the loop body.

    `make_loop(x, *consts, iters=n)` must run its body n times with a data
    dependence chained through the carry and return a SMALL array.
    """
    lo, hi = iters_pair
    # process-unique jitter: repeated runs of the same bench script would
    # otherwise re-issue byte-identical dispatches, which the relay serves
    # from a cache (observed: "1637 GB/s" decode attention)
    salt = struct.unpack("<I", os.urandom(4))[0] * 1e-12
    meds = {}
    for it in (lo, hi):
        fetch_sync(make_loop(x0 + jnp.asarray(salt, x0.dtype), *consts, iters=it))
        ts = []
        for t in range(trials):
            xv = x0 + jnp.asarray(salt + 1e-3 * (t + 1), x0.dtype)
            t0 = time.perf_counter()
            fetch_sync(make_loop(xv, *consts, iters=it))
            ts.append(time.perf_counter() - t0)
        # MEDIAN, not min: the relay occasionally serves an anomalously fast
        # (cached) or slow round trip; min at one endpoint only produced
        # negative slopes.  Callers should size hi so the body span is
        # >= ~100 ms (fori_loop compile time does not grow with trip count).
        ts.sort()
        meds[it] = ts[len(ts) // 2]
    return (meds[hi] - meds[lo]) / (hi - lo)


def bench_matmul_like(f, x0: jax.Array, *consts, iters_pair=(4, 32), trials=3) -> float:
    """Benchmark y = f(x, i, *consts) where y[:, :K]-shaped feedback is valid.

    f returns an array whose leading dims allow `tanh(y[..., :K])` feedback
    into x.  The index i lets the caller rotate through stacked weights.
    """
    K = x0.shape[-1]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, *consts, iters):
        def body(i, xc):
            y = f(xc, i, *consts)
            return (xc + jnp.tanh(y[..., :K]) * jnp.asarray(1e-3, x.dtype)).astype(
                x.dtype
            )

        out = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(out.astype(jnp.float32))

    return bench_loop_fn(loop, x0, *consts, iters_pair=iters_pair, trials=trials)
