"""Robust (pb, bn) sweep for the AWQ pair-unpack kernel.

Reports 3 independent slope estimates per config so relay-jitter outliers
are visible, plus their median.  Signal per estimate is kept >= ~10 ms of
device time by scaling the iteration counts to the shape's expected cost.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from microbench import bench_loop_fn
from sglang_awq_tpu.ops.awq_matmul import awq_matmul_raw, scale_rows_per_tile

SHAPES = {
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 28672),
    "down": (14336, 4096),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--shapes", nargs="+", default=list(SHAPES))
    ap.add_argument("--unpack", default="pair")
    ap.add_argument("--bn", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--pb", type=int, nargs="+", default=[1024, 2048])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    M, G, L = args.m, args.g, args.layers
    for name in args.shapes:
        K, N = SHAPES[name]
        bytes_packed = K * N / 2
        # aim for >= 12 ms of signal at an assumed 600 GB/s
        est_us = bytes_packed / 600e9 * 1e6
        hi = max(128, int(12_000 / est_us) // 64 * 64)
        lo = hi // 8
        for pb in args.pb:
            if K % pb or pb % 8:
                continue
            kt = K // pb
            _, sr_pad = scale_rows_per_tile(pb, G)

            @jax.jit
            def mk(key):
                kq, ks, kx = jax.random.split(key, 3)
                qw = jax.random.randint(
                    kq, (L, K // 2, N), 0, 255, jnp.int32
                ).astype(jnp.uint8)
                sc = jax.random.uniform(ks, (L, kt * sr_pad, N), jnp.float32)
                x0 = jax.random.normal(kx, (M, K), jnp.bfloat16)
                return qw, sc, x0

            qw, sc, x0 = mk(jax.random.PRNGKey(0))
            jax.block_until_ready((qw, sc, x0))

            for bn in args.bn:
                if N % min(bn, N):
                    continue

                @functools.partial(jax.jit, static_argnames=("iters",))
                def loop(x, qw, sc, *, iters):
                    def body(i, xc):
                        y = awq_matmul_raw(
                            xc, qw, sc, i % L,
                            group_size=G, pack_block=pb,
                            block_n=min(bn, N), unpack=args.unpack,
                        )
                        f = jnp.tanh(y[:, :K] if N >= K else
                                     jnp.pad(y, ((0, 0), (0, K - N))))
                        return (xc + f * jnp.asarray(1e-3, xc.dtype)).astype(
                            xc.dtype
                        )

                    return jax.lax.fori_loop(0, iters, body, x)[:8, :128]

                secs = []
                try:
                    for _ in range(args.reps):
                        secs.append(
                            bench_loop_fn(
                                lambda x, qw, sc, iters: loop(
                                    x, qw, sc, iters=iters
                                ),
                                x0, qw, sc, iters_pair=(lo, hi),
                                trials=8,
                            )
                        )
                except Exception as e:  # noqa: BLE001
                    print(f"{name:8s} pb={pb:5d} bn={bn:5d} FAILED "
                          f"{repr(e)[:100]}", flush=True)
                    continue
                gbs = [bytes_packed / s / 1e9 for s in secs]
                med = sorted(gbs)[len(gbs) // 2]
                est = " ".join(f"{g:5.0f}" for g in gbs)
                print(
                    f"{name:8s} pb={pb:5d} bn={bn:5d} iters={lo}/{hi} "
                    f"GB/s: [{est}]  median {med:5.0f}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
