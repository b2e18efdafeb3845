"""Per-shape bandwidth bench for the fused AWQ W4A16 matmul.

Measures packed-weight HBM bandwidth (the roofline currency: GB/s of the
uint8 qweight tensor) for the decode-critical Llama-3-8B shapes at M=64,
using the slope-timing recipe from microbench.py (relay-safe).

Usage:
  python benchmarks/bench_awq.py [--m 64] [--unpack cast magic] \
      [--shapes qkv o gate_up down] [--bn 2048] [--pb 0 (auto)]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from microbench import bench_loop_fn
from sglang_awq_tpu.ops.awq_matmul import (
    awq_matmul_raw,
    choose_pack_block,
    scale_rows_per_tile,
)

SHAPES = {
    # name: (K, N) per-layer Llama-3-8B (tp=1)
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 28672),
    "down": (14336, 4096),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--shapes", nargs="+", default=list(SHAPES))
    ap.add_argument("--unpack", nargs="+", default=["cast"])
    ap.add_argument("--bn", type=int, nargs="+", default=[2048])
    ap.add_argument("--pb", type=int, default=0, help="pack_block (0 = auto)")
    ap.add_argument("--iters", type=int, nargs=2, default=[8, 64])
    args = ap.parse_args()

    M, G, L = args.m, args.g, args.layers
    for name in args.shapes:
        K, N = SHAPES[name]
        pb = args.pb or choose_pack_block(K, G)
        kt = K // pb
        _, sr_pad = scale_rows_per_tile(pb, G)

        @jax.jit
        def mk(key):
            kq, ks, kx = jax.random.split(key, 3)
            qw = jax.random.randint(kq, (L, K // 2, N), 0, 255, jnp.int32).astype(
                jnp.uint8
            )
            sc = jax.random.uniform(ks, (L, kt * sr_pad, N), jnp.float32)
            x0 = jax.random.normal(kx, (M, K), jnp.bfloat16)
            return qw, sc, x0

        qw, sc, x0 = mk(jax.random.PRNGKey(0))
        jax.block_until_ready((qw, sc, x0))

        for unpack in args.unpack:
            for bn in args.bn:
                if N % min(bn, N):
                    continue

                @functools.partial(jax.jit, static_argnames=("iters",))
                def loop(x, qw, sc, *, iters):
                    def body(i, xc):
                        y = awq_matmul_raw(
                            xc, qw, sc, i % L,
                            group_size=G, pack_block=pb,
                            block_n=min(bn, N), unpack=unpack,
                        )
                        f = jnp.tanh(y[:, :K] if N >= K else
                                     jnp.pad(y, ((0, 0), (0, K - N))))
                        return (xc + f * jnp.asarray(1e-3, xc.dtype)).astype(
                            xc.dtype
                        )

                    return jax.lax.fori_loop(0, iters, body, x)[:8, :128]

                try:
                    sec = bench_loop_fn(
                        lambda x, qw, sc, iters: loop(x, qw, sc, iters=iters),
                        x0, qw, sc, iters_pair=tuple(args.iters),
                    )
                except Exception as e:  # noqa: BLE001
                    print(f"{name:8s} {unpack:5s} bn={bn:5d} pb={pb:5d} "
                          f"FAILED {repr(e)[:120]}", flush=True)
                    continue
                bytes_packed = K * N / 2
                gbs = bytes_packed / sec / 1e9
                us = sec * 1e6
                print(
                    f"{name:8s} {unpack:5s} bn={bn:5d} pb={pb:5d} "
                    f"{us:8.1f} us  {gbs:6.0f} GB/s packed",
                    flush=True,
                )


if __name__ == "__main__":
    main()
