"""Spike: where does the pair-unpack AWQ GEMV lose time?

Variants (same DMA traffic, different compute structure):
  full    — the production pair kernel (per-group dots + f32 scale epilogue)
  nodot   — unpack only, accumulate wb sums (VPU+DMA, no MXU)
  onedot  — one dot per pass, single scale (wrong semantics, MXU+DMA floor)
  wscale  — scales multiplied into wb (bf16), one dot per pass
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import bench_loop_fn
from sglang_awq_tpu.ops.awq_matmul import scale_rows_per_tile

SHAPES = {
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 28672),
    "down": (14336, 4096),
}


def make_kernel(variant, pack_block, group_size):
    def kernel(layer_ref, x_ref, qw_ref, s_ref, o_ref):
        k = pl.program_id(2)

        @pl.when(k == 0)
        def _init():
            o_ref[:] = jnp.zeros_like(o_ref)

        x = x_ref[:]
        x32 = None if variant == "harness" else pltpu.bitcast(qw_ref[0], jnp.int32)
        q4 = pack_block // 4
        acc = [o_ref[:], None]
        for i in range(4):
            if variant != "harness":
                y = (x32 >> (4 * i)) if i else x32
                y = (y & 0x000F000F) | 0x43004300
                wb = pltpu.bitcast(y, jnp.bfloat16)  # [PB/4, BN]
            gpp = max(1, q4 // group_size)
            if variant == "dmaonly":
                # block is DMA'd in full by the BlockSpec; touch one row so
                # nothing is dead, no unpack, no dots
                term = jnp.broadcast_to(
                    x32[:1, :].astype(jnp.float32), o_ref.shape
                ) + x[:, :1]
                acc[i % 2] = term if acc[i % 2] is None else acc[i % 2] + term
            elif variant == "harness":
                term = jnp.broadcast_to(x[:, i : i + 1], o_ref.shape)
                acc[i % 2] = term if acc[i % 2] is None else acc[i % 2] + term
            elif variant == "nodot":
                term = jnp.sum(wb.astype(jnp.float32), axis=0, keepdims=True) * x[:, :1]
                acc[i % 2] = term if acc[i % 2] is None else acc[i % 2] + term
            elif variant == "onedot":
                part = jnp.dot(x[:, i * q4 : (i + 1) * q4], wb,
                               preferred_element_type=jnp.float32)
                term = part * s_ref[0, i : i + 1, :]
                acc[i % 2] = term if acc[i % 2] is None else acc[i % 2] + term
            elif variant == "wscale":
                sc = s_ref[0, i * gpp : (i + 1) * gpp, :]  # [gpp, BN]
                scb = jnp.repeat(sc, group_size, axis=0).astype(jnp.bfloat16)
                part = jnp.dot(x[:, i * q4 : (i + 1) * q4], wb * scb,
                               preferred_element_type=jnp.float32)
                acc[i % 2] = part if acc[i % 2] is None else acc[i % 2] + part
            else:  # full
                for g in range(gpp):
                    part = jnp.dot(
                        x[:, i * q4 + g * group_size : i * q4 + (g + 1) * group_size],
                        wb[g * group_size : (g + 1) * group_size, :],
                        preferred_element_type=jnp.float32,
                    )
                    term = part * s_ref[0, i * gpp + g : i * gpp + g + 1, :]
                    j = (i * gpp + g) % 2
                    acc[j] = term if acc[j] is None else acc[j] + term
        o_ref[:] = acc[0] if acc[1] is None else acc[0] + acc[1]

    return kernel


def build(variant, M, K, N, G, pb, bn, L):
    kt = K // pb
    _, sr_pad = scale_rows_per_tile(pb, G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, N // bn, kt),
        in_specs=[
            pl.BlockSpec((M, pb), lambda m, n, k, lr: (m, k)),
            (
                pl.BlockSpec((1, 8, 128), lambda m, n, k, lr: (lr[0], 0, 0))
                if variant == "harness"
                else pl.BlockSpec((1, pb // 2, bn), lambda m, n, k, lr: (lr[0], k, n))
            ),
            pl.BlockSpec((1, sr_pad, bn), lambda m, n, k, lr: (lr[0], k, n)),
        ],
        out_specs=pl.BlockSpec((M, bn), lambda m, n, k, lr: (m, n)),
    )

    f = pl.pallas_call(
        make_kernel(variant, pb, G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * K * N,
            bytes_accessed=K * N // 2 + M * K * 2 + M * N * 4,
            transcendentals=0,
        ),
    )
    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--shapes", nargs="+", default=["o"])
    ap.add_argument("--variants", nargs="+",
                    default=["full", "onedot", "wscale", "nodot"])
    ap.add_argument("--bn", type=int, nargs="+", default=[1024])
    ap.add_argument("--pb", type=int, nargs="+", default=[2048])
    args = ap.parse_args()
    M, G, L = args.m, args.g, args.layers

    for name in args.shapes:
        K, N = SHAPES[name]
        bytes_packed = K * N / 2
        est_us = bytes_packed / 600e9 * 1e6
        hi = max(128, int(12_000 / est_us) // 64 * 64)
        lo = hi // 8
        for pb in args.pb:
            if K % pb:
                continue
            kt = K // pb
            _, sr_pad = scale_rows_per_tile(pb, G)

            @jax.jit
            def mk(key):
                kq, ks, kx = jax.random.split(key, 3)
                qw = jax.random.randint(kq, (L, K // 2, N), 0, 255,
                                        jnp.int32).astype(jnp.uint8)
                sc = jax.random.uniform(ks, (L, kt * sr_pad, N), jnp.float32)
                x0 = jax.random.normal(kx, (M, K), jnp.bfloat16)
                return qw, sc, x0

            qw, sc, x0 = mk(jax.random.PRNGKey(0))
            jax.block_until_ready((qw, sc, x0))

            for bn in args.bn:
                for variant in args.variants:
                    fn = build(variant, M, K, N, G, pb, bn, L)

                    @functools.partial(jax.jit, static_argnames=("iters",))
                    def loop(x, qw, sc, *, iters):
                        def body(i, xc):
                            y = fn(jnp.asarray([i % L], jnp.int32).reshape(1),
                                   xc, qw, sc)
                            f2 = jnp.tanh(y[:, :K] if N >= K else
                                          jnp.pad(y, ((0, 0), (0, K - N))))
                            return (xc + f2 * jnp.asarray(1e-3, xc.dtype)
                                    ).astype(xc.dtype)

                        return jax.lax.fori_loop(0, iters, body, x)[:8, :128]

                    try:
                        sec = bench_loop_fn(
                            lambda x, qw, sc, iters: loop(x, qw, sc,
                                                          iters=iters),
                            x0, qw, sc, iters_pair=(lo, hi), trials=8,
                        )
                    except Exception as e:  # noqa: BLE001
                        print(f"{name:8s} {variant:7s} pb={pb} bn={bn} "
                              f"FAILED {repr(e)[:90]}", flush=True)
                        continue
                    gbs = bytes_packed / sec / 1e9
                    print(f"{name:8s} {variant:7s} pb={pb:5d} bn={bn:5d} "
                          f"{sec*1e6:7.1f} us {gbs:5.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
