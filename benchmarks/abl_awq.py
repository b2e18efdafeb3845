"""Ablation for the AWQ W4A16 kernel: DMA floor vs unpack vs dots vs scale.

Variants (WRONG results except 'full'):
  dma    - stream weight blocks, touch a row (pure-DMA floor)
  unpack - + nibble unpack to bf16 (no dots)
  dot    - + the per-group dots, accumulated UNscaled (no scale FMA)
  full   - the real body (dots + per-group scale FMA)

Usage: python benchmarks/abl_awq.py [--shapes gate_up down] [--pb 1024]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import bench_loop_fn
from sglang_awq_tpu.ops.awq_matmul import scale_rows_per_tile
from sglang_awq_tpu.utils import round_up

SHAPES = {
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 28672),
    "down": (14336, 4096),
}


def _kernel(layer_ref, x_ref, qw_ref, s_ref, o_ref, *, pack_block, group_size,
            variant):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:]
    sr, _ = scale_rows_per_tile(pack_block, group_size)

    if variant == "dma":
        o_ref[:, :128] += qw_ref[0][:1, :128].astype(jnp.int32).astype(
            jnp.float32
        )
        return
    w8 = qw_ref[0].astype(jnp.int32)
    w = jnp.concatenate([w8 & 0xF, w8 >> 4], axis=0)
    wb = w.astype(jnp.bfloat16)
    if variant == "unpack":
        o_ref[:, :128] += wb[:1, :128].astype(jnp.float32)
        return

    g = group_size
    if variant == "fused":
        # pre-scale the unpacked tile (bf16), ONE k-long dot
        s = s_ref[0, :sr, :]  # [sr, bn] f32
        srep = jnp.repeat(s, g, axis=0).astype(jnp.bfloat16)  # [PB, bn]
        ws = wb * srep
        o_ref[:] += jnp.dot(x, ws, preferred_element_type=jnp.float32)
        return
    if variant == "bigdot":
        # ONE unscaled k-long dot (wrong result; isolates dot shape cost)
        o_ref[:] += jnp.dot(x, wb, preferred_element_type=jnp.float32)
        return
    if variant == "fused2":
        # pre-scale via 3D sublane broadcast (no repeat materialization)
        bn = wb.shape[1]
        s = s_ref[0, :sr, :].astype(jnp.bfloat16)  # [sr, bn]
        ws = (wb.reshape(sr, group_size, bn) * s[:, None, :]).reshape(
            sr * group_size, bn
        )
        o_ref[:] += jnp.dot(x, ws, preferred_element_type=jnp.float32)
        return
    if variant == "batched":
        # one BATCHED dot over groups, scale in f32 epilogue (exact)
        bn = wb.shape[1]
        m = x.shape[0]
        xg = x.reshape(m, sr, group_size).transpose(1, 0, 2)  # [sr, M, G]
        wg = wb.reshape(sr, group_size, bn)  # [sr, G, bn]
        p = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [sr, M, bn]
        o_ref[:] += jnp.sum(p * s_ref[0, :sr, :][:, None, :], axis=0)
        return
    acc = o_ref[:]
    for i in range(sr):
        part = jnp.dot(
            x[:, i * g : (i + 1) * g],
            wb[i * g : (i + 1) * g, :],
            preferred_element_type=jnp.float32,
        )
        if variant == "dot":
            acc = acc + part
        else:
            acc = acc + part * s_ref[0, i : i + 1, :]
    o_ref[:] = acc


def run(name, variant, M, G, L, pb, bn, iters_pair):
    K, N = SHAPES[name]
    kt = K // pb
    _, sr_pad = scale_rows_per_tile(pb, G)
    bn = min(bn, N)

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

    bm = round_up(M, 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, N // bn, kt),
        in_specs=[
            pl.BlockSpec((bm, pb), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, pb // 2, bn), lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, bn), lambda m, n, k, lr: (lr[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
    )
    call = pl.pallas_call(
        functools.partial(_kernel, pack_block=pb, group_size=G, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, qw, sc, *, iters):
        def body(i, xc):
            y = call(jnp.reshape(i % L, (1,)).astype(jnp.int32), xc, qw, sc)
            f = jnp.tanh(y[:, :K] if N >= K else
                         jnp.pad(y, ((0, 0), (0, K - N))))
            return (xc + f * jnp.asarray(1e-3, xc.dtype)).astype(xc.dtype)

        return jax.lax.fori_loop(0, iters, body, x)[:8, :128]

    sec = bench_loop_fn(
        lambda x, qw, sc, iters: loop(x, qw, sc, iters=iters), x0, qw, sc,
        iters_pair=iters_pair,
    )
    gbs = (K * N / 2) / sec / 1e9
    print(f"{name:8s} {variant:6s} pb={pb:5d} bn={bn:5d} "
          f"{sec*1e6:8.1f} us {gbs:6.0f} GB/s packed", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--shapes", nargs="+", default=["gate_up", "down"])
    ap.add_argument("--variants", nargs="+",
                    default=["dma", "unpack", "dot", "full"])
    ap.add_argument("--pb", type=int, default=0)
    ap.add_argument("--bn", type=int, nargs="+", default=[2048])
    ap.add_argument("--iters", type=int, nargs=2, default=[64, 512])
    args = ap.parse_args()
    from sglang_awq_tpu.ops.awq_matmul import choose_pack_block

    for name in args.shapes:
        K, _ = SHAPES[name]
        pb = args.pb or choose_pack_block(K, args.g)
        for bn in args.bn:
            for v in args.variants:
                run(name, v, args.m, args.g, args.layers, pb, bn,
                    tuple(args.iters))


if __name__ == "__main__":
    main()
