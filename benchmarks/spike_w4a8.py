"""Spike: W4A8 pair8 kernel — int8 activations, int8 MXU dots.

Hypothesis (from bench_awq M-scaling): the bf16 pair kernel is DMA-bound at
M=8 (860 GB/s) but compute-bound at M=64 (611) — the VPU unpack (1.5 ops/
weight) and bf16 MXU rate cap it.  W4A8: activations quantize per-row to
int8 (exact-scale), weights unpack nibble->int8 with TWO extractions
(0.37 ops/weight), dots run at the MXU's 2x int8 rate.

pair8 layout: byte[j] = nib(row j) | nib(row j + PB/2) << 4, so
(x32 & 0x0F0F0F0F) and ((x32 >> 4) & 0x0F0F0F0F) bitcast to int8 give the
two contiguous half-blocks.

Usage: python benchmarks/spike_w4a8.py [--m 64]
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

SHAPES = {
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 28672),
    "down": (14336, 4096),
}


def pack_pair8(w_nib: np.ndarray, pb: int) -> np.ndarray:
    """[K, N] nibbles -> [K/2, N] bytes, rows j / j+PB/2 per superblock."""
    K, N = w_nib.shape
    out = np.zeros((K // 2, N), np.uint8)
    for t in range(K // pb):
        blk = w_nib[t * pb : (t + 1) * pb]
        lo, hi = blk[: pb // 2], blk[pb // 2 :]
        out[t * pb // 2 : (t + 1) * pb // 2] = (
            lo.astype(np.uint8) | (hi.astype(np.uint8) << 4)
        )
    return out


def kernel(xq_ref, sx_ref, qw_ref, s_ref, z_ref, o_ref, acc_ref,
           *, pb, G, k_tiles):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]  # [M, PB] int8
    x32 = pltpu.bitcast(qw_ref[:], jnp.int32)  # [PB/8, BN]
    w0 = pltpu.bitcast(x32 & 0x0F0F0F0F, jnp.int8)          # rows [0, PB/2)
    w1 = pltpu.bitcast((x32 >> 4) & 0x0F0F0F0F, jnp.int8)   # rows [PB/2, PB)
    half = pb // 2
    gpp = pb // G  # groups per superblock
    total = None
    for g in range(gpp):
        r0 = g * G
        if r0 < half:
            wb = w0[r0 : r0 + G, :]
        else:
            wb = w1[r0 - half : r0 - half + G, :]
        xg = xq[:, r0 : r0 + G]
        dot = jax.lax.dot_general(
            xg, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [M, BN] i32
        xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)  # [M,1]
        term = (dot.astype(jnp.float32) * s_ref[g : g + 1, :]
                - xsum.astype(jnp.float32) * z_ref[g : g + 1, :])
        total = term if total is None else total + term
    acc_ref[:] += total * sx_ref[:].reshape(-1, 1)

    @pl.when(k == k_tiles - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pb", "G", "bn", "interpret"))
def w4a8_matmul(x, qw, s_strip, z_strip, *, pb, G, bn, interpret=False):
    M, K = x.shape
    _, N = qw.shape
    kt = K // pb
    gpp = pb // G
    # per-row int8 quantization (exact scale recovery)
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    sx = (ax / 127.0 + 1e-30)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127).astype(jnp.int8)

    Mp = (M + 31) // 32 * 32  # int8 sublane tile: 32
    if Mp != M:
        xq = jnp.pad(xq, ((0, Mp - M), (0, 0)))
        sx = jnp.pad(sx, ((0, Mp - M), (0, 0)))

    grid = (1, N // bn, kt)
    out = pl.pallas_call(
        functools.partial(kernel, pb=pb, G=G, k_tiles=kt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Mp, pb), lambda m, n, k: (m, k)),
            pl.BlockSpec((Mp, 1), lambda m, n, k: (m, 0)),
            pl.BlockSpec((pb // 2, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((gpp, bn), lambda m, n, k: (k, n)),
            pl.BlockSpec((gpp, bn), lambda m, n, k: (k, n)),
        ],
        out_specs=pl.BlockSpec((Mp, bn), lambda m, n, k: (m, n)),
        out_shape=jax.ShapeDtypeStruct((Mp, N), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((Mp, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xq, sx, qw, s_strip, z_strip)
    return out[:M]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--g", type=int, default=128)
    ap.add_argument("--bn", type=int, default=2048)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--iters", type=int, nargs=2, default=[16, 128])
    args = ap.parse_args()
    M, G = args.m, args.g
    rng = np.random.default_rng(0)

    for name, (K, N) in SHAPES.items():
        pb = 2048 if K % 2048 == 0 and K // 2048 >= 4 else 1024
        gpp = pb // G
        kt = K // pb
        w_nib = rng.integers(0, 16, (K, N)).astype(np.int32)
        z_nib = rng.integers(0, 16, (K // G, N)).astype(np.float32)
        sc = (rng.standard_normal((K // G, N)) * 0.02).astype(np.float32)
        qw = pack_pair8(w_nib, pb)
        # strips: [kt*gpp, N] grouped per k-tile
        s_strip = sc.reshape(kt, gpp, N).reshape(kt * gpp, N)
        z_strip = (z_nib * sc).reshape(kt * gpp, N)
        x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)

        if args.check:
            W = (w_nib - z_nib.repeat(G, 0)) * sc.repeat(G, 0)
            y = np.asarray(w4a8_matmul(
                x, jnp.asarray(qw), jnp.asarray(s_strip), jnp.asarray(z_strip),
                pb=pb, G=G, bn=min(args.bn, N)))
            ref = np.asarray(x, np.float32) @ W
            rel = np.abs(y.astype(np.float32) - ref).max() / (np.abs(ref).max() + 1e-9)
            print(f"{name:8s} relerr {rel:.4f}", flush=True)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x0, qw, s_strip, z_strip, *, iters, K=K, N=N, pb=pb):
            def body(i, xc):
                y = w4a8_matmul(xc, qw, s_strip, z_strip, pb=pb, G=G,
                                bn=min(args.bn, N))
                f = jnp.tanh(y[:, :K] if N >= K else
                             jnp.pad(y, ((0, 0), (0, K - N))))
                return (xc + f * jnp.asarray(1e-3, xc.dtype)).astype(xc.dtype)
            return jax.lax.fori_loop(0, iters, body, x0)[:8, :128]

        try:
            sec = bench_loop_fn(
                lambda x0, a, b, c, iters: loop(x0, a, b, c, iters=iters),
                x, jnp.asarray(qw), jnp.asarray(s_strip), jnp.asarray(z_strip),
                iters_pair=tuple(args.iters))
            gbs = (K * N / 2) / sec / 1e9
            print(f"{name:8s} pair8-a8 pb={pb:5d} {sec*1e6:8.1f} us "
                  f"{gbs:6.0f} GB/s packed", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED {repr(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
