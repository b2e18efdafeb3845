"""Lean megakernel timing harness: decode_stack_step alone, no model/runner.

Random stacked weights built directly in the kernel's layouts; slope-timed
with a data-dependent carry (x feeds from the hidden output).  Compiles in
~1-2 min vs ~8 for the full-model loop — the ablation iteration driver.

Usage: python benchmarks/spike_stack.py [--abl noattn,nostage] [--layers 32]
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

QH, KVH, D, H, I = 32, 8, 128, 4096, 14336
G = 128  # awq group


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--ps", type=int, default=64)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--abl", default=None)
    ap.add_argument("--iters", type=int, nargs=2, default=[2, 8])
    args = ap.parse_args()
    if args.abl is not None:
        os.environ["SGLT_MEGA_ABL"] = args.abl

    from sglang_awq_tpu.ops.awq_matmul import scale_rows_per_tile
    from sglang_awq_tpu.ops.decode_stack import decode_stack_step

    L, B, CTX, PS = args.layers, args.bs, args.ctx, args.ps
    rng = np.random.default_rng(0)

    def qlin(K, N, pb):
        kt = K // pb
        _, srp = scale_rows_per_tile(pb, G)
        return (
            jnp.asarray(rng.integers(0, 255, (L, K // 2, N)), jnp.uint8),
            jnp.asarray(
                rng.standard_normal((L, kt * srp, N)) * 1e-2, jnp.float32),
            jnp.asarray(
                rng.standard_normal((L, kt * srp, N)) * 1e-2, jnp.float32),
        )

    Nqkv = (QH + 2 * KVH) * D
    qkv = qlin(H, Nqkv, 1024)
    o = qlin(QH * D, H, 1024)
    gu = qlin(H, 2 * I, 2048)
    dn = qlin(I, H, 2048)
    inw = jnp.asarray(rng.standard_normal((L, H)) * 0.02 + 1, jnp.float32)
    pow_ = jnp.asarray(rng.standard_normal((L, H)) * 0.02 + 1, jnp.float32)

    pages_per_seq = (CTX + 256) // PS
    P = B * pages_per_seq + 8
    pool = jnp.zeros((L, P, 2, PS, 2, KVH * D // 2), jnp.bfloat16)
    ptn = rng.permutation(B * pages_per_seq).reshape(B, pages_per_seq)
    pt = jnp.asarray(ptn.astype(np.int32))
    lengths = np.full(B, CTX, np.int32)
    positions = lengths - 1
    slots = (
        ptn[np.arange(B), positions // PS] * PS + positions % PS
    ).astype(np.int32)
    rope_tab = jnp.asarray(
        np.concatenate([np.cos(np.outer(np.arange(4096), 1 / 10000 ** (
            np.arange(0, D, 2) / D))), np.sin(np.outer(np.arange(4096),
            1 / 10000 ** (np.arange(0, D, 2) / D)))], -1), jnp.float32)

    kw = dict(
        pb_qkv=1024, pb_o=1024, pb_gu=2048, pb_d=2048, group_size=G,
        sm_scale=D ** -0.5, eps=1e-5, act="silu", qh=QH, kvh=KVH,
        head_dim=D,
    )

    @functools.partial(jax.jit, static_argnames=("iters",), donate_argnums=(1,))
    def loop(x0, kv, iters):
        def body(i, carry):
            x, kv = carry
            hidden, kv = decode_stack_step(
                x, kv, rope_tab,
                jnp.asarray(positions), jnp.asarray(slots), pt,
                jnp.asarray(lengths), inw, pow_, *qkv, *o, *gu, *dn, **kw,
            )
            x = (x + jnp.tanh(hidden) * jnp.asarray(1e-3, x.dtype)).astype(
                x.dtype)
            return (x, kv)

        x, kv = jax.lax.fori_loop(0, iters, body, (x0, kv))
        return jnp.sum(x.astype(jnp.float32)), kv

    x0 = jnp.asarray(rng.standard_normal((B, H)) * 0.1, jnp.bfloat16)
    import struct
    import time

    salt = struct.unpack("<I", os.urandom(4))[0] * 1e-9
    lo, hi = args.iters
    kv = pool
    t0 = time.time()
    out, kv = loop(x0, kv, iters=lo)
    np.asarray(jax.device_get(out))
    print(f"compile+{lo} iters {time.time() - t0:.1f}s", flush=True)
    meds = {}
    for it in (lo, hi):
        ts = []
        for t in range(3):
            xv = x0 + jnp.asarray(salt + 1e-3 * (t + 1), x0.dtype)
            t0 = time.perf_counter()
            out, kv = loop(xv, kv, iters=it)
            np.asarray(jax.device_get(out))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        meds[it] = ts[1]
    per = (meds[hi] - meds[lo]) / (hi - lo)
    print(
        f"abl={args.abl or ''!r}: {per * 1e3:.3f} ms/step "
        f"({B / per:.0f} tok/s-equiv layers-only)", flush=True,
    )


if __name__ == "__main__":
    main()
