"""Isolated bandwidth bench for the ragged attention kernels (v4 layout).

Measures effective KV-pool bandwidth of `ragged_decode` at the bench.py
decode geometry (defaults: B=64, ctx=512, ps=64, 8B heads).  Uses the
slope-timing recipe from microbench.py (relay-safe).

Usage: python benchmarks/bench_attention.py [--ppc 8] [--bs 64] [--ctx 512]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import functools
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from microbench import bench_loop_fn, fetch_sync
from sglang_awq_tpu.ops.ragged_attention import ragged_decode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--ps", type=int, default=64)
    ap.add_argument("--qh", type=int, default=32)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--qs", type=int, default=1)
    ap.add_argument("--ppc", type=int, nargs="+", default=[8])
    ap.add_argument("--iters", type=int, nargs=2, default=[16, 128])
    args = ap.parse_args()

    B, CTX, PS = args.bs, args.ctx, args.ps
    QH, KVH, D, QS = args.qh, args.kvh, args.d, args.qs
    X = KVH * D
    pages_per_seq = (CTX + PS - 1) // PS
    P = B * pages_per_seq + 8

    print(f"geom: B={B} ctx={CTX} ps={PS} QH={QH} KVH={KVH} D={D} QS={QS} "
          f"pool pages={P}", flush=True)

    # build everything on-device inside one jit (host alloc is pathological)
    import os
    dt = os.environ.get("SGLT_BENCH_KV", "bfloat16")
    jdt = {"bfloat16": jnp.bfloat16, "fp8_e4m3": jnp.float8_e4m3fn,
           "int8": jnp.int8}[dt]
    fck = 2 if dt == "bfloat16" else 4
    split = KVH % 2 == 0 and (X // fck) % 128 == 0

    @jax.jit
    def build():
        key = jax.random.PRNGKey(0)
        shape = (1, P, 2, PS, fck, X // fck) if split else (
            1, P, PS, 2 * fck, 2 * X // (2 * fck))
        kv = (jax.random.normal(key, shape, jnp.bfloat16) * 0.1).astype(jdt)
        q = jax.random.normal(key, (B, QS, QH, D), jnp.bfloat16)
        return kv, q

    kv, q = build()
    pt = jnp.asarray(
        np.arange(B * pages_per_seq, dtype=np.int32).reshape(B, pages_per_seq)
    )
    lengths = jnp.full((B,), CTX, jnp.int32)
    fetch_sync(jnp.sum(kv[0, 0, 0, 0, :8].astype(jnp.float32)))

    kv_bytes = B * CTX * 2 * X * 2  # K+V bf16 actually touched
    sm = 1.0 / (D ** 0.5)

    for ppc in args.ppc:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(qx, kvx, iters, _ppc=ppc):
            def body(i, qc):
                o = ragged_decode(
                    qc, kvx, pt, lengths, 0,
                    sm_scale=sm, pages_per_chunk=_ppc, interpret=False,
                )  # [B, QS, QH, D] f32
                return (qc + jnp.tanh(o).astype(jnp.bfloat16) * 1e-3).astype(
                    jnp.bfloat16
                )

            out = jax.lax.fori_loop(0, iters, body, qx)
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.time()
        sec = bench_loop_fn(
            lambda x, kvx, iters: loop(x, kvx, iters=iters),
            q, kv, iters_pair=tuple(args.iters), trials=3,
        )
        gbps = kv_bytes / sec / 1e9
        print(
            f"ppc={ppc}: {sec*1e3:.3f} ms/call  "
            f"{gbps:.0f} GB/s of KV  (wall {time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
