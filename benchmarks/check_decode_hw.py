"""Hardware correctness check: ragged_decode (Pallas) vs the XLA oracle.

Runs the geometries the engine actually uses (decode QS=1, spec-verify
QS>1, SWA window, GQA and MHA head layouts, MLA-style KVH=1) on the real
TPU and compares against ragged_decode_xla.

Usage: python benchmarks/check_decode_hw.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.ops.ragged_attention import ragged_decode, ragged_decode_xla


def check(name, B, ctx, ps, QH, KVH, D, QS=1, window=0, softcap=0.0,
          varlen=True, sinks=False, split=None):
    pages_per_seq = (ctx + ps - 1) // ps
    P = B * pages_per_seq + 8
    L = 2
    Xr = KVH * D
    if split is None:
        split = KVH % 2 == 0  # engine default: split layout for KVH >= 2
    key = jax.random.PRNGKey(0)

    @jax.jit
    def mk(key):
        kq, kk = jax.random.split(key)
        shape = (L, P, 2, ps, 2, Xr // 2) if split else (L, P, ps, 2, Xr)
        kv = jax.random.normal(kk, shape, jnp.bfloat16) * 0.3
        q = jax.random.normal(kq, (B, QS, QH, D), jnp.bfloat16) * 0.3
        return kv, q

    kv, q = mk(key)
    rng = np.random.default_rng(0)
    pt = rng.permutation(B * pages_per_seq).reshape(B, pages_per_seq).astype(
        np.int32
    )
    if varlen:
        lengths = rng.integers(QS, ctx + 1, B).astype(np.int32)
        lengths[::7] = 0  # padded rows
        lengths[0] = ctx
    else:
        lengths = np.full(B, ctx, np.int32)
    args = (q, kv, jnp.asarray(pt), jnp.asarray(lengths), 1)
    kw = dict(sm_scale=1.0 / np.sqrt(D), window=window, softcap=softcap)
    if sinks:
        kw["sinks"] = jnp.asarray(
            np.random.default_rng(5).normal(size=(QH,)) * 2.0, jnp.float32
        )
    got = np.asarray(ragged_decode(*args, interpret=False, **kw))
    want = np.asarray(ragged_decode_xla(*args, **kw))
    live = lengths > 0
    err = np.abs(got[live] - want[live]).max() if live.any() else 0.0
    ok = err < 2e-2
    print(f"{name:34s} maxerr {err:.4f} {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    ok = True
    ok &= check("decode gqa bs64 ctx512", 64, 512, 64, 32, 8, 128)
    ok &= check("decode gqa uneven ctx", 64, 511, 64, 32, 8, 128)
    ok &= check("decode mha bs16", 16, 256, 64, 32, 32, 128)
    ok &= check("decode kvh4 g2", 8, 192, 64, 8, 4, 128)
    ok &= check("spec verify qs4", 32, 384, 64, 32, 8, 128, QS=4)
    ok &= check("swa window 128", 32, 512, 64, 32, 8, 128, window=128)
    ok &= check("softcap 50", 16, 256, 64, 32, 8, 128, softcap=50.0)
    ok &= check("mla kvh1 d640", 16, 256, 64, 16, 1, 640)
    ok &= check("sinks gqa", 32, 384, 64, 32, 8, 128, sinks=True)
    ok &= check("sinks + swa (gpt-oss)", 32, 384, 64, 32, 8, 128,
                window=128, sinks=True)
    ok &= check("partial tail chunk ctx=530", 64, 530, 64, 32, 8, 128,
                varlen=False)
    ok &= check("combined-layout gqa", 32, 384, 64, 32, 8, 128, split=False)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
