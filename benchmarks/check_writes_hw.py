"""Hardware correctness check: KV write kernels (Pallas) vs expected.

Covers split + combined layouts, token scatter (decode/spec) and
whole-page prefill writes, including skipped PAD_SLOT entries, on the
real TPU.

Usage: python benchmarks/check_writes_hw.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT, write_kv


def expected_write(kv, kf, vf, slots, layer, ps):
    kv = np.array(kv, copy=True)
    for i, s in enumerate(np.asarray(slots)):
        if s < 0 or s >= kv.shape[1] * ps:
            continue
        if kv.ndim == 6:
            kv[layer, s // ps, 0, s % ps] = kf[i]
            kv[layer, s // ps, 1, s % ps] = vf[i]
        else:
            kv[layer, s // ps, s % ps] = np.concatenate(
                [kf[i].reshape(1, -1), vf[i].reshape(1, -1)], axis=0
            ).reshape(kv.shape[3], kv.shape[4])
    return kv


def check_tokens(name, kvh, ps=16, pages=12, D=128, T=9, layer=1):
    spec = KVPoolSpec(2, kvh, pages, ps, D)
    kv = jnp.asarray(
        np.random.default_rng(0).normal(size=spec.shape), spec.jdtype
    )
    rng = np.random.default_rng(1)
    k_new = rng.normal(size=(T, kvh, D)).astype(np.float32)
    v_new = rng.normal(size=(T, kvh, D)).astype(np.float32)
    slots = rng.permutation(pages * ps)[:T].astype(np.int32)
    slots[3] = PAD_SLOT
    got = np.asarray(
        write_kv(
            kv, jnp.asarray(k_new, jnp.bfloat16),
            jnp.asarray(v_new, jnp.bfloat16),
            jnp.asarray(slots), layer, mode="decode",
        ).astype(jnp.float32)
    )
    if spec.layout == "split":
        fck = spec.split_faces
        kf = k_new.reshape(T, fck, -1).astype(jnp.bfloat16).astype(np.float32)
        vf = v_new.reshape(T, fck, -1).astype(jnp.bfloat16).astype(np.float32)
    else:
        kf = k_new.reshape(T, -1).astype(jnp.bfloat16).astype(np.float32)
        vf = v_new.reshape(T, -1).astype(jnp.bfloat16).astype(np.float32)
    want = expected_write(
        np.asarray(kv.astype(jnp.float32)), kf, vf, slots, layer, ps
    )
    err = np.abs(got - want).max()
    ok = err == 0.0
    print(f"{name:34s} maxerr {err:.5f} {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def check_prefill(name, kvh, ps=16, pages=12, D=128, layer=0):
    spec = KVPoolSpec(2, kvh, pages, ps, D)
    kv = jnp.asarray(
        np.random.default_rng(2).normal(size=spec.shape), spec.jdtype
    )
    rng = np.random.default_rng(3)
    ngroups = 3
    T = ngroups * ps
    k_new = rng.normal(size=(T, kvh, D)).astype(np.float32)
    v_new = rng.normal(size=(T, kvh, D)).astype(np.float32)
    tgt_pages = [4, -1, 7]  # middle group dead (PAD)
    slots = np.concatenate(
        [
            np.arange(ps) + (p * ps if p >= 0 else PAD_SLOT)
            for p in tgt_pages
        ]
    ).astype(np.int64).clip(max=PAD_SLOT).astype(np.int32)
    got = np.asarray(
        write_kv(
            kv, jnp.asarray(k_new, jnp.bfloat16),
            jnp.asarray(v_new, jnp.bfloat16),
            jnp.asarray(slots), layer, mode="prefill",
        ).astype(jnp.float32)
    )
    if spec.layout == "split":
        fck = spec.split_faces
        kf = k_new.reshape(T, fck, -1).astype(jnp.bfloat16).astype(np.float32)
        vf = v_new.reshape(T, fck, -1).astype(jnp.bfloat16).astype(np.float32)
    else:
        kf = k_new.reshape(T, -1).astype(jnp.bfloat16).astype(np.float32)
        vf = v_new.reshape(T, -1).astype(jnp.bfloat16).astype(np.float32)
    want = expected_write(
        np.asarray(kv.astype(jnp.float32)), kf, vf, slots, layer, ps
    )
    err = np.abs(got - want).max()
    ok = err == 0.0
    print(f"{name:34s} maxerr {err:.5f} {'OK' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    ok = True
    ok &= check_tokens("tokens split kvh8", 8)
    ok &= check_tokens("tokens split kvh2", 2)
    ok &= check_tokens("tokens combined kvh1 (mla)", 1, D=256)
    ok &= check_tokens("tokens split T=64", 8, T=64, pages=24)
    ok &= check_prefill("prefill split kvh8", 8)
    ok &= check_prefill("prefill combined kvh1", 1, D=256)
    print("ALL OK" if ok else "FAILURES", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
