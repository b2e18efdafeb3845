"""Ablation for the grid=(1,) decode megakernel: DMA floor vs compute cost.

Replicates the `_decode_kernel` loop skeleton from ops/ragged_attention.py
with pieces removed (results are WRONG except 'full'):

  dma    - stream the chunks, touch one row into acc (pure-DMA floor)
  qk     - + the block-diagonal QK dot (no softmax/PV)
  soft   - + mask + online-softmax bookkeeping (no PV dot)
  full   - the real body (qbd rebuild, both dots, emit)

Usage: python benchmarks/abl_megakernel.py [--ppc 2 4] [--variants ...]
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import bench_loop_fn

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _shiftk(x, k):
    return jnp.concatenate([jnp.zeros_like(x[:, :k]), x[:, :-k]], axis=1)


def _kernel(
    layer_ref, lengths_ref, s0_ref, nck_ref, nlive_ref, total_ref, pt_ref,
    q_ref, kv_hbm_ref, o_ref,
    qbd_ref, m_ref, l_ref, acc_ref, kv_buf, sem,
    *, batch_size, pages_per_chunk, pmax, sm_scale, gp, kvh, variant,
):
    ps = kv_buf.shape[2]
    ck = pages_per_chunk * ps
    fc = kv_buf.shape[3]
    half = fc // 2
    hph = kvh // half
    d = q_ref.shape[-1]
    r = q_ref.shape[2]
    layer = layer_ref[0]
    total = total_ref[0]

    def start_copy(bb, cc, slot):
        base = s0_ref[bb] + cc
        for i in range(pages_per_chunk):
            page = pt_ref[bb * pmax + base * pages_per_chunk + i]
            pltpu.make_async_copy(
                kv_hbm_ref.at[layer, page], kv_buf.at[slot, i], sem.at[slot]
            ).start()

    def wait_copy(slot):
        for i in range(pages_per_chunk):
            pltpu.make_async_copy(
                kv_hbm_ref.at[0, 0], kv_buf.at[slot, i], sem.at[slot]
            ).wait()

    def advance(bb, cc):
        return lax.cond(
            cc + 1 < nck_ref[jnp.minimum(bb, batch_size - 1)],
            lambda: (bb, cc + 1),
            lambda: (nlive_ref[jnp.minimum(bb + 1, batch_size)], 0),
        )

    @pl.when(total > 0)
    def _run():
        b0 = nlive_ref[0]
        start_copy(b0, 0, 0)

        def body(i, carry):
            b, c, nb, nc, slot = carry

            @pl.when(nb < batch_size)
            def _prefetch():
                start_copy(nb, nc, 1 - slot)

            wait_copy(slot)
            length = lengths_ref[b]

            @pl.when(c == 0)
            def _init_state():
                m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
                l_ref[...] = jnp.zeros_like(l_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)
                if variant == "full":
                    qbd_ref[...] = jnp.zeros_like(qbd_ref)
                    for h in range(kvh):
                        hl = (h % hph) * d
                        qbd_ref[h * r : (h + 1) * r, hl : hl + d] = (
                            q_ref[b, h] * jnp.asarray(sm_scale, q_ref.dtype)
                        )

            kvc = kv_buf[slot].reshape(fc * ck, kv_buf.shape[-1])
            if kvc.dtype != jnp.bfloat16:
                kvc = kvc.astype(jnp.bfloat16)

            if variant == "dma":
                acc_ref[:, :128] += kvc[:1, :128].astype(jnp.float32)
            else:
                qk = lax.dot_general(
                    qbd_ref[...], kvc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if variant == "qk":
                    acc_ref[:, :128] += qk[:, :128]
                else:
                    j = lax.broadcasted_iota(jnp.int32, qk.shape, 1)
                    pos = (s0_ref[b] + c) * ck + j // fc
                    if half == 1:
                        right_class = (j % fc) == 0
                    else:
                        chc = lax.broadcasted_iota(jnp.int32, qk.shape, 0) // (
                            r * hph
                        )
                        right_class = (j % fc) == chc
                    limit = length
                    mask = jnp.logical_and(pos < limit, right_class)
                    qk = jnp.where(mask, qk, MASK_VALUE)

                    m_prev = m_ref[:, :1]
                    l_prev = l_ref[:, :1]
                    m_cur = jnp.max(qk, axis=-1, keepdims=True)
                    m_next = jnp.maximum(m_prev, m_cur)
                    p = jnp.exp(qk - m_next)
                    l_cur = jnp.sum(p, axis=-1, keepdims=True)
                    alpha = jnp.exp(m_prev - m_next)
                    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
                    l_ref[...] = jnp.broadcast_to(
                        alpha * l_prev + l_cur, l_ref.shape
                    )
                    if variant == "soft":
                        acc_ref[:, :128] += p[:, :128]
                    else:
                        pv = lax.dot_general(
                            _shiftk(p, half).astype(jnp.bfloat16), kvc,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        acc_ref[...] = acc_ref[...] * alpha + pv

            @pl.when(jnp.logical_and(variant == "full", c + 1 == nck_ref[b]))
            def _emit():
                lh = l_ref[:, :1]
                lh = jnp.where(lh == 0.0, 1.0, lh)
                on = acc_ref[...] / lh
                for h in range(kvh):
                    hl = (h % hph) * d
                    o_ref[b, h] = on[h * r : (h + 1) * r, hl : hl + d].astype(
                        o_ref.dtype
                    )

            @pl.when(jnp.logical_and(variant != "full", i + 1 == total))
            def _emit2():
                o_ref[0, 0] = acc_ref[:r, :d].astype(o_ref.dtype)

            nb2, nc2 = advance(nb, nc)
            return (nb, nc, nb2, nc2, 1 - slot)

        nb0, nc0 = advance(b0, 0)
        lax.fori_loop(0, total, body, (b0, jnp.int32(0), nb0, nc0, jnp.int32(0)))


def run_variant(variant, B, CTX, PS, QH, KVH, D, ppc, iters_pair):
    G = QH // KVH
    gp = 8  # same as shipped kernel at QS=1
    R = gp
    X = KVH * D
    pages_per_seq = (CTX + PS - 1) // PS
    P = B * pages_per_seq + 8
    L = 1
    Xr = 2 * KVH * D // 2
    fc = 2

    pmax0 = pages_per_seq
    import math
    pmax = math.ceil(pmax0 / ppc) * ppc
    n_chunks = pmax // ppc
    ck = ppc * PS

    @jax.jit
    def mk(key):
        kq, kk = jax.random.split(key)
        kv = jax.random.normal(kk, (L, P, PS, fc, Xr), jnp.bfloat16)
        q = jax.random.normal(kq, (B, KVH, R, D), jnp.bfloat16)
        return kv, q

    kv, q = mk(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pt = np.zeros((B, pmax), np.int32)
    pt[:, :pages_per_seq] = rng.permutation(B * pages_per_seq).reshape(
        B, pages_per_seq
    )
    lengths = np.full(B, CTX, np.int32)

    s0 = np.zeros(B, np.int32)
    nck = ((lengths + ck - 1) // ck).astype(np.int32)
    total = np.array([int(nck.sum())], np.int32)
    vals = np.where(lengths > 0, np.arange(B), B)
    nlive = np.concatenate([np.minimum.accumulate(vals[::-1])[::-1], [B]]).astype(
        np.int32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KVH * R, Xr), jnp.bfloat16),
            pltpu.VMEM((KVH * R, 128), jnp.float32),
            pltpu.VMEM((KVH * R, 128), jnp.float32),
            pltpu.VMEM((KVH * R, Xr), jnp.float32),
            pltpu.VMEM((2, ppc, PS, fc, Xr), kv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel,
        batch_size=B,
        pages_per_chunk=ppc,
        pmax=pmax,
        sm_scale=1.0 / np.sqrt(D),
        gp=gp,
        kvh=KVH,
        variant=variant,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, R, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(q0, kv, *, iters):
        def body(i, qc):
            o = call(
                jnp.zeros(1, jnp.int32),
                jnp.asarray(lengths),
                jnp.asarray(s0),
                jnp.asarray(nck),
                jnp.asarray(nlive),
                jnp.asarray(total),
                jnp.asarray(pt.reshape(-1)),
                qc,
                kv,
            )
            return (qc + o[:, :, :, :].astype(jnp.bfloat16) * 1e-3).astype(
                qc.dtype
            )

        return lax.fori_loop(0, iters, body, q0)[:1, :1, :1, :8]

    sec = bench_loop_fn(
        lambda q0, kv, iters: loop(q0, kv, iters=iters), q, kv,
        iters_pair=iters_pair,
    )
    kv_bytes = B * CTX * 2 * KVH * D * 2
    print(
        f"{variant:5s} ppc={ppc}: {sec*1e3:7.3f} ms/call "
        f"{kv_bytes/sec/1e9:6.0f} GB/s of KV",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--ps", type=int, default=64)
    ap.add_argument("--qh", type=int, default=32)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--ppc", type=int, nargs="+", default=[4])
    ap.add_argument("--iters", type=int, nargs=2, default=[16, 128])
    ap.add_argument(
        "--variants", nargs="+", default=["dma", "qk", "soft", "full"]
    )
    args = ap.parse_args()
    for ppc in args.ppc:
        for v in args.variants:
            run_variant(
                v, args.bs, args.ctx, args.ps, args.qh, args.kvh, args.d,
                ppc, tuple(args.iters),
            )


if __name__ == "__main__":
    main()
