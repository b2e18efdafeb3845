"""Spike: split K / V pools for decode attention.

Premise: the combined [L, P, ps, 2, KVH*D] pool forces both kernel dots to
contract the FULL K+V chunk (2x MXU traffic) plus a class mask and a lane
shift.  Separate K and V pools [L, P, ps, KVH*D] keep whole-page DMAs and
single-row token writes, while each dot touches only its half:

  qk: [KVH*R, Xr] x [ck, Xr]^T -> [KVH*R, ck]   (ck cols, was fc*ck)
  pv: [KVH*R, ck] x [ck, Xr]   -> [KVH*R, Xr]

-> half the MXU cycles, half the softmax columns, no class mask, no shift.

This script checks exact-semantics vs an einsum oracle on the real TPU and
times the kernel against the shipped combined-pool ragged_decode.

Usage: python benchmarks/spike_split_pool.py [--ctx 512] [--ppc 4]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import bench_loop_fn

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _kernel(
    layer_ref, lengths_ref, nck_ref, nlive_ref, total_ref, pt_ref,
    q_ref,  # [B, KVH, gp, D]
    k_hbm, v_hbm,  # [L, P, ps, Xr] (ANY)
    o_ref,  # [B, KVH, gp, D] f32
    qbd_ref, m_ref, l_ref, acc_ref,
    k_buf, v_buf,  # [2, ppc, ps, Xr]
    sem,  # [2, 2]
    *, batch_size, ppc, pmax, sm_scale, gp, kvh,
):
    ps = k_buf.shape[2]
    ck = ppc * ps
    d = q_ref.shape[-1]
    layer = layer_ref[0]
    total = total_ref[0]
    hph = kvh  # one class: heads per lane row
    Xr = k_buf.shape[-1]
    hl_div = Xr // d  # heads per lane span

    def live_pages(bb, cc):
        n = lengths_ref[bb] - cc * ck + (ps - 1)
        return lax.div(jnp.maximum(n, 0), ps)

    def start_copy(bb, cc, slot):
        npg = live_pages(bb, cc)
        for i in range(ppc):
            @pl.when(i < npg)
            def _():
                page = pt_ref[bb * pmax + cc * ppc + i]
                pltpu.make_async_copy(
                    k_hbm.at[layer, page], k_buf.at[slot, i], sem.at[slot, 0]
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[layer, page], v_buf.at[slot, i], sem.at[slot, 1]
                ).start()

    def wait_copy(bb, cc, slot):
        npg = live_pages(bb, cc)
        for i in range(ppc):
            @pl.when(i < npg)
            def _():
                pltpu.make_async_copy(
                    k_hbm.at[0, 0], k_buf.at[slot, i], sem.at[slot, 0]
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[0, 0], v_buf.at[slot, i], sem.at[slot, 1]
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
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)
        start_copy(b0, 0, 0)

        def body(i, carry):
            b, c, nb, nc, slot = carry

            @pl.when(nb < batch_size)
            def _prefetch():
                start_copy(nb, nc, 1 - slot)

            wait_copy(b, c, slot)
            length = lengths_ref[b]

            @pl.when(c == 0)
            def _init():
                m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
                l_ref[...] = jnp.zeros_like(l_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)
                qbd_ref[...] = jnp.zeros_like(qbd_ref)
                for h in range(kvh):
                    hl = (h % hl_div) * d
                    qbd_ref[h * gp : (h + 1) * gp, hl : hl + d] = (
                        q_ref[b, h] * jnp.asarray(sm_scale, q_ref.dtype)
                    )

            kc = k_buf[slot].reshape(ck, Xr)
            vc = v_buf[slot].reshape(ck, Xr)
            qk = lax.dot_general(
                qbd_ref[...], kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [KVH*gp, ck]
            tj = lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            limit = length - c * ck
            qk = jnp.where(tj < limit, qk, MASK_VALUE)

            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_cur = jnp.max(qk, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(qk - m_next)
            l_cur = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_next)
            m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape)
            pv = lax.dot_general(
                p.astype(jnp.bfloat16), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[...] = acc_ref[...] * alpha + pv

            @pl.when(c + 1 == nck_ref[b])
            def _emit():
                lh = l_ref[:, :1]
                lh = jnp.where(lh == 0.0, 1.0, lh)
                on = acc_ref[...] / lh
                for h in range(kvh):
                    hl = (h % hl_div) * d
                    o_ref[b, h] = on[
                        h * gp : (h + 1) * gp, hl : hl + d
                    ].astype(o_ref.dtype)

            nb2, nc2 = advance(nb, nc)
            return (nb, nc, nb2, nc2, 1 - slot)

        nb0, nc0 = advance(b0, 0)
        lax.fori_loop(0, total, body, (b0, jnp.int32(0), nb0, nc0, jnp.int32(0)))


@functools.partial(jax.jit, static_argnames=("sm_scale", "ppc"))
def split_decode(q, k_pool, v_pool, page_table, lengths, layer, *, sm_scale,
                 ppc=4):
    L, P, ps, Xr = k_pool.shape
    B, QS, QH, D = q.shape
    assert QS == 1
    KVH = Xr // D
    G = QH // KVH
    gp = G
    qg = q.reshape(B, KVH, G, D) if False else jnp.transpose(
        q.reshape(B, 1, KVH, G, D), (0, 2, 1, 3, 4)
    ).reshape(B, KVH, G, D)
    pmax = page_table.shape[1]
    ck = ppc * ps
    lengths = jnp.asarray(lengths, jnp.int32)
    nck = (lengths + ck - 1) // ck
    nck = jnp.where(lengths > 0, nck, 0)
    total = jnp.sum(nck).reshape(1)
    vals = jnp.where(lengths > 0, jnp.arange(B, dtype=jnp.int32), B)
    nlive = jnp.concatenate(
        [lax.cummin(vals[::-1])[::-1], jnp.full((1,), B, jnp.int32)]
    )
    layer = jnp.asarray(layer, jnp.int32).reshape(1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, KVH, gp, D), lambda g, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, KVH, gp, D), lambda g, *_: (0, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KVH * gp, Xr), jnp.bfloat16),
            pltpu.VMEM((KVH * gp, 128), jnp.float32),
            pltpu.VMEM((KVH * gp, 128), jnp.float32),
            pltpu.VMEM((KVH * gp, Xr), jnp.float32),
            pltpu.VMEM((2, ppc, ps, Xr), k_pool.dtype),
            pltpu.VMEM((2, ppc, ps, Xr), v_pool.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _kernel, batch_size=B, ppc=ppc, pmax=pmax, sm_scale=sm_scale,
        gp=gp, kvh=KVH,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, gp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(layer, lengths, nck, nlive, total,
      page_table.reshape(-1).astype(jnp.int32), qg, k_pool, v_pool)
    return jnp.transpose(
        out.reshape(B, KVH, 1, gp, D), (0, 2, 1, 3, 4)
    ).reshape(B, 1, QH, D)


def oracle(q, k_pool, v_pool, page_table, lengths, layer, sm_scale):
    L, P, ps, Xr = k_pool.shape
    B, QS, QH, D = q.shape
    KVH = Xr // D
    G = QH // KVH
    kg = k_pool[layer][page_table].reshape(B, -1, KVH, D)
    vg = v_pool[layer][page_table].reshape(B, -1, KVH, D)
    qg = q.reshape(B, KVH, G, D).astype(jnp.float32)
    s = jnp.einsum("bkgd,bskd->bkgs", qg, kg.astype(jnp.float32)) * sm_scale
    mask = jnp.arange(s.shape[-1])[None, :] < lengths[:, None]
    s = jnp.where(mask[:, None, None, :], s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgs,bskd->bkgd", p, vg.astype(jnp.float32))
    return o.reshape(B, 1, QH, D)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--ps", type=int, default=64)
    ap.add_argument("--ppc", type=int, nargs="+", default=[4])
    ap.add_argument("--iters", type=int, nargs=2, default=[16, 128])
    args = ap.parse_args()
    B, ctx, ps = args.bs, args.ctx, args.ps
    QH, KVH, D, L = 32, 8, 128, 2
    Xr = KVH * D
    pages_per_seq = (ctx + ps - 1) // ps
    P = B * pages_per_seq + 8

    @jax.jit
    def mk(key):
        kk, kv, kq = jax.random.split(key, 3)
        kp = jax.random.normal(kk, (L, P, ps, Xr), jnp.bfloat16) * 0.3
        vp = jax.random.normal(kv, (L, P, ps, Xr), jnp.bfloat16) * 0.3
        q = jax.random.normal(kq, (B, 1, QH, D), jnp.bfloat16) * 0.3
        return kp, vp, q

    kp, vp, q = mk(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pt = jnp.asarray(
        rng.permutation(B * pages_per_seq).reshape(B, pages_per_seq).astype(
            np.int32
        )
    )
    lengths = rng.integers(1, ctx + 1, B).astype(np.int32)
    lengths[0] = ctx
    lengths[::7] = 0
    lens = jnp.asarray(lengths)
    sm = 1.0 / np.sqrt(D)

    got = np.asarray(split_decode(q, kp, vp, pt, lens, 1, sm_scale=sm,
                                  ppc=args.ppc[0]))
    want = np.asarray(oracle(q, kp, vp, pt, lens, 1, sm))
    live = lengths > 0
    err = np.abs(got[live] - want[live]).max()
    print(f"correctness maxerr {err:.4f} {'OK' if err < 2e-2 else 'FAIL'}",
          flush=True)

    # timing: uniform full-length batch (matches bench_attention geometry)
    full = jnp.full((B,), ctx, jnp.int32)
    kv_bytes = B * ctx * 2 * Xr * 2  # K+V bf16
    for ppc in args.ppc:
        def loop(x, kp, vp, iters):
            def body(i, carry):
                qx, acc = carry
                o = split_decode(
                    qx, kp, vp, pt, full, i % L, sm_scale=sm, ppc=ppc
                )
                qx = (qx + o.astype(jnp.bfloat16) * 1e-3).astype(jnp.bfloat16)
                return (qx, acc + o[0, 0, 0, 0])
            qx, acc = lax.fori_loop(0, iters, body, (x, jnp.float32(0)))
            return qx[:1, :1, :1, :8] + acc
        jfn = jax.jit(loop, static_argnums=(3,))
        sec = bench_loop_fn(
            lambda x, kp, vp, iters: jfn(x, kp, vp, iters),
            q, kp, vp, iters_pair=tuple(args.iters),
        )
        print(
            f"split ppc={ppc}: {sec*1e3:.3f} ms/call  "
            f"{kv_bytes/sec/1e9:6.0f} GB/s of KV",
            flush=True,
        )


if __name__ == "__main__":
    main()
