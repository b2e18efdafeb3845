"""Ablation bench for the block-diag ragged_decode: where the time goes.

Variants (each intentionally computes WRONG results except 'full'):
  dma    - wait for the DMA, touch one row, nothing else
  qk     - QK dot + max reduce only
  soft   - QK + mask + full softmax bookkeeping, no PV dot
  noroll - full body minus the lane roll
  noinit - full body minus the per-sequence qbd rebuild (stale qbd)
  full   - the real kernel body
"""

from __future__ import annotations

import argparse
import functools
import sys, os, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import bench_loop_fn, fetch_sync

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _kernel(
    layer_ref, lengths_ref, pt_ref, buf_idx_ref, init_ref,
    q_ref, kv_hbm_ref, o_ref,
    qbd_ref, m_ref, l_ref, acc_ref, kv_buf, sem,
    *, batch_size, pages_per_chunk, pmax, sm_scale, gp, kvh, ablate,
):
    b, c = pl.program_id(0), pl.program_id(1)
    ps = kv_buf.shape[2]
    ck = pages_per_chunk * ps
    length = lengths_ref[b]

    def next_block(b, c):
        def advance_b():
            return (b + 1, 0)
        return lax.cond(c * ck < length, lambda: (b, c), advance_b)

    def start_copy(bb, cc, slot):
        layer = layer_ref[0]
        for i in range(pages_per_chunk):
            page = pt_ref[bb * pmax + cc * pages_per_chunk + i]
            pltpu.make_async_copy(
                kv_hbm_ref.at[layer, page], kv_buf.at[slot, i], sem.at[slot]
            ).start()

    def wait_copy(slot):
        for i in range(pages_per_chunk):
            pltpu.make_async_copy(
                kv_hbm_ref.at[0, 0], kv_buf.at[slot, i], sem.at[slot]
            ).wait()

    @pl.when(c * ck < length)
    def _live():
        slot = buf_idx_ref[0]

        @pl.when(init_ref[0] == 1)
        def _first():
            start_copy(b, c, slot)

        init_ref[0] = 0
        d = q_ref.shape[-1]
        r = q_ref.shape[2]

        @pl.when(c == 0)
        def _init_state():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)
            if ablate != "noinit":
                qbd_ref[...] = jnp.zeros_like(qbd_ref)
                for h in range(kvh):
                    qbd_ref[h * r : (h + 1) * r, h * d : (h + 1) * d] = q_ref[0, h]

        nb, nc = next_block(b, c + 1)

        @pl.when(nb < batch_size)
        def _prefetch():
            nslot = 1 - slot
            start_copy(nb, nc, nslot)
            buf_idx_ref[0] = nslot

        wait_copy(slot)
        kvc = kv_buf[slot].reshape(2 * ck, kv_buf.shape[-1])

        if ablate == "dma":
            o_ref[0, :] = jnp.broadcast_to(
                kvc[:1, :d].astype(jnp.float32)[None], o_ref.shape[1:]
            )
            return

        qk = lax.dot_general(
            qbd_ref[...], kvc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        qk = qk * sm_scale

        if ablate == "qk":
            m_cur = jnp.max(qk, axis=-1, keepdims=True)
            acc_ref[...] = acc_ref[...] + jnp.broadcast_to(m_cur, acc_ref.shape)
            @pl.when((c + 1) * ck >= length)
            def _emit0():
                for h in range(kvh):
                    o_ref[0, h] = acc_ref[
                        h * r : (h + 1) * r, h * d : (h + 1) * d
                    ].astype(o_ref.dtype)
            return

        j = lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        pos = c * ck + j // 2
        is_k = (j % 2) == 0
        mask = jnp.logical_and(pos < length, is_k)
        qk = jnp.where(mask, qk, MASK_VALUE)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(qk, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(qk - m_next)
        p = jnp.where(mask, p, 0.0)
        l_cur = jnp.sum(p, axis=-1, keepdims=True)
        alpha = jnp.exp(m_prev - m_next)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape)

        if ablate == "soft":
            acc_ref[...] = acc_ref[...] * alpha
            @pl.when((c + 1) * ck >= length)
            def _emit1():
                for h in range(kvh):
                    o_ref[0, h] = acc_ref[
                        h * r : (h + 1) * r, h * d : (h + 1) * d
                    ].astype(o_ref.dtype)
            return

        if ablate == "noroll":
            pr = p
        elif ablate == "shift":
            pr = jnp.concatenate([jnp.zeros_like(p[:, :1]), p[:, :-1]], axis=1)
        elif ablate == "shiftbf":
            pb = p.astype(jnp.bfloat16)
            pr = jnp.concatenate(
                [jnp.zeros_like(pb[:, :1]), pb[:, :-1]], axis=1
            )
        else:
            pr = pltpu.roll(p, 1, 1)
        pv = lax.dot_general(
            pr.astype(jnp.bfloat16), kvc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when((c + 1) * ck >= length)
        def _emit():
            lh = l_ref[:, :1]
            lh = jnp.where(lh == 0.0, 1.0, lh)
            on = acc_ref[...] / lh
            for h in range(kvh):
                o_ref[0, h] = on[h * r : (h + 1) * r, h * d : (h + 1) * d].astype(
                    o_ref.dtype
                )


def run_variant(q, kv, pt, lengths, ablate, ppc, sm):
    B, KVH, R, D = q.shape
    L, P, ps, two, X = kv.shape
    pmax = pt.shape[1]
    n_chunks = pmax // ppc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec((1, KVH, R, D), lambda b, c, *_: (b, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, KVH, R, D), lambda b, c, *_: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KVH * R, X), jnp.bfloat16),
            pltpu.VMEM((KVH * R, 128), jnp.float32),
            pltpu.VMEM((KVH * R, 128), jnp.float32),
            pltpu.VMEM((KVH * R, X), jnp.float32),
            pltpu.VMEM((2, ppc, ps, 2, X), kv.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, batch_size=B, pages_per_chunk=ppc, pmax=pmax,
        sm_scale=sm, gp=R, kvh=KVH, ablate=ablate,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, R, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        jnp.zeros((1,), jnp.int32), lengths,
        pt.reshape(-1).astype(jnp.int32),
        jnp.zeros((1,), jnp.int32), jnp.ones((1,), jnp.int32),
        q, kv,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--ps", type=int, default=64)
    ap.add_argument("--kvh", type=int, default=8)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--ppc", type=int, default=8)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--iters", type=int, nargs=2, default=[16, 128])
    ap.add_argument("--variants", nargs="+",
                    default=["dma", "qk", "soft", "noroll", "noinit", "full"])
    args = ap.parse_args()

    B, CTX, PS, KVH, D, R = args.bs, args.ctx, args.ps, args.kvh, args.d, args.r
    X = KVH * D
    pages_per_seq = (CTX + PS - 1) // PS
    P = B * pages_per_seq + 8
    NL = args.layers

    @jax.jit
    def build():
        key = jax.random.PRNGKey(0)
        kv = jax.random.normal(key, (NL, P, PS, 2, X), jnp.bfloat16) * 0.1
        q = jax.random.normal(key, (B, KVH, R, D), jnp.bfloat16)
        return kv, q

    kv, q = build()
    rng = np.random.default_rng(0)
    perm = (np.arange(B * pages_per_seq, dtype=np.int32)
            if os.environ.get("ABL_SEQ_PAGES") == "1"
            else rng.permutation(B * pages_per_seq).astype(np.int32))
    pt = jnp.asarray(perm.reshape(B, pages_per_seq))
    lengths = jnp.full((B,), CTX, jnp.int32)
    fetch_sync(jnp.sum(kv[0, 0, 0, 0, :8].astype(jnp.float32)))
    kv_bytes = B * CTX * 2 * X * 2
    sm = 1.0 / (D ** 0.5)

    for v in args.variants:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(qx, kvx, iters, _v=v):
            def body(i, qc):
                o = run_variant(qc, kvx, pt, lengths, _v, args.ppc, sm)
                return (qc + jnp.tanh(o).astype(jnp.bfloat16) * 1e-3).astype(
                    jnp.bfloat16
                )
            out = jax.lax.fori_loop(0, iters, body, qx)
            return jnp.sum(out.astype(jnp.float32))

        t0 = time.time()
        try:
            sec = bench_loop_fn(
                lambda x, kvx, iters: loop(x, kvx, iters=iters),
                q, kv, iters_pair=tuple(args.iters), trials=3,
            )
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            time.sleep(12)  # crashed kernels poison the relay briefly
            continue
        print(f"{v}: {sec*1e3:.3f} ms/call  {kv_bytes/sec/1e9:.0f} GB/s "
              f"(wall {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
