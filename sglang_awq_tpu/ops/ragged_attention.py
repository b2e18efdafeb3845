"""Paged attention over the combined token-major KV pool (round 2, v4).

TPU-native re-design of the reference's decode + extend attention kernels
(`python/sglang/srt/layers/attention/triton_ops/decode_attention.py:45,516`,
`extend_attention.py:542` — SURVEY.md §A.3).  Key difference vs round 1:

* Pool layout [L, num_pages, ps, 2, KVH*D] (kv_pool.py): ONE ~256 KB DMA
  per page brings K+V for ALL kv heads, vs 2*KVH separate 16 KB
  (page, head) DMAs in the round-1 head-major kernel, whose measured
  ceiling was 283 GB/s of the ~820 GB/s HBM.  The grid drops the kv-head
  dimension; a static in-kernel loop computes every head from the shared
  VMEM chunk.  Per-head K/V are LANE slices at 128-multiple offsets (free)
  of the sublane-merged [2*ck, KVH*D] chunk view — K rows at even
  sublanes, V rows at odd ones.
* The QK dot contracts against K AND V rows at once ([R, 2*ck] scores) —
  2x dot FLOPs, irrelevant for this bandwidth-bound kernel; V columns are
  masked out of the softmax by lane parity, and the probabilities are
  lane-rolled by +1 so they line up with the V rows for the PV dot.
  (This dance exists because Mosaic forbids odd-aligned second-minor
  slices for bf16 — a [ps, 2*KVH, D] layout relayout-copies per head
  (189 GB/s measured), and a flat [ps, 2*KVH*D] layout cannot take
  single-token writes.  Both dots and the roll were validated for exact
  semantics on v5e hardware.)
* `ragged_decode` serves decode (QS=1) and speculative verify (QS>1): each
  sequence scores QS query tokens with per-token causal limits.
* `ragged_extend` serves BATCHED multi-request prefill (and mixed
  extend+decode batches): token-major queries, per-sequence q_len/kv_len,
  per-sequence page streams, causal within the new chunk, full attention to
  the prefix — all KV (prefix and new) is read from the pool, so the
  round-1 per-request XLA page-gather pass is gone.

Both kernels stream KV pages HBM->VMEM with double-buffered async copies and
a next-live-block lookahead so dead grid steps (padded rows, short
sequences, causally-skippable chunks) cost only grid iteration overhead.
The double-buffer/lookahead structure follows the publicly documented JAX
paged-attention kernel pattern; the combined-layout head loop, the
parity-masked K+V dot, ragged q-block mapping and masking are ours.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.utils import cdiv, pallas_interpret_default, round_up

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def chunk_to_bf16(x):
    """Dequantize a KV chunk for the MXU.

    fp8-e4m3 converts via an integer exponent rebias (s|eeee|mmm ->
    s|eeeeeeee|mmmmmmm is a 4-bit shift + (127-7)<<7 exponent add):
    Mosaic's native f8 convert is software and measured ~10x slower per
    byte than this (127 vs 727 GB/s decode attention at bs=64/ctx=512).
    Denormals flush to ~0 and NaN maps to a large finite value — neither
    occurs in KV data.  int8 converts natively."""
    if x.dtype == jnp.bfloat16:
        return x
    if x.dtype == jnp.float8_e4m3fn:
        # i32 lane math (Mosaic legalizes 32-bit shifts only): rebuild the
        # value as an f32 bit pattern, then narrow natively to bf16
        u = pltpu.bitcast(x, jnp.uint8).astype(jnp.int32)
        sign = (u & 0x80) << 24
        mag = (u & 0x7F) << 20  # exp -> bits 26..23, mant -> 22..20
        f = jnp.where(mag == 0, sign, sign + mag + (120 << 23))
        return pltpu.bitcast(f, jnp.float32).astype(jnp.bfloat16)
    return x.astype(jnp.bfloat16)


def _shiftk(x: jax.Array, k: int) -> jax.Array:
    """Lane-shift by +k: col j -> j+k, cols [0, k) <- 0.  Moves each K
    column's probability onto its token's V column (K class c -> V class
    c + fc/2).  Equivalent to a roll because the trailing k columns are V
    columns, always masked to zero.  Static slice+concat measured
    ~0.05 ms/call cheaper than Mosaic's tpu.dynamic_rotate at [64, 1024]
    f32 (which also rejects bf16) — with it the full decode kernel sits at
    the pure-DMA floor."""
    return jnp.concatenate([jnp.zeros_like(x[:, :k]), x[:, :-k]], axis=1)


# ---------------------------------------------------------------------------
# uniform-span kernels: decode (QS=1) and speculative verify (QS>1)
#
# Two pool layouts (mem_cache/kv_pool.py):
#   split    [L, P, 2, ps, fcK, XrK] — K and V on separate page faces; each
#            dot contracts only its half of the chunk (half the MXU traffic
#            of combined, no parity shift; 734 vs 542 GB/s measured, see
#            benchmarks/spike_split_pool.py).  Default for KVH >= 2.
#   combined [L, P, ps, fc, Xr] — K/V-interleaved token faces; kept for
#            KVH == 1 (MLA latent rows span the whole face width).
# ---------------------------------------------------------------------------


def _decode_kernel_split(
    # scalar prefetch
    layer_ref,  # [1]
    window_ref,  # [1] sliding window (0 = full attention)
    lengths_ref,  # [B]  (fuse_new: WALK lengths = real length - 1)
    s0_ref,  # [B] first live chunk per row (window skips earlier ones)
    nck_ref,  # [B] live chunks per row (0 for pads)
    nlive_ref,  # [B + 1] first live row index >= b (B if none)
    total_ref,  # [1] total live chunks across the batch
    pt_ref,  # [B * pmax]
    slots_ref,  # [B] new-token pool slot per row (fuse_new; else dummy)
    # inputs
    q_ref,  # [B, KVH, R, D] with R = QS * gp (whole batch resident)
    kv_hbm_ref,  # [L, P, 2, ps, fcK, XrK] (ANY)
    knew_ref,  # [B, fcK, XrK] new-token K face rows (fuse_new; else dummy)
    vnew_ref,  # [B, fcK, XrK] new-token V face rows (fuse_new; else dummy)
    sink_ref,  # [KVH*R or 8, 128] f32 per-row sink logits (dummy when off)
    alibi_ref,  # [KVH*R or 8, 128] f32 per-row ALiBi slopes (dummy when off)
    # outputs
    o_ref,  # [B, KVH, R, D] f32 (whole batch resident)
    *rest,  # [kvout_ref (fuse_new, aliased pool)] + scratch
    batch_size: int,
    pages_per_chunk: int,
    pmax: int,
    sm_scale: float,
    q_span: int,
    gp: int,
    kvh: int,
    softcap: float,
    has_window: bool,
    has_sinks: bool,
    interpret: bool,
    has_alibi: bool = False,
    fuse_new: bool = False,
    latent: bool = False,  # 4-dim latent pool [L, P, ps, Xr]: K == V
    wide: bool = False,  # 5-dim wide pool [L, P, 2, ps, KVH*D]: fcK == 1
    stats_out=None,  # optional (m_out, l_out) [B, KVH*R, 128] two-piece-merge stats
):
    """Split-pool megakernel: the _decode_kernel walk with per-half dots.
    The qk dot contracts q [KVH*R, XrK] against the K chunk only
    ([fcK*ck, XrK]); the PV dot multiplies the probabilities straight into
    the V chunk (columns (t, class) align with V rows — no lane shift).

    fuse_new (round 4): the NEW token's K/V rows ride this kernel instead
    of a separate kv_write dispatch.  The walk covers only the previous
    length-1 tokens (lengths_ref is the walk length); the new token is
    merged at emit as a one-token chunk attended straight from VMEM, and
    its pool row write is an async copy issued at the row's first walk
    chunk and awaited at kernel end.  A whole-page chunk DMA may race the
    row write on the same page, but the raced bytes belong to the new
    token's row only, which the walk masks; DMA granularity keeps bf16
    elements untorn, so raced reads are stale-or-new finite values."""
    if fuse_new:
        kvout_ref, *scratch = rest
    else:
        kvout_ref, scratch = None, list(rest)
    if latent:
        (qbd_ref, m_ref, l_ref, acc_ref, cb_ref, tj_ref, tr_ref,
         k_buf, sem) = scratch
        v_buf = sem_w = None
    else:
        (qbd_ref, m_ref, l_ref, acc_ref, cb_ref, tj_ref, tr_ref,
         k_buf, v_buf, sem, *sem_w_opt) = scratch
        sem_w = sem_w_opt[0] if fuse_new else None
    ps = k_buf.shape[2]
    ck = pages_per_chunk * ps
    # K sublane rows per token (2 bf16 / 4 fp8-int8; 1 = latent: a single
    # row per token serves as BOTH K and V — MLA stores one latent copy;
    # 1 = wide: one flat row per token, no class columns)
    fck = 1 if (latent or wide) else k_buf.shape[3]
    hph = kvh // fck  # heads per class row
    d = q_ref.shape[-1]
    r = q_ref.shape[2]
    layer = layer_ref[0]
    total = total_ref[0]

    def live_pages(bb, cc):
        base = (s0_ref[bb] + cc) * ck
        n = lengths_ref[bb] - base + (ps - 1)
        return lax.div(jnp.maximum(n, 0), ps)

    def start_copy(bb, cc, slot):
        base = s0_ref[bb] + cc
        npg = live_pages(bb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                page = pt_ref[bb * pmax + base * pages_per_chunk + i]
                if latent:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[layer, page], k_buf.at[slot, i],
                        sem.at[slot, 0],
                    ).start()
                else:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[layer, page, 0], k_buf.at[slot, i],
                        sem.at[slot, 0],
                    ).start()
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[layer, page, 1], v_buf.at[slot, i],
                        sem.at[slot, 1],
                    ).start()

    def wait_copy(bb, cc, slot):
        npg = live_pages(bb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                if latent:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0], k_buf.at[slot, i],
                        sem.at[slot, 0],
                    ).wait()
                else:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0, 0], k_buf.at[slot, i],
                        sem.at[slot, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0, 0], v_buf.at[slot, i],
                        sem.at[slot, 1],
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
        # skipped tail pages must not feed uninitialized VMEM into the dots
        k_buf[...] = jnp.zeros_like(k_buf)
        if not latent:
            v_buf[...] = jnp.zeros_like(v_buf)
        start_copy(b0, 0, 0)

        # chunk-invariant mask components, built once (overlapped with the
        # first chunk's DMA)
        jc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 1)
        chc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 0) // (r * hph)
        cb_ref[...] = jnp.where((jc % fck) == chc, 0.0, MASK_VALUE)
        tj_ref[...] = lax.broadcasted_iota(jnp.int32, tj_ref.shape, 1) // fck
        if q_span > 1:
            tr_ref[...] = (
                lax.broadcasted_iota(jnp.int32, tr_ref.shape, 0) % r
            ) // gp

        def body(i, carry):
            b, c, nb, nc, slot = carry

            @pl.when(nb < batch_size)
            def _prefetch():
                start_copy(nb, nc, 1 - slot)

            wait_copy(b, c, slot)
            length = lengths_ref[b]

            @pl.when(c == 0)
            def _init_state():
                m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
                l_ref[...] = jnp.zeros_like(l_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)
                qbd_ref[...] = jnp.zeros_like(qbd_ref)
                for h in range(kvh):
                    hl = (h % hph) * d
                    qbd_ref[h * r : (h + 1) * r, hl : hl + d] = (
                        q_ref[b, h] * jnp.asarray(sm_scale, q_ref.dtype)
                    )
                if fuse_new:
                    # the row's new-token pool write rides the walk: issued
                    # here (first chunk), awaited after the whole loop
                    s = slots_ref[b]
                    num_slots = kv_hbm_ref.shape[1] * ps

                    @pl.when((s >= 0) & (s < num_slots))
                    def _start_write():
                        pltpu.make_async_copy(
                            knew_ref.at[b],
                            kvout_ref.at[layer, s // ps, 0, s % ps],
                            sem_w,
                        ).start()
                        pltpu.make_async_copy(
                            vnew_ref.at[b],
                            kvout_ref.at[layer, s // ps, 1, s % ps],
                            sem_w,
                        ).start()

            kc = k_buf[slot].reshape(fck * ck, k_buf.shape[-1])
            vc = kc if latent else v_buf[slot].reshape(fck * ck, v_buf.shape[-1])
            if kc.dtype != jnp.bfloat16:
                kc = chunk_to_bf16(kc)
                vc = kc if latent else chunk_to_bf16(vc)

            qk = lax.dot_general(
                qbd_ref[...], kc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [KVH*R, fcK*ck]
            if softcap:
                qk = softcap * jnp.tanh(qk / softcap)
            if fck > 1:  # wide/latent: no class columns, nothing to mask
                qk = qk + cb_ref[...]
            base = (s0_ref[b] + c) * ck
            tj = tj_ref[:1]
            # fuse_new: lengths_ref holds the WALK length (real - 1); the
            # query position is still real-1 = walk length, so window /
            # chunk lows use limit + qoff
            qoff = 1 if fuse_new else 0
            if q_span == 1:
                limit = length - base
            else:
                limit = (length - (q_span - 1) - base) + tr_ref[:, :1]
            mask = tj < limit
            if has_window:
                # win > 0: sliding window; win < 0: CHUNKED attention of
                # size -win (llama4 attention_chunk_size — keys outside the
                # query's chunk are masked)
                win = window_ref[0]
                cs = jnp.maximum(-win, 1)
                low = jnp.where(
                    win > 0, limit + qoff - win,
                    jnp.where(
                        win < 0, ((limit + qoff - 1) // cs) * cs, -(1 << 30)
                    ),
                )
                mask = jnp.logical_and(mask, tj >= low)
            qk = jnp.where(mask, qk, MASK_VALUE)
            if has_alibi:
                # ALiBi in per-KEY form: m*(j - i) == m*j up to a per-row
                # constant that cancels in softmax; key position = base+tj
                qk = qk + alibi_ref[:, :1] * (base + tj).astype(jnp.float32)

            m_prev = m_ref[:, :1]
            l_prev = l_ref[:, :1]
            m_cur = jnp.max(qk, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(qk - m_next)
            l_cur = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_next)
            m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape)

            # probabilities hit V rows directly: column (t, class c) is V
            # row fcK*t + c, which holds class-c heads' V — row (h, ...) of
            # p is nonzero only at class h//hph columns, so the dot picks
            # exactly head h's V lanes.  Off-class output lanes are garbage
            # and never read at emit.
            pv = lax.dot_general(
                p.astype(jnp.bfloat16), vc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[...] = acc_ref[...] * alpha + pv

            @pl.when(c + 1 == nck_ref[b])
            def _emit():
                if fuse_new:
                    # merge the new token as a one-token chunk attended
                    # straight from VMEM.  qbd is block-diagonal (head h's
                    # rows are zero outside its lane strip), so the
                    # elementwise product with the class-replicated face
                    # row picks exactly head h's K lanes — no dot needed.
                    xr = knew_ref.shape[-1]
                    reps = r * hph
                    kn = knew_ref[b]  # [fck, Xr] bf16
                    vn = vnew_ref[b]
                    knr = jnp.broadcast_to(
                        kn[:, None, :], (fck, reps, xr)
                    ).reshape(fck * reps, xr)
                    vnr = jnp.broadcast_to(
                        vn[:, None, :], (fck, reps, xr)
                    ).reshape(fck * reps, xr)
                    qkn = jnp.sum(
                        qbd_ref[...].astype(jnp.float32)
                        * knr.astype(jnp.float32),
                        axis=-1, keepdims=True,
                    )  # [KVH*R, 1]
                    if softcap:
                        qkn = softcap * jnp.tanh(qkn / softcap)
                    m_pr = m_ref[:, :1]
                    m_fin = jnp.maximum(m_pr, qkn)
                    alpha2 = jnp.exp(m_pr - m_fin)
                    pn = jnp.exp(qkn - m_fin)
                    l_ref[...] = jnp.broadcast_to(
                        alpha2 * l_ref[:, :1] + pn, l_ref.shape
                    )
                    acc_ref[...] = (
                        acc_ref[...] * alpha2 + pn * vnr.astype(jnp.float32)
                    )
                    m_ref[...] = jnp.broadcast_to(m_fin, m_ref.shape)
                lh = l_ref[:, :1]
                if has_sinks:
                    lh = lh + jnp.exp(sink_ref[:, :1] - m_ref[:, :1])
                lh = jnp.where(lh == 0.0, 1.0, lh)
                on = acc_ref[...] / lh
                for h in range(kvh):
                    hl = (h % hph) * d
                    o_ref[b, h] = on[h * r : (h + 1) * r, hl : hl + d].astype(
                        o_ref.dtype
                    )
                if stats_out is not None:
                    m_out, l_out = stats_out
                    m_out[b] = jnp.broadcast_to(m_ref[:, :1], m_ref.shape)
                    l_out[b] = jnp.broadcast_to(l_ref[:, :1], l_ref.shape)

            nb2, nc2 = advance(nb, nc)
            return (nb, nc, nb2, nc2, 1 - slot)

        nb0, nc0 = advance(b0, 0)
        lax.fori_loop(
            0, total, body, (b0, jnp.int32(0), nb0, nc0, jnp.int32(0)),
        )
        if fuse_new:
            num_slots = kv_hbm_ref.shape[1] * ps

            def _wait_writes(bb, acc):
                s = slots_ref[bb]

                @pl.when((s >= 0) & (s < num_slots))
                def _():
                    for _ in range(2):
                        pltpu.make_async_copy(
                            knew_ref.at[0], kvout_ref.at[0, 0, 0, 0], sem_w
                        ).wait()

                return acc

            lax.fori_loop(0, batch_size, _wait_writes, 0)


def _decode_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    window_ref,  # [1] sliding window (0 = full attention)
    lengths_ref,  # [B]
    s0_ref,  # [B] first live chunk per row (window skips earlier ones)
    nck_ref,  # [B] live chunks per row (0 for pads)
    nlive_ref,  # [B + 1] first live row index >= b (B if none)
    total_ref,  # [1] total live chunks across the batch
    pt_ref,  # [B * pmax]
    slots_ref,  # [B] dummy (fused writes are split-pool only)
    # inputs
    q_ref,  # [B, KVH, R, D] with R = QS * gp (whole batch resident)
    kv_hbm_ref,  # [L, P, ps, fc, 2*KVH*D/fc] (ANY)
    knew_ref,  # dummy (fused writes are split-pool only)
    vnew_ref,  # dummy
    sink_ref,  # [KVH*R or 8, 128] f32 per-row sink logits (dummy when off)
    alibi_ref,  # dummy (ALiBi serves through the split-pool kernel)
    # output
    o_ref,  # [B, KVH, R, D] f32 (whole batch resident)
    # scratch
    qbd_ref,  # [KVH*R, Xr] bf16 block-diagonal q (Xr = 2*KVH*D/fc)
    m_ref,  # [KVH*R, 128] f32
    l_ref,  # [KVH*R, 128] f32
    acc_ref,  # [KVH*R, Xr] f32
    cb_ref,  # [KVH*R, fc*ck] f32 class bias (0 / MASK), built once
    tj_ref,  # [8, fc*ck] i32 token index per column, built once
    tr_ref,  # [KVH*R, 128] i32 per-row causal offset (QS > 1), built once
    kv_buf,  # [2, ppc, ps, fc, Xr]
    sem,  # [2]
    *,
    batch_size: int,
    pages_per_chunk: int,
    pmax: int,
    sm_scale: float,
    q_span: int,
    gp: int,
    kvh: int,
    softcap: float,
    has_window: bool,
    has_sinks: bool,
    interpret: bool,
):
    """Megakernel: grid=(1,); a dynamic-bound fori_loop walks the GLOBAL
    list of live (sequence, chunk) pairs, so padded rows, short sequences
    and page-table headroom cost ZERO iterations (a [B, pmax/ppc] grid paid
    ~3 us of Mosaic grid machinery per dead step — ~7 ms/step at bs=64 with
    a 16-page table and 8 live pages).  q and o stay VMEM-resident for the
    whole batch (1-8 MB); per-sequence state (m/l/acc/qbd) is rebuilt at
    each sequence's first chunk.  KV chunks stream with the same
    double-buffered DMA pattern, the lookahead now being "loop iteration
    i+1" instead of a grid-step scan."""
    ps = kv_buf.shape[2]
    ck = pages_per_chunk * ps
    fc = kv_buf.shape[3]  # face rows per token (2 bf16 / 4 fp8-int8)
    half = fc // 2  # K classes [0, half), V classes [half, fc)
    hph = kvh // half  # heads per class row
    d = q_ref.shape[-1]
    r = q_ref.shape[2]
    layer = layer_ref[0]
    total = total_ref[0]

    def live_pages(bb, cc):
        """Pages of chunk cc holding tokens < lengths[bb] (the tail chunk is
        usually partial: at ck=256/ps=64 a 513-token row's 3rd chunk has one
        live page, not 4 — skipping the dead pages cuts ~25% of KV DMA at
        ctx just past a chunk boundary)."""
        base = (s0_ref[bb] + cc) * ck
        n = lengths_ref[bb] - base + (ps - 1)
        return lax.div(jnp.maximum(n, 0), ps)

    def start_copy(bb, cc, slot):
        base = s0_ref[bb] + cc  # absolute chunk (window skips the head)
        npg = live_pages(bb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                page = pt_ref[bb * pmax + base * pages_per_chunk + i]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[layer, page], kv_buf.at[slot, i], sem.at[slot]
                ).start()

    def wait_copy(bb, cc, slot):
        npg = live_pages(bb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0, 0], kv_buf.at[slot, i], sem.at[slot]
                ).wait()

    def advance(bb, cc):
        """Next live (b, c) after (bb, cc); (B, 0) when exhausted."""
        return lax.cond(
            cc + 1 < nck_ref[jnp.minimum(bb, batch_size - 1)],
            lambda: (bb, cc + 1),
            lambda: (nlive_ref[jnp.minimum(bb + 1, batch_size)], 0),
        )

    @pl.when(total > 0)
    def _run():
        b0 = nlive_ref[0]
        # Scratch VMEM starts uninitialized; pages this call never DMAs
        # (partial tail chunks) would otherwise feed arbitrary bits — a
        # bf16 NaN there turns the PV dot's exact-zero probability into
        # NaN (0 * NaN).  One-time zero fill; later chunks only ever leave
        # behind finite pool bytes.
        kv_buf[...] = jnp.zeros_like(kv_buf)
        start_copy(b0, 0, 0)

        # Chunk-invariant mask components, built ONCE per call (overlapped
        # with the first chunk's DMA).  The per-chunk body then pays one
        # add + one broadcast compare + one select instead of rebuilding
        # iota/div/mod masks for every chunk (measured ~0.5 us/chunk).
        jc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 1)
        if half == 1:
            right_class = (jc % fc) == 0
        else:
            chc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 0) // (r * hph)
            right_class = (jc % fc) == chc
        cb_ref[...] = jnp.where(right_class, 0.0, MASK_VALUE)
        tj_ref[...] = lax.broadcasted_iota(jnp.int32, tj_ref.shape, 1) // fc
        if q_span > 1:
            tr_ref[...] = (
                lax.broadcasted_iota(jnp.int32, tr_ref.shape, 0) % r
            ) // gp

        def body(i, carry):
            b, c, nb, nc, slot = carry

            @pl.when(nb < batch_size)
            def _prefetch():
                start_copy(nb, nc, 1 - slot)

            wait_copy(b, c, slot)
            length = lengths_ref[b]

            @pl.when(c == 0)
            def _init_state():
                m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
                l_ref[...] = jnp.zeros_like(l_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)
                # Block-diagonal q: row h*R + r holds q[b, h, r] at lanes
                # [(h%hph)*D, ...), zeros elsewhere, so ONE [KVH*R, Xr] x
                # [fc*ck, Xr] dot yields every head's scores exactly (zero
                # lanes kill the cross-head terms; the class mask below
                # drops scores against other class rows).  sm_scale is
                # folded in here: once per sequence, not per chunk.
                qbd_ref[...] = jnp.zeros_like(qbd_ref)
                for h in range(kvh):
                    hl = (h % hph) * d
                    qbd_ref[h * r : (h + 1) * r, hl : hl + d] = (
                        q_ref[b, h] * jnp.asarray(sm_scale, q_ref.dtype)
                    )

            # [ppc, ps, fc, Xr] -> [fc*ck, Xr]: sublane-merge, layout
            # preserving.  Token t's class rows sit at fc*t + 0..fc-1: K
            # classes first, V classes second.  Quantized pools (fp8/int8)
            # are upcast to bf16 here — one VPU cast per chunk, paid for by
            # the halved DMA bytes.
            kvc = kv_buf[slot].reshape(fc * ck, kv_buf.shape[-1])
            if kvc.dtype != jnp.bfloat16:
                kvc = chunk_to_bf16(kvc)

            # All heads in one dot: [KVH*R, fc*ck] scores, row h*R+r =
            # head h.  sm_scale is pre-folded into qbd.
            qk = lax.dot_general(
                qbd_ref[...], kvc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if softcap:  # Gemma2 attn-logit softcapping
                qk = softcap * jnp.tanh(qk / softcap)
            qk = qk + cb_ref[...]  # wrong-class columns -> ~MASK_VALUE
            base = (s0_ref[b] + c) * ck  # first token of this chunk
            tj = tj_ref[:1]  # [1, fc*ck] in-chunk token index
            if q_span == 1:
                limit = length - base  # same causal limit for every row
            else:
                # row h*R + t*gp + g scores query token t whose causal
                # limit is length - (q_span - 1 - t); same for every head
                limit = (length - (q_span - 1) - base) + tr_ref[:, :1]
            mask = tj < limit
            if has_window:
                # win > 0: sliding window; win < 0: CHUNKED attention of
                # size -win (llama4 attention_chunk_size — keys outside the
                # query's chunk are masked)
                win = window_ref[0]
                cs = jnp.maximum(-win, 1)
                low = jnp.where(
                    win > 0, limit - win,
                    jnp.where(win < 0, ((limit - 1) // cs) * cs, -(1 << 30)),
                )
                mask = jnp.logical_and(mask, tj >= low)
            qk = jnp.where(mask, qk, MASK_VALUE)

            m_prev = m_ref[:, :1]  # [KVH*R, 1]
            l_prev = l_ref[:, :1]
            m_cur = jnp.max(qk, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            # masked cols hold MASK_VALUE (~-2.4e38): exp underflows to
            # exact +0.0, so no re-zeroing `where` is needed before the
            # sum / PV dot.
            p = jnp.exp(qk - m_next)
            l_cur = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_next)
            m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape)

            # shift probs K->V columns (class c -> c + half), then one full
            # [KVH*R, Xr] PV dot: non-prob rows multiply 0, V rows multiply
            # p_t.  Off-diagonal head blocks of the output are garbage
            # (head h probs x head h' values) — never read, the emit below
            # slices diagonal blocks only.
            pv = lax.dot_general(
                _shiftk(p, half).astype(jnp.bfloat16),
                kvc,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[...] = acc_ref[...] * alpha + pv

            @pl.when(c + 1 == nck_ref[b])
            def _emit():
                lh = l_ref[:, :1]
                if has_sinks:
                    # learned per-head sink logit joins the softmax
                    # denominator only (GPT-OSS attention sinks; reference
                    # sgl-kernel sink support).  Fully-masked rows have
                    # m = -inf -> exp(sink + inf) = inf -> acc/inf = 0.
                    lh = lh + jnp.exp(sink_ref[:, :1] - m_ref[:, :1])
                lh = jnp.where(lh == 0.0, 1.0, lh)
                on = acc_ref[...] / lh
                for h in range(kvh):
                    hl = (h % hph) * d
                    o_ref[b, h] = on[h * r : (h + 1) * r, hl : hl + d].astype(
                        o_ref.dtype
                    )

            nb2, nc2 = advance(nb, nc)
            return (nb, nc, nb2, nc2, 1 - slot)

        nb0, nc0 = advance(b0, 0)
        lax.fori_loop(
            0, total, body, (b0, jnp.int32(0), nb0, nc0, jnp.int32(0)),
        )


def _decode_kernel_split_with_stats(
    layer_ref, window_ref, lengths_ref, s0_ref, nck_ref, nlive_ref,
    total_ref, pt_ref, slots_ref, q_ref, kv_hbm_ref, knew_ref, vnew_ref,
    sink_ref, alibi_ref, o_ref, m_out, l_out,
    qbd_ref, m_ref, l_ref, acc_ref, cb_ref, tj_ref, tr_ref, k_buf, v_buf,
    sem,
    *,
    batch_size, pages_per_chunk, pmax, sm_scale, q_span, gp, kvh, softcap,
    has_window, has_sinks, interpret, has_alibi=False, wide=False,
):
    """Stats shim: two extra outputs (m_out, l_out) after o_ref route into
    _decode_kernel_split's stats_out keyword.  Explicit signature — a
    *args/**kw shim makes pallas's function flattening treat the bound
    statics as traced inputs."""
    _decode_kernel_split(
        layer_ref, window_ref, lengths_ref, s0_ref, nck_ref, nlive_ref,
        total_ref, pt_ref, slots_ref, q_ref, kv_hbm_ref, knew_ref, vnew_ref,
        sink_ref, alibi_ref, o_ref,
        qbd_ref, m_ref, l_ref, acc_ref, cb_ref, tj_ref, tr_ref, k_buf,
        v_buf, sem,
        batch_size=batch_size, pages_per_chunk=pages_per_chunk, pmax=pmax,
        sm_scale=sm_scale, q_span=q_span, gp=gp, kvh=kvh, softcap=softcap,
        has_window=has_window, has_sinks=has_sinks, interpret=interpret,
        has_alibi=has_alibi, wide=wide, stats_out=(m_out, l_out),
    )


def _decode_tail_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    lengths_ref,  # [B] REAL walk lengths
    tstart_ref,  # [B] first tail token (chunk-aligned main-walk boundary)
    ntp_ref,  # [B] live tail pages (0..tpp)
    hm_ref,  # [B] 1 if the main walk emitted stats for this row
    order_ref,  # [B] live row indices first (index order), then pads
    nrows_ref,  # [1] live row count
    pt_ref,  # [B * pmax]
    # inputs
    q_ref,  # [B, KVH, R, D]
    kv_hbm_ref,  # [L, P, 2, ps, fcK, XrK] (ANY)
    o1_ref,  # [B, KVH, R, D] f32 main-walk output (normalized)
    m1_ref,  # [B, KVH*R, 128] f32 main-walk softmax max
    l1_ref,  # [B, KVH*R, 128] f32 main-walk softmax sum
    sink_ref,  # [KVH*R or 8, 128] f32
    # outputs
    o_ref,  # [B, KVH, R, D] f32
    # scratch
    qbd_ref,  # [KVH*R, Xr] bf16
    m_ref,  # [KVH*R, 128] f32
    l_ref,  # [KVH*R, 128] f32
    acc_ref,  # [KVH*R, Xr] f32
    cb_ref,  # [KVH*R, fcK*ps] f32
    tj_ref,  # [8, fcK*ps] i32
    k_buf,  # [2, tpp, ps, fcK, XrK]
    v_buf,
    sem,  # [2, 2]
    *,
    batch_size: int,
    tpp: int,  # max tail pages per row
    pmax: int,
    sm_scale: float,
    gp: int,
    kvh: int,
    softcap: float,
    has_sinks: bool,
    interpret: bool,
    wide: bool = False,
):
    """Partial-tail walk for split-tail decode attention (round 5).

    The main walk covers whole ck-token chunks with no dead columns; this
    kernel scores the last (length % ck) tokens PER PAGE — dead pages cost
    nothing — and merges with the main walk's (o1, m1, l1) softmax stats.
    Reference role: the tail-block handling of paged FlashDecoding
    (`sgl-kernel` triton decode splits by full/partial blocks the same
    way).  Serving decode lengths almost always sit mid-chunk, and the
    single-pass kernel paid FULL-chunk masked compute for the tail — ~30%
    of the whole walk at bs=64/ctx~512 (docs/kernels.md round 5)."""
    ps = k_buf.shape[2]
    fck = 1 if wide else k_buf.shape[3]
    hph = kvh // fck
    d = q_ref.shape[-1]
    r = q_ref.shape[2]
    layer = layer_ref[0]

    def start_pages(bb, slot):
        ntp = ntp_ref[bb]
        p0 = tstart_ref[bb] // ps
        for i in range(tpp):

            @pl.when(i < ntp)
            def _():
                page = pt_ref[bb * pmax + p0 + i]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[layer, page, 0], k_buf.at[slot, i],
                    sem.at[slot, 0],
                ).start()
                pltpu.make_async_copy(
                    kv_hbm_ref.at[layer, page, 1], v_buf.at[slot, i],
                    sem.at[slot, 1],
                ).start()

    def wait_pages(bb, slot):
        ntp = ntp_ref[bb]
        for i in range(tpp):

            @pl.when(i < ntp)
            def _():
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0, 0, 0], k_buf.at[slot, i], sem.at[slot, 0]
                ).wait()
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0, 0, 0], v_buf.at[slot, i], sem.at[slot, 1]
                ).wait()

    jc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 1)
    chc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 0) // (r * hph)
    cb_ref[...] = jnp.where((jc % fck) == chc, 0.0, MASK_VALUE)
    tj_ref[...] = lax.broadcasted_iota(jnp.int32, tj_ref.shape, 1) // fck

    nrows = nrows_ref[0]
    NPF = 4  # buffer ring depth: rows ahead in flight (hides DMA latency —
    # a 2-slot ring stalled ~1.4 us/row on completion latency, round 5)

    for j in range(NPF - 1):

        @pl.when(j < nrows)
        def _prime():
            start_pages(order_ref[j], j)

    def body(i, _):
        b = order_ref[i]
        slot = lax.rem(i, NPF)

        @pl.when(i + NPF - 1 < nrows)
        def _prefetch():
            start_pages(
                order_ref[jnp.minimum(i + NPF - 1, batch_size - 1)],
                lax.rem(i + NPF - 1, NPF),
            )

        if True:  # row body (order lists live rows only)
            wait_pages(b, slot)
            length = lengths_ref[b]
            tstart = tstart_ref[b]
            ntp = ntp_ref[b]
            hm = hm_ref[b] > 0

            qbd_ref[...] = jnp.zeros_like(qbd_ref)
            for h in range(kvh):
                hl = (h % hph) * d
                qbd_ref[h * r : (h + 1) * r, hl : hl + d] = (
                    q_ref[b, h] * jnp.asarray(sm_scale, q_ref.dtype)
                )
            # seed the online softmax with the main walk's state:
            # acc = o1 * l1 (un-normalize), m = m1, l = l1
            m1 = jnp.where(hm, m1_ref[b][:, :1], -jnp.inf)
            l1 = jnp.where(hm, l1_ref[b][:, :1], 0.0)
            m_ref[...] = jnp.broadcast_to(m1, m_ref.shape)
            l_ref[...] = jnp.broadcast_to(l1, l_ref.shape)
            strips = []
            for h in range(kvh):
                o1h = jnp.where(hm, o1_ref[b, h].astype(jnp.float32), 0.0)
                o1h = o1h * l1[h * r : (h + 1) * r]
                hl = (h % hph) * d
                strips.append(jnp.pad(
                    o1h, ((0, 0), (hl, qbd_ref.shape[1] - hl - d))))
            acc_ref[...] = jnp.concatenate(strips, axis=0)

            for i in range(tpp):

                @pl.when(i < ntp)
                def _page():
                    kc = k_buf[slot, i].reshape(fck * ps, k_buf.shape[-1])
                    vc = v_buf[slot, i].reshape(fck * ps, v_buf.shape[-1])
                    if kc.dtype != jnp.bfloat16:
                        kc2 = chunk_to_bf16(kc)
                        vc2 = chunk_to_bf16(vc)
                    else:
                        kc2, vc2 = kc, vc
                    qk = lax.dot_general(
                        qbd_ref[...], kc2, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [KVH*R, fcK*ps]
                    if softcap:
                        qk = softcap * jnp.tanh(qk / softcap)
                    if fck > 1:
                        qk = qk + cb_ref[...]
                    tj = tj_ref[:1] + (tstart + i * ps)
                    qk = jnp.where(tj < length, qk, MASK_VALUE)
                    m_prev = m_ref[:, :1]
                    l_prev = l_ref[:, :1]
                    m_cur = jnp.max(qk, axis=-1, keepdims=True)
                    m_next = jnp.maximum(m_prev, m_cur)
                    p = jnp.exp(qk - m_next)
                    l_cur = jnp.sum(p, axis=-1, keepdims=True)
                    alpha = jnp.exp(m_prev - m_next)
                    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
                    l_ref[...] = jnp.broadcast_to(
                        alpha * l_prev + l_cur, l_ref.shape)
                    pv = lax.dot_general(
                        p.astype(jnp.bfloat16), vc2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc_ref[...] = acc_ref[...] * alpha + pv

            lh = l_ref[:, :1]
            if has_sinks:
                lh = lh + jnp.exp(sink_ref[:, :1] - m_ref[:, :1])
            lh = jnp.where(lh == 0.0, 1.0, lh)
            on = acc_ref[...] / lh
            for h in range(kvh):
                hl = (h % hph) * d
                o_ref[b, h] = on[h * r : (h + 1) * r, hl : hl + d].astype(
                    o_ref.dtype
                )

        return _

    lax.fori_loop(0, nrows, body, None)


def _decode_tail_kernel_batched(
    # scalar prefetch
    layer_ref,  # [1]
    lengths_ref,  # [B] REAL walk lengths
    tstart_ref,  # [B] first tail token (chunk-aligned main-walk boundary)
    ntp_ref,  # [B] live tail pages (0..tpb)
    hm_ref,  # [B] 1 if the main walk emitted stats for this row
    order_ref,  # [B] live row indices first (index order), then pads
    nrows_ref,  # [1] live row count
    pt_ref,  # [B * pmax]
    # inputs
    q_ref,  # [B, BR, D] bf16 (BR = KVH*R grouped rows)
    kv_hbm_ref,  # [L, P, 2, ps, Xr] wide (ANY)
    o1_ref,  # [B, BR, D] f32 main-walk output (normalized)
    m1_ref,  # [B, BR, 128] f32 main-walk softmax max
    l1_ref,  # [B, BR, 128] f32 main-walk softmax sum
    sink_ref,  # [GR or 8, 128] f32 (already tiled over the G group rows)
    # outputs
    o_ref,  # [B, BR, D] f32
    # scratch
    qrow_ref,  # [GR, D] bf16 raw q rows for the group
    orow_ref,  # [GR, D] f32 main-walk outputs for the group
    qg_ref,  # [GR, Xr] bf16 block-diagonal strips
    mg_ref,  # [GR, 128] f32
    lg_ref,  # [GR, 128] f32
    accg_ref,  # [GR, Xr] f32
    k_buf,  # [2, tpb, G, ps, Xr]
    v_buf,
    sem,  # [2, 2]
    *,
    batch_size: int,
    grp: int,  # G rows per group
    tpb: int,  # max tail pages per row
    pmax: int,
    sm_scale: float,
    kvh: int,
    r: int,
    softcap: float,
    has_sinks: bool,
    interpret: bool,
):
    """Row-BATCHED partial-tail walk (round-5 endgame).

    The per-row tail kernel was sequencing-bound: ~1 us/row of scalar
    DMA-wait/index/small-dot latency x bs rows = 62 us/layer at bs=64.
    This variant processes G rows per ring slot with ONE cross-product
    dot per page index — [G*BR, Xr] x [Xr, G*ps], block-diagonal masked
    so row-block s only scores its own page — and builds/extracts the
    per-head strips with vectorized one-hot selects instead of per-head
    loops.  The G x FLOP cross waste is cheap (M rises from BR to G*BR
    on the MXU); the sequencing cost amortizes G x.  Wide pools only
    (fcK == 1: one flat [ps, KVH*D] face per page)."""
    ps = k_buf.shape[3]
    Xr = k_buf.shape[4]
    D = q_ref.shape[-1]
    BR = kvh * r
    GR = grp * BR
    layer = layer_ref[0]
    nrows = nrows_ref[0]
    ngroups = (nrows + grp - 1) // grp

    def start_group(gi, slot):
        for s in range(grp):

            @pl.when(gi * grp + s < nrows)
            def _():
                b = order_ref[gi * grp + s]
                p0 = tstart_ref[b] // ps
                ntp = ntp_ref[b]
                for i in range(tpb):

                    @pl.when(i < ntp)
                    def _():
                        page = pt_ref[b * pmax + p0 + i]
                        pltpu.make_async_copy(
                            kv_hbm_ref.at[layer, page, 0],
                            k_buf.at[slot, i, s], sem.at[slot, 0],
                        ).start()
                        pltpu.make_async_copy(
                            kv_hbm_ref.at[layer, page, 1],
                            v_buf.at[slot, i, s], sem.at[slot, 1],
                        ).start()

    def wait_group(gi, slot):
        for s in range(grp):

            @pl.when(gi * grp + s < nrows)
            def _():
                b = order_ref[gi * grp + s]
                ntp = ntp_ref[b]
                for i in range(tpb):

                    @pl.when(i < ntp)
                    def _():
                        pltpu.make_async_copy(
                            kv_hbm_ref.at[0, 0, 0], k_buf.at[slot, i, s],
                            sem.at[slot, 0],
                        ).wait()
                        pltpu.make_async_copy(
                            kv_hbm_ref.at[0, 0, 0], v_buf.at[slot, i, s],
                            sem.at[slot, 1],
                        ).wait()

    # one-hot head-strip selector as a FULL-SHAPE f32 mask (2D only:
    # 3D i1 broadcasts hit Mosaic relayout limits): group row rr holds
    # head (rr % BR) // r, i.e. lanes [h*D, (h+1)*D)
    hmask = jnp.where(
        lax.broadcasted_iota(jnp.int32, (GR, Xr), 1) // D
        == (lax.broadcasted_iota(jnp.int32, (GR, Xr), 0) % BR) // r,
        1.0, 0.0)
    rowb = lax.broadcasted_iota(jnp.int32, (GR, grp * ps), 0) // BR
    colb = lax.broadcasted_iota(jnp.int32, (GR, grp * ps), 1) // ps
    colp = lax.broadcasted_iota(jnp.int32, (GR, grp * ps), 1) % ps
    diag = rowb == colb

    start_group(0, 0)

    def body(gi, _):
        slot = lax.rem(gi, 2)

        @pl.when(gi + 1 < ngroups)
        def _prefetch():
            start_group(gi + 1, lax.rem(gi + 1, 2))

        wait_group(gi, slot)

        # gather the group's rows (static destination slices, dynamic b)
        for s in range(grp):
            idx = jnp.minimum(gi * grp + s, batch_size - 1)
            b = order_ref[idx]
            live = gi * grp + s < nrows
            hm = live & (hm_ref[b] > 0)
            qrow_ref[s * BR : (s + 1) * BR] = q_ref[b]
            orow_ref[s * BR : (s + 1) * BR] = jnp.where(
                hm, o1_ref[b].astype(jnp.float32), 0.0)
            mg_ref[s * BR : (s + 1) * BR] = jnp.where(
                hm, m1_ref[b], -jnp.inf)
            lg_ref[s * BR : (s + 1) * BR] = jnp.where(hm, l1_ref[b], 0.0)

        # block-diagonal strips (lane-tile + full-shape mask, 2D ops only)
        qt = jnp.concatenate([qrow_ref[...]] * kvh, axis=1)  # [GR, Xr]
        qg_ref[...] = (
            qt * jnp.asarray(sm_scale, qt.dtype)
            * hmask.astype(qt.dtype)
        )
        ot = jnp.concatenate([orow_ref[...]] * kvh, axis=1)
        accg_ref[...] = ot * hmask * lg_ref[:, :1]

        # group-max live pages (scalar)
        mx = jnp.int32(0)
        for s in range(grp):
            idx = jnp.minimum(gi * grp + s, batch_size - 1)
            b = order_ref[idx]
            mx = jnp.maximum(
                mx, jnp.where(gi * grp + s < nrows, ntp_ref[b], 0))

        for pi in range(tpb):

            @pl.when(pi < mx)
            def _page():
                kc = k_buf[slot, pi].reshape(grp * ps, Xr)
                vc = v_buf[slot, pi].reshape(grp * ps, Xr)
                qk = lax.dot_general(
                    qg_ref[...], kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [GR, grp*ps]
                if softcap:
                    qk = softcap * jnp.tanh(qk / softcap)
                # own-block + live-token mask (per-slot scalar bounds).
                # colv also zero-fills v columns of never-DMA'd pages —
                # garbage (NaN) VMEM would poison the shared pv dot even
                # under p == 0 (0 * NaN = NaN).
                qk = jnp.where(diag, qk, MASK_VALUE)
                colb1 = lax.broadcasted_iota(
                    jnp.int32, (grp * ps, 1), 0) // ps
                colv = jnp.zeros((grp * ps, 1), jnp.bool_)
                for s in range(grp):
                    idx = jnp.minimum(gi * grp + s, batch_size - 1)
                    b = order_ref[idx]
                    live = gi * grp + s < nrows
                    vcnt = jnp.where(
                        live,
                        jnp.clip(
                            lengths_ref[b] - tstart_ref[b] - pi * ps, 0, ps),
                        0,
                    )
                    qk = jnp.where(
                        (colb == s) & (colp >= vcnt), MASK_VALUE, qk)
                    colv = colv | ((colb1 == s) & (vcnt > 0))
                vc = jnp.where(colv, vc, 0)
                m_prev = mg_ref[:, :1]
                l_prev = lg_ref[:, :1]
                m_cur = jnp.max(qk, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_cur)
                p = jnp.exp(qk - m_next)
                l_cur = jnp.sum(p, axis=-1, keepdims=True)
                alpha = jnp.exp(m_prev - m_next)
                mg_ref[...] = jnp.broadcast_to(m_next, mg_ref.shape)
                lg_ref[...] = jnp.broadcast_to(
                    alpha * l_prev + l_cur, lg_ref.shape)
                pv = lax.dot_general(
                    p.astype(jnp.bfloat16), vc, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [GR, Xr] (cross rows contribute zero via masked p)
                accg_ref[...] = accg_ref[...] * alpha + pv

        lh = lg_ref[:, :1]
        if has_sinks:
            lh = lh + jnp.exp(sink_ref[:, :1] - mg_ref[:, :1])
        lh = jnp.where(lh == 0.0, 1.0, lh)
        on = accg_ref[...] / lh * hmask
        # extract the diagonal strips back to [GR, D] (static lane slices)
        od = on[:, :D]
        for h in range(1, kvh):
            od = od + on[:, h * D : (h + 1) * D]
        for s in range(grp):
            idx = jnp.minimum(gi * grp + s, batch_size - 1)
            b = order_ref[idx]

            @pl.when(gi * grp + s < nrows)
            def _store():
                o_ref[b] = od[s * BR : (s + 1) * BR].astype(o_ref.dtype)

        return _

    lax.fori_loop(0, ngroups, body, None)


def ragged_decode(*args, window: "jax.Array | int" = 0, **kw):
    """Dispatcher: a LITERAL window rides a static-window jit so the body's
    `isinstance(window, int)` specializations (mask-op elision for full
    attention, split-tail eligibility) actually fire.  Round-5 finding: as
    a plain dynamic jit arg, an explicitly-passed `window=0` reached the
    body as a tracer, so every decode call paid the window-mask ops and
    the split-tail path never engaged — only callers relying on the
    DEFAULT saw the static behavior."""
    if isinstance(window, (int, np.integer)):
        return _ragged_decode_sw(*args, window=int(window), **kw)
    return _ragged_decode_dw(*args, window=window, **kw)


def _ragged_decode_impl(
    q: jax.Array,  # [B, QS, QH, D] bf16
    kv_cache: jax.Array,  # [L, P, ps, 2, KVH*D]
    page_table: jax.Array,  # [B, pmax] int32
    lengths: jax.Array,  # [B] int32 TOTAL length incl. all QS new tokens
    layer: jax.Array | int,
    *,
    sm_scale: float,
    pages_per_chunk: int = 8,  # ppc=16 wins in isolation (676 vs 622 GB/s) but loses in-context (19.7 vs 18.7 ms/step)
    interpret: Optional[bool] = None,
    raw_layout: bool = False,  # q/out already [B, KVH, R, D] grouped
    window: jax.Array | int = 0,  # sliding window (0 = full); may be traced
    softcap: float = 0.0,  # attn-logit softcapping (Gemma2); 0 = off
    sinks: Optional[jax.Array] = None,  # [QH] f32 per-head sink logits
    alibi: Optional[jax.Array] = None,  # [QH] f32 ALiBi slopes (baichuan
    # 13B; applied as the per-KEY bias m*j — see ragged_decode_xla)
    want_stats: bool = False,  # also return (m, l) [B, QS, QH] softmax stats
    new_kv: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None,
    # (k_new [B, KVH, D], v_new [B, KVH, D], slots [B] i32) — fuse the
    # new token's pool write into this kernel (QS=1, split bf16 pools);
    # returns (out, kv_cache) instead of out.
    _split_tail: bool = True,  # internal: False = single-pass (no tail split)
) -> jax.Array:
    """Decode / spec-verify attention -> [B, QS, QH, D] f32.

    Token t of each sequence attends causally up to position
    lengths[b] - QS + t (its own position), and (window > 0) no further
    back than window tokens — chunks wholly below the window are SKIPPED
    (zero DMAs), so SWA layers cost O(window) regardless of context.
    lengths[b] = 0 marks a padded row (skipped).

    With `new_kv` the separate kv_write dispatch disappears: the kernel
    walks the PREVIOUS length-1 tokens, attends the new token's K/V from
    VMEM (merged as a one-token chunk at emit), and writes the pool rows
    by async copy overlapped with the walk (round-4 dispatch-fusion).
    """
    if interpret is None:
        interpret = pallas_interpret_default()
    import os as _os

    _ppc_env = _os.environ.get("SGLT_DECODE_PPC")
    from sglang_awq_tpu.mem_cache.kv_pool import pool_kind

    kind = pool_kind(kv_cache)
    wide = kind == "wide"  # [L, P, 2, ps, KVH*D]: one flat row per token
    split = kind == "split" or wide
    latent = kind == "latent"  # [L, P, ps, Xr]: one row per token, K == V
    ps_ = kv_cache.shape[3] if split else kv_cache.shape[2]
    if _ppc_env:
        pages_per_chunk = int(_ppc_env)
    elif pages_per_chunk == 8 and ps_ * 8 > 256:
        # measured sweet spot on v5e: ~256-token chunks (1 MB bf16 faces)
        # saturate the DMA pipeline (1040 GB/s pure-DMA vs 668 at 128);
        # smaller chunks starve it, larger ones lengthen the critical
        # path.  512-token wide chunks win ISOLATED (140 vs 190 us/layer)
        # but lose IN-CONTEXT (3793 vs 3908 tok/s, round-5 grid) — the
        # recurring isolated-vs-in-context inversion for big chunks.
        pages_per_chunk = max(1, 256 // ps_)
    if wide:
        L, P, _, ps, Xr = kv_cache.shape
        fc = 1
    elif split:
        L, P, _, ps, fc, Xr = kv_cache.shape  # fc = fcK, Xr = XrK
    elif latent:
        L, P, ps, Xr = kv_cache.shape
        fc = 1
    else:
        L, P, ps, fc, Xr = kv_cache.shape
    if raw_layout:
        B, KVH_, R_, D = q.shape
        QS, QH = 1, KVH_ * R_
    else:
        B, QS, QH, D = q.shape
    if wide:
        KVH = Xr // D
        assert Xr == KVH * D and QH % KVH == 0
    elif split:
        KVH = fc * Xr // D
        assert fc in (2, 4) and Xr * fc == KVH * D and QH % KVH == 0
        assert KVH % fc == 0, (KVH, fc)  # a head must not straddle classes
    elif latent:
        KVH = 1
        assert Xr == D and kv_cache.dtype == jnp.bfloat16, (
            "latent pool: row width must equal q width; bf16 only"
        )
    else:
        KVH = fc * Xr // (2 * D)
        assert fc in (2, 4) and Xr * fc == 2 * KVH * D and QH % KVH == 0
    G = QH // KVH
    # Row grouping: real head rows only (gp = G) once the total row count
    # gives Mosaic enough sublanes — every dot/softmax op scales with the
    # row count, and padding G=4 up to 8 rows doubled all of them.  The
    # old sublane-fill rule remains as an env A/B escape hatch.
    if _os.environ.get("SGLT_DECODE_GP") == "old":
        gp = G if QS * G >= 8 else 8 // QS
    elif QS * G * KVH >= 32:
        gp = G
    else:
        gp = G if QS * G >= 8 else 8 // QS  # sublane-fill the row dim
    if raw_layout:
        gp = q.shape[2]
        qg = q
    else:
        # [B, QS, KVH, G, D] -> [B, KVH, QS*gp, D]
        qg = q.reshape(B, QS, KVH, G, D)
        if gp != G:
            qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, gp - G), (0, 0)))
        qg = jnp.transpose(qg, (0, 2, 1, 3, 4)).reshape(B, KVH, QS * gp, D)

    pmax = page_table.shape[1]
    ppc = min(pages_per_chunk, pmax)
    if pmax % ppc != 0:
        pad = round_up(pmax, ppc) - pmax
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        pmax += pad
    n_chunks = pmax // ppc
    R = QS * gp

    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    lengths = jnp.asarray(lengths, jnp.int32)
    pt_flat = page_table.reshape(-1).astype(jnp.int32)
    ck = ppc * ps
    win = jnp.asarray(window, jnp.int32).reshape(1)
    fuse_new = new_kv is not None
    if fuse_new:
        assert split and QS == 1 and not want_stats, (
            "new_kv fusion: split pool, QS == 1, no stats"
        )
        assert not latent, "new_kv fusion: not supported for latent pools"
        assert kv_cache.dtype == jnp.bfloat16, "new_kv fusion: bf16 pools"
        k_new, v_new, wslots = new_kv
        knew_arr = k_new.astype(jnp.bfloat16).reshape(B, fc, Xr)
        vnew_arr = v_new.astype(jnp.bfloat16).reshape(B, fc, Xr)
        slots_arr = jnp.asarray(wslots, jnp.int32)
    else:
        knew_arr = jnp.zeros((8, 128), jnp.bfloat16)
        vnew_arr = knew_arr
        slots_arr = jnp.full((B,), -1, jnp.int32)
    # ---- split-tail decode (round 5) ----
    # Serving decode lengths almost always sit mid-chunk, and the single-
    # pass walk paid FULL-chunk masked compute for the tail (~30% of the
    # walk at bs=64/ctx~512).  Split: the main walk covers whole ck-token
    # chunks (lengths floored, returning softmax stats); a second page-
    # granular dispatch scores the % ck tail and merges by (m, l).
    # Full-attention layers only (a floored length would shift the
    # window/chunk low bound); sinks fold in at the tail's emit.
    if (
        _split_tail
        and QS == 1
        and split
        and not fuse_new
        and not want_stats
        and isinstance(window, (int, np.integer))
        and window == 0
        and alibi is None
        # tail kernel page-slices k_buf[slot, i]: Mosaic needs whole lane
        # tiles and sublane-aligned page rows (tiny test geometries fail)
        and Xr % 128 == 0
        and (ps * fc) % 16 == 0
        and _os.environ.get("SGLT_DECODE_TAILSPLIT", "1") != "0"
    ):
        flen = (lengths // ck) * ck
        o1, m1, l1 = ragged_decode(
            qg, kv_cache, page_table, flen, layer,
            sm_scale=sm_scale, pages_per_chunk=ppc, interpret=interpret,
            raw_layout=True, softcap=softcap, want_stats=True,
            _split_tail=False,
        )
        ntp = jnp.where(lengths > 0, (lengths - flen + ps - 1) // ps, 0)
        hm = ((flen > 0) & (lengths > 0)).astype(jnp.int32)
        nrows = jnp.sum(lengths > 0).astype(jnp.int32).reshape(1)
        ar_b = jnp.arange(B, dtype=jnp.int32)
        live_b = lengths > 0
        # stable live-first permutation WITHOUT a sort (XLA sort on [B]
        # cost ~2 us/layer): live row i goes to slot cumsum(live)-1, dead
        # rows fill the back half
        pos_b = jnp.where(
            live_b,
            jnp.cumsum(live_b) - 1,
            nrows[0] + jnp.cumsum(~live_b) - 1,
        )
        order = jnp.zeros((B,), jnp.int32).at[pos_b].set(ar_b)
        R = QS * gp
        if sinks is not None:
            sk = jnp.asarray(sinks, jnp.float32).reshape(KVH, G)
            if gp != G:
                sk = jnp.pad(sk, ((0, 0), (0, gp - G)), mode="edge")
            sk = sk.reshape(KVH * gp)
            sink_arr = jnp.broadcast_to(sk[:, None], (KVH * R, 128))
        else:
            sink_arr = jnp.zeros((8, 128), jnp.float32)
        BR = KVH * R
        grp_env = _os.environ.get("SGLT_TAILBATCH_G")
        grp = int(grp_env) if grp_env else max(1, 128 // BR)
        if (
            wide
            and kv_cache.dtype == jnp.bfloat16
            and grp > 1
            and B >= grp
            and BR % 8 == 0
            and _os.environ.get("SGLT_DECODE_TAILBATCH", "1") != "0"
        ):
            GR = grp * BR
            sink_b = (
                jnp.tile(sink_arr, (grp, 1)) if sinks is not None
                else jnp.zeros((8, 128), jnp.float32)
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=8,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((B, BR, D), lambda g, *_: (0, 0, 0)),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec((B, BR, D), lambda g, *_: (0, 0, 0)),
                    pl.BlockSpec((B, BR, 128), lambda g, *_: (0, 0, 0)),
                    pl.BlockSpec((B, BR, 128), lambda g, *_: (0, 0, 0)),
                    pl.BlockSpec(
                        (sink_b.shape[0], 128), lambda g, *_: (0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (B, BR, D), lambda g, *_: (0, 0, 0)),
                scratch_shapes=[
                    pltpu.VMEM((GR, D), jnp.bfloat16),
                    pltpu.VMEM((GR, D), jnp.float32),
                    pltpu.VMEM((GR, Xr), jnp.bfloat16),
                    pltpu.VMEM((GR, 128), jnp.float32),
                    pltpu.VMEM((GR, 128), jnp.float32),
                    pltpu.VMEM((GR, Xr), jnp.float32),
                    pltpu.VMEM((2, ppc, grp, ps, Xr), kv_cache.dtype),
                    pltpu.VMEM((2, ppc, grp, ps, Xr), kv_cache.dtype),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ],
            )
            kernel = functools.partial(
                _decode_tail_kernel_batched,
                batch_size=B, grp=grp, tpb=ppc, pmax=pmax,
                sm_scale=sm_scale, kvh=KVH, r=R, softcap=float(softcap),
                has_sinks=sinks is not None, interpret=bool(interpret),
            )
            out = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((B, BR, D), jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",),
                    vmem_limit_bytes=100 * 1024 * 1024,
                ),
                interpret=interpret,
            )(
                layer, lengths, flen, ntp, hm, order, nrows, pt_flat,
                qg.reshape(B, BR, D), kv_cache,
                o1.reshape(B, BR, D), m1, l1, sink_b,
            ).reshape(B, KVH, R, D)
            if raw_layout:
                return out
            out = out.reshape(B, KVH, QS, gp, D)[:, :, :, :G, :]
            out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, QS, QH, D)
            return out
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
                pl.BlockSpec((B, KVH * R, 128), lambda g, *_: (0, 0, 0)),
                pl.BlockSpec((B, KVH * R, 128), lambda g, *_: (0, 0, 0)),
                pl.BlockSpec(
                    (sink_arr.shape[0], 128), lambda g, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KVH * R, Xr), jnp.bfloat16),
                pltpu.VMEM((KVH * R, 128), jnp.float32),
                pltpu.VMEM((KVH * R, 128), jnp.float32),
                pltpu.VMEM((KVH * R, Xr), jnp.float32),
                pltpu.VMEM((KVH * R, fc * ps), jnp.float32),
                pltpu.VMEM((8, fc * ps), jnp.int32),
                (pltpu.VMEM((4, ppc, ps, Xr), kv_cache.dtype) if wide
                 else pltpu.VMEM((4, ppc, ps, fc, Xr), kv_cache.dtype)),
                (pltpu.VMEM((4, ppc, ps, Xr), kv_cache.dtype) if wide
                 else pltpu.VMEM((4, ppc, ps, fc, Xr), kv_cache.dtype)),
                pltpu.SemaphoreType.DMA((4, 2)),
            ],
        )
        kernel = functools.partial(
            _decode_tail_kernel,
            batch_size=B, tpp=ppc, pmax=pmax, sm_scale=sm_scale,
            gp=gp, kvh=KVH, softcap=float(softcap),
            has_sinks=sinks is not None, interpret=bool(interpret),
            wide=wide,
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((B, KVH, R, D), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(
            layer, lengths, flen, ntp, hm, order, nrows, pt_flat,
            qg, kv_cache, o1, m1, l1, sink_arr,
        )
        if raw_layout:
            return out
        out = out.reshape(B, KVH, QS, gp, D)[:, :, :, :G, :]
        out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, QS, QH, D)
        return out

    # window > 0: the earliest position any query can see is
    # lengths - (QS-1) - window; chunks wholly below it never load
    lowest = jnp.maximum(lengths - (QS - 1) - win[0], 0)
    s0 = jnp.where(win[0] > 0, lowest // ck, 0).astype(jnp.int32)
    if fuse_new:
        # the kernel walks only the PREVIOUS length-1 tokens; rows with
        # nothing to walk still take one (fully masked) chunk so the
        # new-token merge + write still run at their emit
        lw = jnp.maximum(lengths - 1, 0)
        nck = jnp.maximum((lw + (ck - 1)) // ck - s0, 1)
        nck = jnp.where(lengths > 0, nck, 0)
        walk_lengths = lw
    else:
        nck = (lengths + (ck - 1)) // ck - jnp.where(lengths > 0, s0, 0)
        nck = jnp.where(lengths > 0, nck, 0)
        walk_lengths = lengths
    total = jnp.sum(nck).reshape(1)
    # nlive[i] = first live row >= i (B if none): the megaloop's advance
    # is one scalar load instead of an O(B) scan.
    vals = jnp.where(lengths > 0, jnp.arange(B, dtype=jnp.int32), B)
    nlive = jnp.concatenate(
        [lax.cummin(vals[::-1])[::-1], jnp.full((1,), B, jnp.int32)]
    )

    # per-row sink logits: row h*R + t*gp + g holds sinks[h*G + g]
    # (edge-padded over the gp-G filler rows, tiled over the QS spans)
    if sinks is not None:
        assert not raw_layout, "sinks + raw_layout not supported"
        sk = jnp.asarray(sinks, jnp.float32).reshape(KVH, G)
        if gp != G:
            sk = jnp.pad(sk, ((0, 0), (0, gp - G)), mode="edge")
        sk = jnp.tile(sk[:, None, :], (1, QS, 1)).reshape(KVH * R)
        sink_arr = jnp.broadcast_to(sk[:, None], (KVH * R, 128))
    else:
        sink_arr = jnp.zeros((8, 128), jnp.float32)
    srows = sink_arr.shape[0]
    if alibi is not None:
        assert split or latent or wide, (
            "ALiBi: split/wide/latent pools only (combined falls back to "
            "ragged_decode_xla)")
        assert not raw_layout and not fuse_new
        al = jnp.asarray(alibi, jnp.float32).reshape(KVH, G)
        if gp != G:
            al = jnp.pad(al, ((0, 0), (0, gp - G)), mode="edge")
        al = jnp.tile(al[:, None, :], (1, QS, 1)).reshape(KVH * R)
        alibi_arr = jnp.broadcast_to(al[:, None], (KVH * R, 128))
    else:
        alibi_arr = jnp.zeros((8, 128), jnp.float32)
    arows = alibi_arr.shape[0]

    common_scratch = [
        pltpu.VMEM((KVH * R, Xr), jnp.bfloat16),
        pltpu.VMEM((KVH * R, 128), jnp.float32),
        pltpu.VMEM((KVH * R, 128), jnp.float32),
        pltpu.VMEM((KVH * R, Xr), jnp.float32),
        pltpu.VMEM((KVH * R, fc * ck), jnp.float32),
        pltpu.VMEM((8, fc * ck), jnp.int32),
        pltpu.VMEM((KVH * R, 128), jnp.int32),
    ]
    if wide:
        # 4-dim face buffers: a [.., 1, Xr] second-minor of 1 would pad to
        # a whole sublane tile in VMEM
        scratch = common_scratch + [
            pltpu.VMEM((2, ppc, ps, Xr), kv_cache.dtype),
            pltpu.VMEM((2, ppc, ps, Xr), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        assert not fuse_new, "new_kv fusion: classed split only (row writes)"
    elif split:
        scratch = common_scratch + [
            pltpu.VMEM((2, ppc, ps, fc, Xr), kv_cache.dtype),
            pltpu.VMEM((2, ppc, ps, fc, Xr), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
        if fuse_new:
            scratch = scratch + [pltpu.SemaphoreType.DMA]
    elif latent:
        scratch = common_scratch + [
            pltpu.VMEM((2, ppc, ps, Xr), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ]
    else:
        scratch = common_scratch + [
            pltpu.VMEM((2, ppc, ps, fc, Xr), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    knew_spec = (
        pl.BlockSpec((B, fc, Xr), lambda g, *_: (0, 0, 0))
        if fuse_new
        else pl.BlockSpec((8, 128), lambda g, *_: (0, 0))
    )
    if fuse_new:
        out_specs = [
            pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ]
    else:
        out_specs = pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            knew_spec,
            knew_spec,
            pl.BlockSpec((srows, 128), lambda g, *_: (0, 0)),
            pl.BlockSpec((arows, 128), lambda g, *_: (0, 0)),
        ],
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    # static window=0 (no SWA layer) drops the window mask ops entirely
    has_window = not (isinstance(window, (int, np.integer)) and window == 0)
    if want_stats:
        assert split, "want_stats: split-pool decode only"
        base = _decode_kernel_split_with_stats
    else:
        base = _decode_kernel_split if (split or latent) else _decode_kernel
    kernel = functools.partial(
        base,
        batch_size=B,
        pages_per_chunk=ppc,
        pmax=pmax,
        sm_scale=sm_scale,
        q_span=QS,
        gp=gp,
        kvh=KVH,
        softcap=float(softcap),
        has_window=has_window,
        has_sinks=sinks is not None,
        interpret=bool(interpret),
        **({"has_alibi": True} if alibi is not None else {}),
        **({"fuse_new": True} if fuse_new else {}),
        **({"latent": True} if latent else {}),
        **({"wide": True} if wide else {}),
    )
    if want_stats:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=9,
            grid=(1,),
            in_specs=grid_spec.in_specs,
            out_specs=[
                pl.BlockSpec((B, KVH, R, D), lambda g, *_: (0, 0, 0, 0)),
                pl.BlockSpec((B, KVH * R, 128), lambda g, *_: (0, 0, 0)),
                pl.BlockSpec((B, KVH * R, 128), lambda g, *_: (0, 0, 0)),
            ],
            scratch_shapes=scratch,
        )
        out_shape = [
            jax.ShapeDtypeStruct((B, KVH, R, D), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH * R, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, KVH * R, 128), jnp.float32),
        ]
    elif fuse_new:
        out_shape = [
            jax.ShapeDtypeStruct((B, KVH, R, D), jnp.float32),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ]
    else:
        out_shape = jax.ShapeDtypeStruct((B, KVH, R, D), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        # scalar-prefetch args count toward alias indices: 9 scalars, then
        # qg (9), kv_cache (10), knew (11), vnew (12), sink (13)
        **({"input_output_aliases": {10: 1}} if fuse_new else {}),
        interpret=interpret,
    )(
        layer,
        win,
        walk_lengths,
        s0,
        nck,
        nlive,
        total,
        pt_flat,
        slots_arr,
        qg,
        kv_cache,
        knew_arr,
        vnew_arr,
        sink_arr,
        alibi_arr,
    )
    if fuse_new:
        out, kv_cache = out
    if want_stats:
        out, m_raw, l_raw = out
        if raw_layout:
            return out, m_raw, l_raw
        # row h*R + t*gp + g -> [B, QS, QH]
        stats = []
        for raw in (m_raw, l_raw):
            st = raw[:, :, 0].reshape(B, KVH, QS, gp)[:, :, :, :G]
            stats.append(jnp.transpose(st, (0, 2, 1, 3)).reshape(B, QS, QH))
        out = out.reshape(B, KVH, QS, gp, D)[:, :, :, :G, :]
        out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, QS, QH, D)
        return out, stats[0], stats[1]
    if raw_layout:
        return (out, kv_cache) if fuse_new else out
    out = out.reshape(B, KVH, QS, gp, D)[:, :, :, :G, :]
    out = jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, QS, QH, D)
    return (out, kv_cache) if fuse_new else out


_RD_STATICS = ("sm_scale", "pages_per_chunk", "interpret", "raw_layout",
               "softcap", "want_stats", "_split_tail")
_ragged_decode_sw = functools.partial(
    jax.jit, static_argnames=_RD_STATICS + ("window",)
)(_ragged_decode_impl)
_ragged_decode_dw = functools.partial(
    jax.jit, static_argnames=_RD_STATICS
)(_ragged_decode_impl)


# ---------------------------------------------------------------------------
# ragged extend kernels: batched multi-request prefill / mixed batches
# ---------------------------------------------------------------------------


def _extend_kernel_split(
    # scalar prefetch
    layer_ref,  # [1]
    window_ref,  # [1] sliding window (0 = full attention)
    kvlens_ref,  # [B] total kv length (prefix + new)
    qlens_ref,  # [B] live new tokens (0 = padded row)
    qbbase_ref,  # [B] first q block of each sequence (cu_qpad // BQ)
    pt_ref,  # [B * pmax]
    buf_idx_ref,  # [1] mutable
    init_ref,  # [1] mutable
    # inputs
    q_ref,  # [BQ, QH, D]
    kv_hbm_ref,  # [L, P, 2, ps, fcK, XrK] (ANY)
    sink_ref,  # [KVH*G or 8, 128] f32 per-head sink logits (dummy when off)
    alibi_ref,  # [KVH*G or 8, 128] f32 per-head ALiBi slopes (dummy)
    # output
    o_ref,  # [BQ, QH, D] f32
    # scratch: m, l, acc, k_buf [2, ppc, ps, fcK, XrK], (v_buf), sem
    *scratch,
    batch_size: int,
    bq: int,
    pages_per_chunk: int,
    pmax: int,
    sm_scale: float,
    kvh: int,
    g: int,
    softcap: float,
    has_sinks: bool,
    interpret: bool,
    has_alibi: bool = False,
    latent: bool = False,  # 4-dim latent pool [L, P, ps, Xr]: K == V
    wide: bool = False,  # 5-dim wide pool [L, P, 2, ps, KVH*D]: fcK == 1
):
    """Split-pool ragged extend: the _extend_kernel walk, but each head's
    qk dot contracts only the K chunk's lane slice and the PV dot hits the
    V chunk directly (no parity shift).  latent: one row per token serves
    as both K and V (MLA single-copy cache)."""
    b, qb, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    if latent:
        m_ref, l_ref, acc_ref, k_buf, sem = scratch
        v_buf = k_buf
    else:
        m_ref, l_ref, acc_ref, k_buf, v_buf, sem = scratch
    ps = k_buf.shape[2]
    ck = pages_per_chunk * ps
    fck = 1 if (latent or wide) else k_buf.shape[3]
    hph = kvh // fck  # heads per class row

    def limit_of(bb, qbb):
        q_len = qlens_ref[bb]
        kv_len = kvlens_ref[bb]
        return jnp.minimum(kv_len, kv_len - q_len + (qbb + 1) * bq)

    q_len = qlens_ref[b]
    limit = limit_of(b, qb)
    live = jnp.logical_and(qb * bq < q_len, c * ck < limit)

    def next_block(b, qb, c):
        def advance_qb():
            nqb = qb + 1

            def advance_b():
                nb = b + 1
                nb = lax.fori_loop(
                    0,
                    batch_size,
                    lambda _, x: jnp.where(
                        jnp.logical_and(
                            x < batch_size,
                            qlens_ref[lax.clamp(0, x, batch_size - 1)] == 0,
                        ),
                        x + 1,
                        x,
                    ),
                    nb,
                )
                return (nb, 0, 0)

            return lax.cond(
                nqb * bq < qlens_ref[b], lambda: (b, nqb, 0), advance_b
            )

        return lax.cond(c * ck < limit_of(b, qb), lambda: (b, qb, c), advance_qb)

    def live_pages(bb, qbb, cc):
        n = limit_of(bb, qbb) - cc * ck + (ps - 1)
        return lax.div(jnp.maximum(n, 0), ps)

    def start_copy(bb, qbb, cc, slot):
        layer = layer_ref[0]
        npg = live_pages(bb, qbb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                page = pt_ref[bb * pmax + cc * pages_per_chunk + i]
                if latent:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[layer, page], k_buf.at[slot, i],
                        sem.at[slot, 0],
                    ).start()
                else:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[layer, page, 0], k_buf.at[slot, i],
                        sem.at[slot, 0],
                    ).start()
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[layer, page, 1], v_buf.at[slot, i],
                        sem.at[slot, 1],
                    ).start()

    def wait_copy(bb, qbb, cc, slot):
        npg = live_pages(bb, qbb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                if latent:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0], k_buf.at[slot, i], sem.at[slot, 0]
                    ).wait()
                else:
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0, 0], k_buf.at[slot, i],
                        sem.at[slot, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0, 0], v_buf.at[slot, i],
                        sem.at[slot, 1],
                    ).wait()

    @pl.when(live)
    def _live():
        slot = buf_idx_ref[0]

        @pl.when(init_ref[0] == 1)
        def _first():
            k_buf[...] = jnp.zeros_like(k_buf)
            v_buf[...] = jnp.zeros_like(v_buf)
            start_copy(b, qb, c, slot)

        init_ref[0] = 0

        @pl.when(c == 0)
        def _init_state():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        nb, nqb, nc = next_block(b, qb, c + 1)

        @pl.when(nb < batch_size)
        def _prefetch():
            nslot = 1 - slot
            start_copy(nb, nqb, nc, nslot)
            buf_idx_ref[0] = nslot

        wait_copy(b, qb, c, slot)
        d = q_ref.shape[-1]
        kc = k_buf[slot].reshape(fck * ck, k_buf.shape[-1])
        vc = kc if latent else v_buf[slot].reshape(fck * ck, v_buf.shape[-1])
        if kc.dtype != jnp.bfloat16:
            kc = chunk_to_bf16(kc)
            vc = kc if latent else chunk_to_bf16(vc)
        prefix = kvlens_ref[b] - q_len
        if has_alibi:
            jcol = lax.broadcasted_iota(jnp.int32, (1, fck * ck), 1)
            posf = (c * ck + jcol // fck).astype(jnp.float32)
        masks = [None] * fck  # one per class row (heads share within class)
        for h in range(kvh):
            ch = h // hph  # class row holding this head's K/V
            qh = q_ref[:, h * g : (h + 1) * g, :].reshape(bq * g, d)
            hl = (h % hph) * d
            kh = kc[:, hl : hl + d]  # [fcK*ck, D] lane slice
            qk = lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [BQ*G, fcK*ck]
            qk = qk * sm_scale
            if softcap:
                qk = softcap * jnp.tanh(qk / softcap)
            if has_alibi:
                # per-KEY ALiBi bias m*j (query term cancels in softmax)
                al = alibi_ref[h * g : (h + 1) * g, :1]  # [g, 1]
                al = jnp.broadcast_to(
                    al.reshape(1, g, 1), (bq, g, 1)
                ).reshape(bq * g, 1)
                qk = qk + al * posf
            if masks[ch] is None:
                j = lax.broadcasted_iota(jnp.int32, qk.shape, 1)
                pos = c * ck + j // fck
                right_class = (j % fck) == ch
                t = lax.broadcasted_iota(jnp.int32, qk.shape, 0) // g
                q_pos = prefix + qb * bq + t
                win = window_ref[0]
                cs = jnp.maximum(-win, 1)
                low = jnp.where(
                    win > 0, q_pos - win + 1,
                    jnp.where(win < 0, (q_pos // cs) * cs, -(1 << 30)),
                )
                masks[ch] = jnp.logical_and(
                    jnp.logical_and(pos <= q_pos, pos >= low), right_class
                )
            qk = jnp.where(masks[ch], qk, MASK_VALUE)

            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_cur = jnp.max(qk, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(qk - m_next)
            l_cur = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_next)
            m_ref[h] = jnp.broadcast_to(m_next, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape[1:])

            # probabilities are nonzero only at this head's class columns,
            # so the dot picks exactly the matching V rows — no lane shift
            pv = lax.dot_general(
                p.astype(jnp.bfloat16),
                vc[:, hl : hl + d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[h] = acc_ref[h] * alpha + pv

            @pl.when((c + 1) * ck >= limit)
            def _emit():
                lh = l_ref[h, :, :1]
                if has_sinks:
                    sl = sink_ref[h * g : (h + 1) * g, :1]  # [g, 1]
                    sl = jnp.broadcast_to(
                        sl.reshape(1, g, 1), (bq, g, 1)
                    ).reshape(bq * g, 1)
                    lh = lh + jnp.exp(sl - m_ref[h, :, :1])
                lh = jnp.where(lh == 0.0, 1.0, lh)
                o_ref[:, h * g : (h + 1) * g, :] = (
                    (acc_ref[h] / lh).reshape(bq, g, d).astype(o_ref.dtype)
                )


def _extend_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    window_ref,  # [1] sliding window (0 = full attention)
    kvlens_ref,  # [B] total kv length (prefix + new)
    qlens_ref,  # [B] live new tokens (0 = padded row)
    qbbase_ref,  # [B] first q block of each sequence (cu_qpad // BQ)
    pt_ref,  # [B * pmax]
    buf_idx_ref,  # [1] mutable
    init_ref,  # [1] mutable
    # inputs
    q_ref,  # [BQ, QH, D]
    kv_hbm_ref,  # [L, P, ps, 2, KVH*D] (ANY)
    sink_ref,  # [KVH*G or 8, 128] f32 per-head sink logits (dummy when off)
    alibi_ref,  # dummy (ALiBi serves through the split-pool kernel)
    # output
    o_ref,  # [BQ, QH, D] f32
    # scratch
    m_ref,  # [KVH, BQ*G, 128] f32
    l_ref,
    acc_ref,  # [KVH, BQ*G, D] f32
    kv_buf,  # [2, ppc, ps, 2, KVH*D]
    sem,
    *,
    batch_size: int,
    bq: int,
    pages_per_chunk: int,
    pmax: int,
    sm_scale: float,
    kvh: int,
    g: int,
    softcap: float,
    has_sinks: bool,
    interpret: bool,
):
    b, qb, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    ps = kv_buf.shape[2]
    ck = pages_per_chunk * ps
    fc = kv_buf.shape[3]  # face rows per token (2 bf16 / 4 fp8-int8)
    half = fc // 2
    hph = kvh // half  # heads per class row

    def limit_of(bb, qbb):
        q_len = qlens_ref[bb]
        kv_len = kvlens_ref[bb]
        # kv positions this q block may attend to (causal): prefix of the
        # block's LAST row + 1, clamped to the sequence's total kv length
        return jnp.minimum(kv_len, kv_len - q_len + (qbb + 1) * bq)

    q_len = qlens_ref[b]
    limit = limit_of(b, qb)
    live = jnp.logical_and(qb * bq < q_len, c * ck < limit)

    def next_block(b, qb, c):
        """First live (b', qb', c') at or after (b, qb, c), c-major order.
        Assumes (b, qb) was live; c may point past the block's last chunk."""

        def advance_qb():
            nqb = qb + 1

            def advance_b():
                nb = b + 1
                nb = lax.fori_loop(
                    0,
                    batch_size,
                    lambda _, x: jnp.where(
                        jnp.logical_and(
                            x < batch_size,
                            qlens_ref[lax.clamp(0, x, batch_size - 1)] == 0,
                        ),
                        x + 1,
                        x,
                    ),
                    nb,
                )
                return (nb, 0, 0)

            return lax.cond(
                nqb * bq < qlens_ref[b], lambda: (b, nqb, 0), advance_b
            )

        return lax.cond(c * ck < limit_of(b, qb), lambda: (b, qb, c), advance_qb)

    def live_pages(bb, qbb, cc):
        """Pages of chunk cc this q block can attend to (causal limit):
        the tail chunk is usually partial — skip its dead pages' DMAs."""
        n = limit_of(bb, qbb) - cc * ck + (ps - 1)
        return lax.div(jnp.maximum(n, 0), ps)

    def start_copy(bb, qbb, cc, slot):
        layer = layer_ref[0]
        npg = live_pages(bb, qbb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                page = pt_ref[bb * pmax + cc * pages_per_chunk + i]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[layer, page], kv_buf.at[slot, i], sem.at[slot]
                ).start()

    def wait_copy(bb, qbb, cc, slot):
        npg = live_pages(bb, qbb, cc)
        for i in range(pages_per_chunk):

            @pl.when(i < npg)
            def _():
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0, 0], kv_buf.at[slot, i], sem.at[slot]
                ).wait()

    @pl.when(live)
    def _live():
        slot = buf_idx_ref[0]

        @pl.when(init_ref[0] == 1)
        def _first():
            # see _decode_kernel: skipped tail pages must not read
            # uninitialized VMEM (NaN * 0 = NaN in the PV dot)
            kv_buf[...] = jnp.zeros_like(kv_buf)
            start_copy(b, qb, c, slot)

        init_ref[0] = 0

        @pl.when(c == 0)
        def _init_state():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        nb, nqb, nc = next_block(b, qb, c + 1)

        @pl.when(nb < batch_size)
        def _prefetch():
            nslot = 1 - slot
            start_copy(nb, nqb, nc, nslot)
            buf_idx_ref[0] = nslot

        wait_copy(b, qb, c, slot)
        d = q_ref.shape[-1]
        kvc = kv_buf[slot].reshape(fc * ck, kv_buf.shape[-1])  # [fc*ck, Xr]
        if kvc.dtype != jnp.bfloat16:
            kvc = chunk_to_bf16(kvc)
        prefix = kvlens_ref[b] - q_len
        masks = [None] * half  # one per class row (heads share within class)
        for h in range(kvh):
            ch = h // hph  # class row holding this head's K
            qh = q_ref[:, h * g : (h + 1) * g, :].reshape(bq * g, d)
            hl = (h % hph) * d
            kh = kvc[:, hl : hl + d]  # [fc*ck, D] lane slice
            qk = lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [BQ*G, fc*ck]
            qk = qk * sm_scale
            if softcap:  # Gemma2 attn-logit softcapping
                qk = softcap * jnp.tanh(qk / softcap)
            if masks[ch] is None:
                j = lax.broadcasted_iota(jnp.int32, qk.shape, 1)
                pos = c * ck + j // fc
                right_class = (j % fc) == ch
                t = lax.broadcasted_iota(jnp.int32, qk.shape, 0) // g
                q_pos = prefix + qb * bq + t  # absolute position of the row
                win = window_ref[0]
                cs = jnp.maximum(-win, 1)
                low = jnp.where(
                    win > 0, q_pos - win + 1,
                    jnp.where(win < 0, (q_pos // cs) * cs, -(1 << 30)),
                )
                masks[ch] = jnp.logical_and(
                    jnp.logical_and(pos <= q_pos, pos >= low), right_class
                )
            qk = jnp.where(masks[ch], qk, MASK_VALUE)

            m_prev = m_ref[h, :, :1]
            l_prev = l_ref[h, :, :1]
            m_cur = jnp.max(qk, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_cur)
            # masked cols underflow to exact +0.0 in exp — no re-zeroing
            p = jnp.exp(qk - m_next)
            l_cur = jnp.sum(p, axis=-1, keepdims=True)
            alpha = jnp.exp(m_prev - m_next)
            m_ref[h] = jnp.broadcast_to(m_next, m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape[1:])

            pv = lax.dot_general(
                _shiftk(p, half).astype(jnp.bfloat16),
                kh,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[h] = acc_ref[h] * alpha + pv

            @pl.when((c + 1) * ck >= limit)
            def _emit():
                lh = l_ref[h, :, :1]
                if has_sinks:
                    # per-head sink logit joins the denominator (GPT-OSS);
                    # row t*g + gi of head h uses sinks[h*G + gi]
                    sl = sink_ref[h * g : (h + 1) * g, :1]  # [g, 1]
                    sl = jnp.broadcast_to(
                        sl.reshape(1, g, 1), (bq, g, 1)
                    ).reshape(bq * g, 1)
                    lh = lh + jnp.exp(sl - m_ref[h, :, :1])
                lh = jnp.where(lh == 0.0, 1.0, lh)
                o_ref[:, h * g : (h + 1) * g, :] = (
                    (acc_ref[h] / lh).reshape(bq, g, d).astype(o_ref.dtype)
                )


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "pages_per_chunk", "interpret",
                     "softcap"),
)
def ragged_extend(
    q: jax.Array,  # [TQ, QH, D] bf16 token-major; each sequence's q rows
    #                occupy [qb_base[b]*BQ, qb_base[b]*BQ + q_lens[b])
    kv_cache: jax.Array,  # [L, P, ps, 2, KVH*D]
    page_table: jax.Array,  # [B, pmax] int32
    kv_lens: jax.Array,  # [B] int32 total kv length (prefix + new); 0 = pad
    q_lens: jax.Array,  # [B] int32 new tokens this step (0 = padded row)
    qb_base: jax.Array,  # [B] int32 first q block per sequence
    layer: jax.Array | int,
    *,
    sm_scale: float,
    block_q: int = 128,
    pages_per_chunk: int = 8,
    interpret: Optional[bool] = None,
    window: jax.Array | int = 0,  # sliding window (0 = full)
    softcap: float = 0.0,  # attn-logit softcapping (Gemma2); 0 = off
    sinks: Optional[jax.Array] = None,  # [QH] f32 per-head sink logits
    alibi: Optional[jax.Array] = None,  # [QH] f32 ALiBi slopes (per-key
    # m*j form; see ragged_decode_xla)
) -> jax.Array:
    """Batched ragged extend attention -> [TQ, QH, D] f32.

    ALL K/V — the prefix and this step's new tokens — is read from the pool
    (the new tokens' K/V must be written before calling).  Causal within the
    new chunk, full attention to the prefix.  Reference role:
    `extend_attention.py:542` qo_indptr ragged batch.
    """
    if interpret is None:
        interpret = pallas_interpret_default()
    TQ, QH, D = q.shape
    from sglang_awq_tpu.mem_cache.kv_pool import pool_kind

    kind = pool_kind(kv_cache)
    wide = kind == "wide"
    split = kind == "split" or wide
    latent = kind == "latent"  # [L, P, ps, Xr]: one row per token, K == V
    if wide:
        L, P, _, ps, Xr = kv_cache.shape
        fc = 1
        KVH = Xr // D
        assert Xr == KVH * D and QH % KVH == 0
    elif split:
        L, P, _, ps, fc, Xr = kv_cache.shape  # fc = fcK, Xr = XrK
        KVH = fc * Xr // D
        assert fc in (2, 4) and Xr * fc == KVH * D and QH % KVH == 0
        assert KVH % fc == 0, (KVH, fc)
    elif latent:
        L, P, ps, Xr = kv_cache.shape
        fc, KVH = 1, 1
        assert Xr == D and kv_cache.dtype == jnp.bfloat16, (
            "latent pool: row width must equal q width; bf16 only"
        )
    else:
        L, P, ps, fc, Xr = kv_cache.shape
        KVH = fc * Xr // (2 * D)
        assert fc in (2, 4) and Xr * fc == 2 * KVH * D and QH % KVH == 0
    G = QH // KVH
    BQ = block_q
    assert TQ % BQ == 0, (TQ, BQ)
    n_qblocks = TQ // BQ
    B = page_table.shape[0]

    pmax = page_table.shape[1]
    ppc = min(pages_per_chunk, pmax)
    if pmax % ppc != 0:
        pad = round_up(pmax, ppc) - pmax
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        pmax += pad
    n_chunks = pmax // ppc

    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)

    # One extra TRASH block past the real rows: dead grid steps (padded
    # rows, qb past a sequence's live blocks) map their q/o block there.
    # Mosaic flushes the output VMEM buffer whenever the mapped block index
    # changes (and at grid end) — if a dead step mapped to a real block,
    # that flush would overwrite real results with stale buffer content
    # (observed on hardware: padded rows with qb_base=0 re-flushed block 0).
    q = jnp.pad(q, ((0, BQ), (0, 0), (0, 0)))

    def q_index(b, qb, c, layer_r, window_r, kvlens_r, qlens_r, qbbase_r, *_):
        live = qb * BQ < qlens_r[b]
        idx = jnp.where(live, qbbase_r[b] + qb, n_qblocks)
        return (jnp.minimum(idx, n_qblocks), 0, 0)

    if sinks is not None:
        sk = jnp.asarray(sinks, jnp.float32).reshape(KVH * G)
        sink_arr = jnp.broadcast_to(sk[:, None], (KVH * G, 128))
    else:
        sink_arr = jnp.zeros((8, 128), jnp.float32)
    srows = sink_arr.shape[0]
    if alibi is not None:
        assert split or latent, (
            "ALiBi: split/wide/latent pools only (combined falls back to "
            "ragged_extend_xla)")
        al = jnp.asarray(alibi, jnp.float32).reshape(KVH * G)
        alibi_arr = jnp.broadcast_to(al[:, None], (KVH * G, 128))
    else:
        alibi_arr = jnp.zeros((8, 128), jnp.float32)
    arows = alibi_arr.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(B, n_qblocks, n_chunks),
        in_specs=[
            pl.BlockSpec((BQ, QH, D), q_index),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((srows, 128), lambda *a: (0, 0)),
            pl.BlockSpec((arows, 128), lambda *a: (0, 0)),
        ],
        out_specs=pl.BlockSpec((BQ, QH, D), q_index),
        scratch_shapes=[
            pltpu.VMEM((KVH, BQ * G, 128), jnp.float32),
            pltpu.VMEM((KVH, BQ * G, 128), jnp.float32),
            pltpu.VMEM((KVH, BQ * G, D), jnp.float32),
        ] + (
            [
                pltpu.VMEM((2, ppc, ps, Xr), kv_cache.dtype),
                pltpu.VMEM((2, ppc, ps, Xr), kv_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ]
            if wide
            else [
                pltpu.VMEM((2, ppc, ps, fc, Xr), kv_cache.dtype),
                pltpu.VMEM((2, ppc, ps, fc, Xr), kv_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
            ]
            if split
            else (
                [
                    pltpu.VMEM((2, ppc, ps, Xr), kv_cache.dtype),
                    pltpu.SemaphoreType.DMA((2, 2)),
                ]
                if latent
                else [
                    pltpu.VMEM((2, ppc, ps, fc, Xr), kv_cache.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ]
            )
        ),
    )
    kernel = functools.partial(
        _extend_kernel_split if (split or latent) else _extend_kernel,
        batch_size=B,
        bq=BQ,
        pages_per_chunk=ppc,
        pmax=pmax,
        sm_scale=sm_scale,
        kvh=KVH,
        g=G,
        softcap=float(softcap),
        has_sinks=sinks is not None,
        interpret=bool(interpret),
        **({"has_alibi": True} if alibi is not None else {}),
        **({"latent": True} if latent else {}),
        **({"wide": True} if wide else {}),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((TQ + BQ, QH, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(window, jnp.int32).reshape(1),
        jnp.asarray(kv_lens, jnp.int32),
        jnp.asarray(q_lens, jnp.int32),
        jnp.asarray(qb_base, jnp.int32),
        page_table.reshape(-1).astype(jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), jnp.int32),
        q,
        kv_cache,
        sink_arr,
        alibi_arr,
    )
    return out[:TQ]


# ---------------------------------------------------------------------------
# XLA reference implementations (CPU tests / non-TPU fallback)
# ---------------------------------------------------------------------------


def _gather_seq(kv_cache, page_table, layer, head_dim):
    """[B, S, KVH, D] x2 from the pool (S = pmax * ps), either layout."""
    layer = jnp.asarray(layer, jnp.int32)
    kvl = jax.lax.dynamic_index_in_dim(kv_cache, layer, 0, keepdims=False)
    g = kvl[page_table]
    B = page_table.shape[0]
    if kv_cache.ndim == 4:  # latent [L, P, ps, Xr]: one row, K == V
        g = g.reshape(B, -1, 1, kv_cache.shape[-1])
        return g, g
    if kv_cache.ndim == 6:  # split [L, P, 2, ps, fcK, XrK]
        _, _, _, ps, fck, XrK = kv_cache.shape
        KVH = fck * XrK // head_dim
        g = jnp.moveaxis(g, 2, 3)  # [B, pmax, ps, 2, fcK, XrK]
        g = g.reshape(B, -1, 2, KVH, head_dim)
        return g[:, :, 0], g[:, :, 1]
    from sglang_awq_tpu.mem_cache.kv_pool import pool_kind

    if pool_kind(kv_cache) == "wide":  # [L, P, 2, ps, KVH*D]
        Xr = kv_cache.shape[-1]
        KVH = Xr // head_dim
        g = jnp.moveaxis(g, 2, 3)  # [B, pmax, ps, 2, Xr]
        g = g.reshape(B, -1, 2, KVH, head_dim)
        return g[:, :, 0], g[:, :, 1]
    L, P, ps, fc, Xr = kv_cache.shape
    KVH = fc * Xr // (2 * head_dim)
    half = fc // 2
    # classes: K rows first, V rows second; concat class lanes -> KVH*D
    g = g.reshape(B, -1, 2, half * Xr)
    g = g.reshape(B, g.shape[1], 2, KVH, head_dim)
    return g[:, :, 0], g[:, :, 1]


def ragged_decode_xla(
    q: jax.Array,  # [B, QS, QH, D]
    kv_cache: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,
    layer: jax.Array | int,
    *,
    sm_scale: float,
    window: jax.Array | int = 0,
    softcap: float = 0.0,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,  # [QH] f32 ALiBi slopes: the
    # m*(j-i) bias reduces to a PER-KEY bias m*j (the -m*i term is
    # constant per query row and cancels in softmax)
    want_stats: bool = False,
) -> jax.Array:
    B, QS, QH, D = q.shape
    from sglang_awq_tpu.mem_cache.kv_pool import pool_kind

    _kind = pool_kind(kv_cache)
    if _kind == "latent":  # one full-width row, K == V
        KVH = 1
    elif _kind == "wide":  # [L, P, 2, ps, KVH*D]
        KVH = kv_cache.shape[-1] // D
    else:
        fc = kv_cache.shape[-2]
        KVH = fc * kv_cache.shape[-1] // (
            D if kv_cache.ndim == 6 else 2 * D
        )
    G = QH // KVH
    kg, vg = _gather_seq(kv_cache, page_table, layer, D)  # [B, S, KVH, D]
    qg = q.reshape(B, QS, KVH, G, D)
    s = (
        jnp.einsum("btkgd,bskd->btkgs", qg.astype(jnp.float32), kg.astype(jnp.float32))
        * sm_scale
    )
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    if alibi is not None:
        al = jnp.asarray(alibi, jnp.float32).reshape(KVH, G)
        s = s + al[None, None, :, :, None] * jnp.arange(
            s.shape[-1], dtype=jnp.float32)
    S = s.shape[-1]
    key_pos = jnp.arange(S)[None, None, :]
    limit = (lengths[:, None] - (QS - 1) + jnp.arange(QS)[None, :])[:, :, None]
    mask = key_pos < limit  # [B, QS, S]
    win = jnp.asarray(window, jnp.int32)
    cs = jnp.maximum(-win, 1)
    low = jnp.where(win > 0, limit - win,
                    jnp.where(win < 0, ((limit - 1) // cs) * cs, -(1 << 30)))
    mask = mask & (key_pos >= low)
    s = jnp.where(mask[:, :, None, None, :], s, MASK_VALUE)
    if sinks is not None:
        # learned per-head sink logit joins the denominator only
        sk = jnp.asarray(sinks, jnp.float32).reshape(KVH, G)
        sk = jnp.broadcast_to(
            sk[None, None, :, :, None], (B, QS, KVH, G, 1)
        )
        p = jax.nn.softmax(jnp.concatenate([s, sk], axis=-1), axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("btkgs,bskd->btkgd", p, vg.astype(jnp.float32))
    if want_stats:
        m = jnp.max(s, axis=-1)  # [B, QS, KVH, G]
        l = jnp.sum(jnp.exp(s - m[..., None]), axis=-1)
        return (o.reshape(B, QS, QH, D), m.reshape(B, QS, QH),
                l.reshape(B, QS, QH))
    return o.reshape(B, QS, QH, D)


def ragged_extend_xla(
    q: jax.Array,  # [TQ, QH, D]
    kv_cache: jax.Array,
    page_table: jax.Array,
    kv_lens: jax.Array,
    q_lens: jax.Array,
    qb_base: jax.Array,
    layer: jax.Array | int,
    *,
    sm_scale: float,
    block_q: int = 128,
    window: jax.Array | int = 0,
    softcap: float = 0.0,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,  # [QH] f32 ALiBi slopes (per-key
    # m*j form; see ragged_decode_xla)
    spans: Optional[jax.Array] = None,  # [TQ] i32 image-span ids (0 = text):
    # tokens sharing a nonzero span attend each other BIDIRECTIONALLY
    # (Gemma3-mm image spans, reference gemma3_mm.py:110); spans never
    # split across extend chunks (scheduler invariant), so only in-chunk
    # keys need span identity
) -> jax.Array:
    """Per-sequence gather + masked softmax (test oracle; also the CPU
    serving path — jit-compatible, no python data-dependent control flow)."""
    TQ, QH, D = q.shape
    from sglang_awq_tpu.mem_cache.kv_pool import pool_kind

    _kind = pool_kind(kv_cache)
    if _kind == "latent":  # one full-width row, K == V
        KVH = 1
    elif _kind == "wide":  # [L, P, 2, ps, KVH*D]
        KVH = kv_cache.shape[-1] // D
    else:
        fc = kv_cache.shape[-2]
        KVH = fc * kv_cache.shape[-1] // (
            D if kv_cache.ndim == 6 else 2 * D
        )
    G = QH // KVH
    B = page_table.shape[0]
    kg, vg = _gather_seq(kv_cache, page_table, layer, D)  # [B, S, KVH, D]
    S = kg.shape[1]

    # map each q row to its sequence and in-sequence index
    starts = qb_base * block_q  # [B]
    row = jnp.arange(TQ)
    # seq of row r: the unique b with starts[b] <= r < starts[b] + q_lens[b]
    in_seq = (row[None, :] >= starts[:, None]) & (
        row[None, :] < (starts + jnp.maximum(q_lens, 0))[:, None]
    )  # [B, TQ]
    seq_of = jnp.argmax(in_seq, axis=0)  # [TQ] (0 when no seq: masked later)
    live_row = jnp.any(in_seq, axis=0)  # [TQ]
    idx_in_seq = row - starts[seq_of]
    q_pos = kv_lens[seq_of] - q_lens[seq_of] + idx_in_seq  # absolute position

    qg = q.reshape(TQ, KVH, G, D)
    kr = kg[seq_of]  # [TQ, S, KVH, D]
    vr = vg[seq_of]
    s = (
        jnp.einsum("tkgd,tskd->tkgs", qg.astype(jnp.float32), kr.astype(jnp.float32))
        * sm_scale
    )
    if softcap:
        s = softcap * jnp.tanh(s / softcap)
    if alibi is not None:
        al = jnp.asarray(alibi, jnp.float32).reshape(KVH, G)
        s = s + al[None, :, :, None] * jnp.arange(S, dtype=jnp.float32)
    key_pos = jnp.arange(S)[None, None, None, :]
    qp = q_pos[:, None, None, None]
    mask = key_pos <= qp
    win = jnp.asarray(window, jnp.int32)
    cs = jnp.maximum(-win, 1)
    low = jnp.where(win > 0, qp - win + 1,
                    jnp.where(win < 0, (qp // cs) * cs, -(1 << 30)))
    mask = mask & (key_pos >= low)
    if spans is not None:
        sp_q = jnp.asarray(spans, jnp.int32)
        plane = jnp.zeros((B, S), jnp.int32).at[
            seq_of, jnp.clip(q_pos, 0, S - 1)
        ].set(jnp.where(live_row, sp_q, 0), mode="drop")
        sp_k = plane[seq_of]  # [TQ, S]
        bidir = (sp_q[:, None] > 0) & (sp_k == sp_q[:, None])
        mask = mask | bidir[:, None, None, :]
    s = jnp.where(mask, s, MASK_VALUE)
    if sinks is not None:
        sk = jnp.asarray(sinks, jnp.float32).reshape(KVH, G)
        sk = jnp.broadcast_to(sk[None, :, :, None], (TQ, KVH, G, 1))
        p = jax.nn.softmax(jnp.concatenate([s, sk], axis=-1), axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("tkgs,tskd->tkgd", p, vr.astype(jnp.float32))
    o = jnp.where(live_row[:, None, None, None], o, 0.0)
    return o.reshape(TQ, QH, D)
