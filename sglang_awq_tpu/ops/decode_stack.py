"""Whole-stack decode megakernel: all L layers in ONE Pallas dispatch.

Round-3 measurements (benchmarks/bench_layer.py, abl_step.py) localized the
decode gap: the per-projection AWQ kernels run at ~76% MXU / ~1.2x their
max(DMA, MXU) floor, yet the layer stack costs 17.4 ms of a 19.0 ms step
against a ~10 ms all-streams roofline (3.5 GB weights + 4.3 GB KV + 0.5 GB
lm_head at ~820 GB/s).  The loss is BETWEEN kernels: ~11 dispatches/layer,
each Pallas call restarting its DMA pipeline cold (the first weight-chunk
fetch of every kernel is unhidden), XLA relayouts between them, and zero
overlap between the attention path's KV streaming and the GEMM path's
weight streaming.

This kernel is the reference CUDA-graph-whole-step equivalent rebuilt the
TPU way (reference role: `cuda_graph_runner.py:232` replay of the full
decode step; marlin k-group pipelining `csrc/gemm/marlin/marlin_template.h`):

  grid = (L, 1 + NI)       NI = MLP intermediate chunks
  phase i == 0  : input-norm -> fused AWQ qkv -> rope (in-kernel, lane-roll
                  form) -> KV-row writes (aliased pool, DMA per token) ->
                  ragged paged attention (the `_decode_kernel_split` walk,
                  manual double-buffered page DMAs) -> fused AWQ o-proj ->
                  residual -> post-norm
  phase i >= 1  : MLP intermediate chunk i-1: gate/up chunk dots -> act ->
                  down-chunk dot accumulated into a VMEM accumulator;
                  at i == NI the residual add closes the layer.

The residual stream, normed activations and attention state live in VMEM
scratch for the WHOLE stack — no HBM activation round trips, no dispatch
boundaries.  Mosaic's block pipeline prefetches phase (l, i+1)'s weight
blocks during phase (l, i): layer l+1's qkv streams while layer l's last
MLP chunk computes, and MLP chunk 0 streams while attention walks KV pages
— the two DMA streams that were serialized across kernel boundaries now
share the full HBM bandwidth continuously.

Eligibility (callers fall back to the per-op path otherwise): tp=1, pp=1,
QS=1 decode, split bf16 KV pool, pair-unpack AWQ weights on all four
projections, full-width rotary, no qk-norm / windows / softcap / sinks /
biases / LoRA / clip, dense SiLU-or-GELU MLP.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.ops.awq_matmul import pair_proj_chunk, scale_rows_per_tile
from sglang_awq_tpu.utils import pallas_interpret_default

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _rms(x, w, eps):
    """RMSNorm matching layers/norm.rms_norm (f32 math, bf16 out)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * lax.rsqrt(ms + eps) * w.astype(jnp.float32)).astype(
        jnp.bfloat16
    )


def _decode_stack_kernel(
    # scalar prefetch
    lengths_ref,  # [B] incl. the new token (0 = padded row)
    s0_ref,  # [B] zeros (full attention; kept for schedule-shape parity)
    nck_ref,  # [B] live chunks per row
    nlive_ref,  # [B+1] first live row >= b
    total_ref,  # [1]
    pt_ref,  # [B * pmax]
    slots_ref,  # [B] flat pool slot of the new token (<0 = skip)
    # inputs
    x_ref,  # [B, H] bf16 embedded tokens
    cosq_ref,  # [B*QH, D] f32 (per-head-row rope cos, duplicated halves)
    sinq_ref,  # [B*QH, D] f32 (sign-folded: [-sin | +sin])
    cosk_ref,  # [B*KVH, D] f32
    sink_ref,  # [B*KVH, D] f32
    innw_ref,  # [1, H] f32 input_layernorm weight (layer l)
    postw_ref,  # [1, H] f32 post_attention_layernorm weight
    qkv_qw_ref,  # [1, Kq/2, Nqkv] u8 pair layout
    qkv_s_ref,  # [1, ktq*srp, Nqkv] f32
    qkv_zb_ref,
    o_qw_ref,  # [1, (QH*D)/2, H]
    o_s_ref,
    o_zb_ref,
    g_qw_ref,  # [1, H/2, ci] gate chunk
    g_s_ref,
    g_zb_ref,
    u_qw_ref,  # [1, H/2, ci] up chunk
    u_s_ref,
    u_zb_ref,
    d_qw_ref,  # [1, ci/2, H] down chunk
    d_s_ref,
    d_zb_ref,
    kv_in_ref,  # aliased input (unused handle)
    # outputs
    xout_ref,  # [B, H] bf16 final hidden (pre final-norm)
    kv_hbm_ref,  # aliased out [L, P, 2, ps, fcK, XrK] (ANY)
    # scratch
    xres_ref,  # [B, H] bf16 residual stream
    xn_ref,  # [B, H] bf16 post-attention normed (MLP input)
    q2_ref,  # [B, KVH, G, D] bf16 roped+scaled q
    kst_ref,  # [B, fcK, XrK] pool-dtype staged K faces
    vst_ref,  # [B, fcK, XrK]
    ao_ref,  # [B, KVH, G, D] f32 attention out
    macc_ref,  # [B, H] f32 MLP accumulator
    qbd_ref,  # [KVH*G, XrK] bf16 block-diagonal q
    m_ref,  # [KVH*G, 128] f32
    l_ref,  # [KVH*G, 128] f32
    acc_ref,  # [KVH*G, XrK] f32
    cb_ref,  # [KVH*G, fcK*ck] f32 class bias, built once per layer
    tj_ref,  # [8, fcK*ck] i32 token index per column
    k_buf,  # [2, ppc, ps, fcK, XrK]
    v_buf,
    sem,  # [2, 2] chunk-DMA semaphores
    wsem,  # [1] KV-write semaphore
    *,
    B: int,
    H: int,
    QH: int,
    KVH: int,
    D: int,
    NI: int,
    L: int,
    pb_qkv: int,
    pb_o: int,
    pb_gu: int,
    pb_d: int,
    group_size: int,
    ppc: int,
    pmax: int,
    sm_scale: float,
    eps: float,
    act: str,
    num_slots: int,
    abl: str = "",
):
    l = pl.program_id(0)
    i = pl.program_id(1)
    G = QH // KVH
    ps = k_buf.shape[2]
    ck = ppc * ps
    fck = k_buf.shape[3]
    XrK = k_buf.shape[4]
    hph = KVH // fck  # heads per class row

    @pl.when(i == 0)
    def _attn_phase():
        @pl.when(l == 0)
        def _seed():
            xres_ref[...] = x_ref[...]
            # padded rows are never emitted by the attention walk; zero the
            # buffer once so they feed defined values into o-proj
            ao_ref[...] = jnp.zeros_like(ao_ref)

        xn0 = _rms(xres_ref[...], innw_ref[0], eps)  # [B, H] bf16

        qkv = pair_proj_chunk(
            xn0, qkv_qw_ref[0], qkv_s_ref[0], qkv_zb_ref[0],
            pack_block=pb_qkv, group_size=group_size,
        )  # [B, (QH + 2*KVH) * D] f32

        d2 = D // 2
        stage = "nostage" not in abl
        # rope, lane-roll form: out = x*[cos|cos] + concat(x2, x1)*[-sin|sin]
        # (bf16 BEFORE the reshape: the sublane/lane relayout at half bytes)
        q2 = qkv[:, : QH * D].astype(jnp.bfloat16).reshape(B * QH, D)
        if stage:
            q2 = q2 * cosq_ref[...] + (
                jnp.concatenate([q2[:, d2:], q2[:, :d2]], axis=1)
                * sinq_ref[...]
            )
            q2_ref[...] = (q2 * sm_scale).astype(jnp.bfloat16).reshape(
                B, KVH, G, D
            )
            k2 = qkv[:, QH * D : (QH + KVH) * D].astype(
                jnp.bfloat16).reshape(B * KVH, D)
            k2 = k2 * cosk_ref[...] + (
                jnp.concatenate([k2[:, d2:], k2[:, :d2]], axis=1)
                * sink_ref[...]
            )
            # face staging: rows (b*fcK + c), lanes (j*D + d) hold head
            # c*hph+j — the same linear element order, a pure reshape
            kst_ref[...] = k2.reshape(B, fck, XrK).astype(kst_ref.dtype)
            vst_ref[...] = (
                qkv[:, (QH + KVH) * D :].reshape(B, fck, XrK).astype(
                    vst_ref.dtype)
            )

        # write the new token's K/V rows (aliased pool), then WAIT: the
        # attention walk below re-reads the tail page that now holds them
        skip_writes = "nowrite" in abl or "noattn" in abl or not stage
        for b in range(B if not skip_writes else 0):
            s = slots_ref[b]

            @pl.when((s >= 0) & (s < num_slots))
            def _w(b=b, s=s):
                pltpu.make_async_copy(
                    kst_ref.at[b],
                    kv_hbm_ref.at[l, s // ps, 0, s % ps],
                    wsem,
                ).start()
                pltpu.make_async_copy(
                    vst_ref.at[b],
                    kv_hbm_ref.at[l, s // ps, 1, s % ps],
                    wsem,
                ).start()

        for b in range(B if not skip_writes else 0):
            s = slots_ref[b]

            @pl.when((s >= 0) & (s < num_slots))
            def _wt(b=b, s=s):
                for _ in range(2):
                    pltpu.make_async_copy(
                        kst_ref.at[0],
                        kv_hbm_ref.at[0, 0, 0, 0],
                        wsem,
                    ).wait()

        # ------------- ragged paged attention (decode walk) -------------
        @pl.when(l == 0)
        def _once():
            # layer-invariant state, built once per dispatch: dead-page
            # buffer slots must never feed NaN bit patterns into the dots
            # (later layers inherit finite, masked leftovers), and the
            # class-bias / token-index tables never change
            k_buf[...] = jnp.zeros_like(k_buf)
            v_buf[...] = jnp.zeros_like(v_buf)
            jc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 1)
            chc = lax.broadcasted_iota(jnp.int32, cb_ref.shape, 0) // (
                G * hph
            )
            cb_ref[...] = jnp.where((jc % fck) == chc, 0.0, MASK_VALUE)
            tj_ref[...] = (
                lax.broadcasted_iota(jnp.int32, tj_ref.shape, 1) // fck
            )

        total = total_ref[0]

        def live_pages(bb, cc):
            base = (s0_ref[bb] + cc) * ck
            n = lengths_ref[bb] - base + (ps - 1)
            return lax.div(jnp.maximum(n, 0), ps)

        def start_copy(bb, cc, slot):
            base = s0_ref[bb] + cc
            npg = live_pages(bb, cc)
            for pg in range(ppc):

                @pl.when(pg < npg)
                def _(pg=pg):
                    page = pt_ref[bb * pmax + base * ppc + pg]
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[l, page, 0], k_buf.at[slot, pg],
                        sem.at[slot, 0],
                    ).start()
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[l, page, 1], v_buf.at[slot, pg],
                        sem.at[slot, 1],
                    ).start()

        def wait_copy(bb, cc, slot):
            npg = live_pages(bb, cc)
            for pg in range(ppc):

                @pl.when(pg < npg)
                def _(pg=pg):
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0, 0], k_buf.at[slot, pg],
                        sem.at[slot, 0],
                    ).wait()
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[0, 0, 0], v_buf.at[slot, pg],
                        sem.at[slot, 1],
                    ).wait()

        def advance(bb, cc):
            return lax.cond(
                cc + 1 < nck_ref[jnp.minimum(bb, B - 1)],
                lambda: (bb, cc + 1),
                lambda: (nlive_ref[jnp.minimum(bb + 1, B)], jnp.int32(0)),
            )

        @pl.when((total > 0) & (total < (0 if "noattn" in abl else 1 << 30)))
        def _run():
            b0 = nlive_ref[0]
            start_copy(b0, 0, 0)

            def body(_, carry):
                b, c, nb, nc, slot = carry

                @pl.when(nb < B)
                def _pf():
                    start_copy(nb, nc, 1 - slot)

                wait_copy(b, c, slot)
                length = lengths_ref[b]

                @pl.when(c == 0)
                def _init_state():
                    m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
                    l_ref[...] = jnp.zeros_like(l_ref)
                    acc_ref[...] = jnp.zeros_like(acc_ref)
                    qbd_ref[...] = jnp.zeros_like(qbd_ref)
                    for h in range(KVH):
                        hl = (h % hph) * D
                        qbd_ref[h * G : (h + 1) * G, hl : hl + D] = q2_ref[
                            b, h
                        ]

                kc = k_buf[slot].reshape(fck * ck, XrK)
                vc = v_buf[slot].reshape(fck * ck, XrK)

                qk = lax.dot_general(
                    qbd_ref[...], kc, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [KVH*G, fcK*ck]
                qk = qk + cb_ref[...]
                base = (s0_ref[b] + c) * ck
                mask = tj_ref[:1] < (length - base)
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
                    for h in range(KVH):
                        hl = (h % hph) * D
                        ao_ref[b, h] = on[
                            h * G : (h + 1) * G, hl : hl + D
                        ].astype(ao_ref.dtype)

                nb2, nc2 = advance(nb, nc)
                return (nb, nc, nb2, nc2, 1 - slot)

            nb0, nc0 = advance(b0, jnp.int32(0))
            lax.fori_loop(
                0, total, body, (b0, jnp.int32(0), nb0, nc0, jnp.int32(0)),
                unroll=False,
            )

        # ------------- o proj + residual + post norm -------------
        af = ao_ref[...].astype(jnp.bfloat16).reshape(B, QH * D)
        oo = pair_proj_chunk(
            af, o_qw_ref[0], o_s_ref[0], o_zb_ref[0],
            pack_block=pb_o, group_size=group_size,
        )  # [B, H] f32
        xr = xres_ref[...].astype(jnp.float32) + oo
        xres_ref[...] = xr.astype(jnp.bfloat16)
        xn_ref[...] = _rms(xres_ref[...], postw_ref[0], eps)
        macc_ref[...] = jnp.zeros_like(macc_ref)

    @pl.when(i > 0)
    def _mlp_phase():
        if "nomlp" in abl:
            @pl.when(i == NI)
            def _close0():
                @pl.when(l == L - 1)
                def _out0():
                    xout_ref[...] = xres_ref[...]
            return
        xn = xn_ref[...]
        gate = pair_proj_chunk(
            xn, g_qw_ref[0], g_s_ref[0], g_zb_ref[0],
            pack_block=pb_gu, group_size=group_size,
        )  # [B, ci] f32
        up = pair_proj_chunk(
            xn, u_qw_ref[0], u_s_ref[0], u_zb_ref[0],
            pack_block=pb_gu, group_size=group_size,
        )
        if act == "silu":
            a = jax.nn.silu(gate) * up
        else:
            a = jax.nn.gelu(gate, approximate=True) * up
        macc_ref[...] += pair_proj_chunk(
            a.astype(jnp.bfloat16), d_qw_ref[0], d_s_ref[0], d_zb_ref[0],
            pack_block=pb_d, group_size=group_size,
        )

        @pl.when(i == NI)
        def _close():
            nx = (
                xres_ref[...].astype(jnp.float32) + macc_ref[...]
            ).astype(jnp.bfloat16)
            xres_ref[...] = nx

            @pl.when(l == L - 1)
            def _out():
                xout_ref[...] = nx


@functools.partial(
    jax.jit,
    static_argnames=(
        "pb_qkv", "pb_o", "pb_gu", "pb_d", "group_size", "sm_scale", "eps",
        "act", "qh", "kvh", "head_dim", "chunk_i", "pages_per_chunk",
        "interpret",
    ),
)
def decode_stack_step(
    x: jax.Array,  # [B, H] bf16 embedded tokens
    kv_cache: jax.Array,  # [L, P, 2, ps, fcK, XrK] split pool
    rope_tab: jax.Array,  # [Pmax, D] ([cos | sin]) full-width table
    positions: jax.Array,  # [B] int32
    slots: jax.Array,  # [B] int32 new-token pool slot (<0 = pad)
    page_table: jax.Array,  # [B, pmax] int32
    lengths: jax.Array,  # [B] int32 incl. new token (0 = pad)
    in_norm: jax.Array,  # [L, H] f32
    post_norm: jax.Array,  # [L, H] f32
    qkv_qw, qkv_s, qkv_zb,  # [L, H/2, Nqkv] u8 / strips f32
    o_qw, o_s, o_zb,
    gu_qw, gu_s, gu_zb,  # [L, H/2, 2I]
    d_qw, d_s, d_zb,  # [L, I/2, H]
    *,
    pb_qkv: int,
    pb_o: int,
    pb_gu: int,
    pb_d: int,
    group_size: int,
    sm_scale: float,
    eps: float,
    act: str,
    qh: int,
    kvh: int,
    head_dim: int,
    chunk_i: int = 2048,
    pages_per_chunk: int = 0,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """One decode step over the WHOLE layer stack -> (hidden [B, H], kv)."""
    if interpret is None:
        interpret = pallas_interpret_default()
    B, H = x.shape
    L, P, two, ps, fck, XrK = kv_cache.shape
    assert two == 2 and fck * XrK == kvh * head_dim
    QH, KVH, D = qh, kvh, head_dim
    Nqkv = (QH + 2 * KVH) * D
    I2 = gu_qw.shape[2]
    I = I2 // 2
    ci = min(chunk_i, I)
    while I % ci or ci % pb_d:
        ci //= 2
    NI = I // ci
    assert ci >= pb_d and I % ci == 0, (I, ci, pb_d)

    import os

    ppc = pages_per_chunk or int(os.environ.get("SGLT_DECODE_PPC", 0))
    if not ppc:
        ppc = max(1, 256 // ps)
    pmax = page_table.shape[1]
    ppc = min(ppc, pmax)
    if pmax % ppc:
        pad = ppc - pmax % ppc
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        pmax += pad
    ck = ppc * ps

    lengths = jnp.asarray(lengths, jnp.int32)
    s0 = jnp.zeros((B,), jnp.int32)
    nck = jnp.where(lengths > 0, (lengths + ck - 1) // ck, 0)
    total = jnp.sum(nck).reshape(1)
    vals = jnp.where(lengths > 0, jnp.arange(B, dtype=jnp.int32), B)
    nlive = jnp.concatenate(
        [lax.cummin(vals[::-1])[::-1], jnp.full((1,), B, jnp.int32)]
    )

    # rope rows (full-width rotary): per-head duplication is an XLA
    # broadcast; the sign fold bakes rotate-half's minus into sin
    cs = rope_tab[positions].astype(jnp.float32)  # [B, D]
    d2 = D // 2
    cos = jnp.concatenate([cs[:, :d2], cs[:, :d2]], axis=-1)  # [B, D]
    sin = jnp.concatenate([-cs[:, d2:], cs[:, d2:]], axis=-1)
    cosq = jnp.broadcast_to(cos[:, None, :], (B, QH, D)).reshape(B * QH, D)
    sinq = jnp.broadcast_to(sin[:, None, :], (B, QH, D)).reshape(B * QH, D)
    cosk = jnp.broadcast_to(cos[:, None, :], (B, KVH, D)).reshape(B * KVH, D)
    sink = jnp.broadcast_to(sin[:, None, :], (B, KVH, D)).reshape(B * KVH, D)

    _, srp = scale_rows_per_tile(pb_qkv, group_size)
    _, srp_o = scale_rows_per_tile(pb_o, group_size)
    _, srp_gu = scale_rows_per_tile(pb_gu, group_size)
    _, srp_d = scale_rows_per_tile(pb_d, group_size)
    sq_rows = (H // pb_qkv) * srp
    so_rows = (QH * D // pb_o) * srp_o
    sgu_rows = (H // pb_gu) * srp_gu
    sd_rows_chunk = (ci // pb_d) * srp_d

    G = QH // KVH

    nspec = [
        pl.BlockSpec((B, H), lambda l, i, *_: (0, 0)),
        pl.BlockSpec((B * QH, D), lambda l, i, *_: (0, 0)),
        pl.BlockSpec((B * QH, D), lambda l, i, *_: (0, 0)),
        pl.BlockSpec((B * KVH, D), lambda l, i, *_: (0, 0)),
        pl.BlockSpec((B * KVH, D), lambda l, i, *_: (0, 0)),
        # [L, 1, H]: a (1, 1, H) block keeps the last-two-dims whole
        # (Mosaic rejects (1, H) blocks of an [L, H] array — sublane 1)
        pl.BlockSpec((1, 1, H), lambda l, i, *_: (l, 0, 0)),
        pl.BlockSpec((1, 1, H), lambda l, i, *_: (l, 0, 0)),
        pl.BlockSpec((1, H // 2, Nqkv), lambda l, i, *_: (l, 0, 0)),
        pl.BlockSpec((1, sq_rows, Nqkv), lambda l, i, *_: (l, 0, 0)),
        pl.BlockSpec((1, sq_rows, Nqkv), lambda l, i, *_: (l, 0, 0)),
        pl.BlockSpec((1, QH * D // 2, H), lambda l, i, *_: (l, 0, 0)),
        pl.BlockSpec((1, so_rows, H), lambda l, i, *_: (l, 0, 0)),
        pl.BlockSpec((1, so_rows, H), lambda l, i, *_: (l, 0, 0)),
        # gate / up / down chunks: step i computes chunk i-1; the map's
        # max(i-1, 0) makes step 0 prefetch chunk 0 during attention
        pl.BlockSpec(
            (1, H // 2, ci), lambda l, i, *_: (l, 0, jnp.maximum(i - 1, 0))
        ),
        pl.BlockSpec(
            (1, sgu_rows, ci), lambda l, i, *_: (l, 0, jnp.maximum(i - 1, 0))
        ),
        pl.BlockSpec(
            (1, sgu_rows, ci), lambda l, i, *_: (l, 0, jnp.maximum(i - 1, 0))
        ),
        pl.BlockSpec(
            (1, H // 2, ci),
            lambda l, i, *_: (l, 0, NI + jnp.maximum(i - 1, 0)),
        ),
        pl.BlockSpec(
            (1, sgu_rows, ci),
            lambda l, i, *_: (l, 0, NI + jnp.maximum(i - 1, 0)),
        ),
        pl.BlockSpec(
            (1, sgu_rows, ci),
            lambda l, i, *_: (l, 0, NI + jnp.maximum(i - 1, 0)),
        ),
        pl.BlockSpec(
            (1, ci // 2, H), lambda l, i, *_: (l, jnp.maximum(i - 1, 0), 0)
        ),
        pl.BlockSpec(
            (1, sd_rows_chunk, H),
            lambda l, i, *_: (l, jnp.maximum(i - 1, 0), 0),
        ),
        pl.BlockSpec(
            (1, sd_rows_chunk, H),
            lambda l, i, *_: (l, jnp.maximum(i - 1, 0), 0),
        ),
        pl.BlockSpec(memory_space=pl.ANY),  # kv pool (aliased)
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(L, NI + 1),
        in_specs=nspec,
        out_specs=[
            pl.BlockSpec((B, H), lambda l, i, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.bfloat16),  # xres
            pltpu.VMEM((B, H), jnp.bfloat16),  # xn
            pltpu.VMEM((B, KVH, G, D), jnp.bfloat16),  # q2
            pltpu.VMEM((B, fck, XrK), kv_cache.dtype),  # kst
            pltpu.VMEM((B, fck, XrK), kv_cache.dtype),  # vst
            pltpu.VMEM((B, KVH, G, D), jnp.float32),  # ao
            pltpu.VMEM((B, H), jnp.float32),  # macc
            pltpu.VMEM((KVH * G, XrK), jnp.bfloat16),  # qbd
            pltpu.VMEM((KVH * G, 128), jnp.float32),  # m
            pltpu.VMEM((KVH * G, 128), jnp.float32),  # l
            pltpu.VMEM((KVH * G, XrK), jnp.float32),  # acc
            pltpu.VMEM((KVH * G, fck * ck), jnp.float32),  # cb
            pltpu.VMEM((8, fck * ck), jnp.int32),  # tj
            pltpu.VMEM((2, ppc, ps, fck, XrK), kv_cache.dtype),  # k_buf
            pltpu.VMEM((2, ppc, ps, fck, XrK), kv_cache.dtype),  # v_buf
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(
        _decode_stack_kernel,
        B=B, H=H, QH=QH, KVH=KVH, D=D, NI=NI, L=L,
        pb_qkv=pb_qkv, pb_o=pb_o, pb_gu=pb_gu, pb_d=pb_d,
        group_size=group_size, ppc=ppc, pmax=pmax,
        sm_scale=float(sm_scale), eps=float(eps), act=act,
        num_slots=P * ps,
        abl=os.environ.get("SGLT_MEGA_ABL", ""),
    )
    hidden, kv = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H), jnp.bfloat16),
            jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        ],
        input_output_aliases={29: 1},  # kv input (incl. 7 prefetch) -> out 1
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (H * Nqkv + QH * D * H + H * I2 + I * H),
            bytes_accessed=L
            * (H * Nqkv + QH * D * H + H * I2 + I * H) // 2,
            transcendentals=B * L * I,
        ),
        interpret=interpret,
    )(
        lengths, s0, nck, nlive, total,
        page_table.reshape(-1).astype(jnp.int32),
        jnp.asarray(slots, jnp.int32),
        x, cosq, sinq, cosk, sink,
        in_norm.reshape(L, 1, H), post_norm.reshape(L, 1, H),
        qkv_qw, qkv_s, qkv_zb,
        o_qw, o_s, o_zb,
        gu_qw, gu_s, gu_zb, gu_qw, gu_s, gu_zb,
        d_qw, d_s, d_zb,
        kv_cache,
    )
    return hidden, kv
