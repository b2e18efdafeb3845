"""Decode-time paged flash attention over the global KV pool.

TPU-native re-design of the reference's two-phase split-KV Triton decode
kernel (`python/sglang/srt/layers/attention/triton_ops/decode_attention.py:45,516`
— see SURVEY.md §A.3).  Differences driven by TPU hardware:

* The KV pool is one layer-stacked array `[L, KVH, n_pages, page_size, D]`
  (head-major so a page is one contiguous DMA) and the kernel receives the
  LAYER INDEX as a scalar-prefetch argument — a `lax.scan` over layers feeds
  the kernel with zero per-layer weight/cache copies.
* Instead of split-KV two-phase reduction, each (batch, kv_head) program
  streams its sequence's pages HBM->VMEM with manually double-buffered async
  copies and accumulates online-softmax state in VMEM scratch.  Grid steps
  whose chunk lies beyond the sequence length skip both DMA and compute
  (`pl.when` + next-live-block lookahead prefetch), so padded batch rows and
  short sequences cost only grid-iteration overhead.
* GQA packs the q-head group of each kv head into one [G, D] tile
  (reference `decode_attention.py:719-760` GQA dispatch).

The lookahead/double-buffer structure follows the publicly documented JAX
paged-attention kernel pattern; layer stacking, masking and the
normalize-once epilogue are ours.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.utils import pallas_interpret_default, round_up

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _paged_attn_kernel(
    # scalar prefetch
    layer_ref,  # [1]
    lengths_ref,  # [B]
    page_table_ref,  # [B * pmax]
    buf_idx_ref,  # [1] mutable
    init_ref,  # [1] mutable
    # inputs
    q_ref,  # [1, 1, QS*Gp, D]  (QS query tokens x padded head group)
    k_hbm_ref,  # [L, KVH, n_pages, ps, D] (ANY)
    v_hbm_ref,
    # output
    o_ref,  # [1, 1, QS*Gp, D] f32
    # scratch
    m_ref,  # [QS*Gp, 128] f32
    l_ref,  # [QS*Gp, 128] f32
    acc_ref,  # [QS*Gp, D] f32
    k_buf,  # [2, ppc, ps, D]
    v_buf,
    k_sem,  # [2]
    v_sem,
    *,
    batch_size: int,
    pages_per_chunk: int,
    pmax: int,
    sm_scale: float,
    q_span: int = 1,  # QS: query tokens per sequence (spec-decode verify)
    gp: int = 8,
):
    b, h, c = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    num_kv_heads = pl.num_programs(1)
    page_size = k_buf.shape[2]
    ck = pages_per_chunk * page_size  # tokens per chunk
    length = lengths_ref[b]

    def next_block(b, h, c):
        """First (b', h', c') at or after (b, h, c) whose chunk is live."""

        def advance_b():
            nb = b + 1

            def skip_zeros():
                return lax.fori_loop(
                    0,
                    batch_size,  # at most B iterations
                    lambda _, x: jnp.where(
                        jnp.logical_and(
                            x < batch_size,
                            lengths_ref[lax.clamp(0, x, batch_size - 1)] == 0,
                        ),
                        x + 1,
                        x,
                    ),
                    nb,
                )

            return (skip_zeros(), 0, 0)

        def advance_h():
            nh = h + 1
            return lax.cond(nh < num_kv_heads, lambda: (b, nh, 0), advance_b)

        return lax.cond(c * ck < length, lambda: (b, h, c), advance_h)

    def start_copy(bb, hh, cc, slot):
        layer = layer_ref[0]
        for i in range(pages_per_chunk):
            page = page_table_ref[bb * pmax + cc * pages_per_chunk + i]
            pltpu.make_async_copy(
                k_hbm_ref.at[layer, hh, page], k_buf.at[slot, i], k_sem.at[slot]
            ).start()
            pltpu.make_async_copy(
                v_hbm_ref.at[layer, hh, page], v_buf.at[slot, i], v_sem.at[slot]
            ).start()

    def wait_copy(slot):
        # waits consume the same byte counts the starts signalled
        for i in range(pages_per_chunk):
            pltpu.make_async_copy(
                k_hbm_ref.at[0, 0, 0], k_buf.at[slot, i], k_sem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                v_hbm_ref.at[0, 0, 0], v_buf.at[slot, i], v_sem.at[slot]
            ).wait()

    @pl.when(c * ck < length)
    def _live():
        slot = buf_idx_ref[0]

        @pl.when(init_ref[0] == 1)
        def _first():
            # first live step of the whole grid starts its own copy;
            # every later live chunk was prefetched by its predecessor
            start_copy(b, h, c, slot)

        init_ref[0] = 0

        @pl.when(c == 0)
        def _init_state():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        nb, nh, nc = next_block(b, h, c + 1)

        @pl.when(nb < batch_size)
        def _prefetch():
            nslot = 1 - slot
            start_copy(nb, nh, nc, nslot)
            buf_idx_ref[0] = nslot

        wait_copy(slot)
        q = q_ref[0, 0]  # [QS*Gp, D] bf16
        d = q.shape[-1]
        k = k_buf[slot].reshape(ck, d)
        qk = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [QS*Gp, ck]
        qk = qk * sm_scale
        pos = c * ck + lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        if q_span == 1:
            limit = length
        else:
            # row r belongs to query token t = r // gp, whose causal limit is
            # length - (q_span - 1 - t): the last token sees the full length
            t = lax.broadcasted_iota(jnp.int32, qk.shape, 0) // gp
            limit = length - (q_span - 1) + t
        qk = jnp.where(pos < limit, qk, MASK_VALUE)

        m_prev = m_ref[:, :1]  # [Gp, 1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(qk, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(qk - m_next)  # [Gp, ck]
        l_cur = jnp.sum(p, axis=-1, keepdims=True)
        alpha = jnp.exp(m_prev - m_next)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape)

        v = v_buf[slot].reshape(ck, d)
        pv = lax.dot_general(
            p.astype(jnp.bfloat16),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when((c + 1) * ck >= length)
        def _emit():
            o_ref[0, 0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "pages_per_chunk", "interpret"),
)
def paged_attention_spec(
    q: jax.Array,  # [B, QS, QH, D] bf16 — QS draft/verify tokens per sequence
    k_cache: jax.Array,
    v_cache: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,  # [B] TOTAL length incl. all QS new tokens
    layer: jax.Array | int,
    *,
    sm_scale: float,
    pages_per_chunk: int = 8,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Multi-query-token paged attention for speculative-decode verify:
    token t of each sequence attends causally up to position
    length - QS + t (its own position).  Returns [B, QS, QH, D] f32."""
    if interpret is None:
        interpret = pallas_interpret_default()
    B, QS, QH, D = q.shape
    L, KVH, n_pages, ps, Dk = k_cache.shape
    G = QH // KVH
    Gp = max(G, 8)
    # [B, QS, KVH, G, D] -> [B, KVH, QS, Gp, D] -> [B, KVH, QS*Gp, D]
    qg = q.reshape(B, QS, KVH, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, 0), (0, Gp - G), (0, 0)))
    qg = jnp.transpose(qg, (0, 2, 1, 3, 4)).reshape(B, KVH, QS * Gp, D)
    out = _paged_attention_rows(
        qg, k_cache, v_cache, page_table, lengths, layer,
        sm_scale=sm_scale, pages_per_chunk=pages_per_chunk, q_span=QS, gp=Gp,
        interpret=interpret,
    )  # [B, KVH, QS*Gp, D]
    out = out.reshape(B, KVH, QS, Gp, D)[:, :, :, :G, :]
    return jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(B, QS, QH, D)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "pages_per_chunk", "interpret"),
)
def paged_attention(
    q: jax.Array,  # [B, QH, D] bf16
    k_cache: jax.Array,  # [L, KVH, n_pages, ps, D] bf16
    v_cache: jax.Array,
    page_table: jax.Array,  # [B, pmax] int32
    lengths: jax.Array,  # [B] int32 (0 for padded rows)
    layer: jax.Array | int,
    *,
    sm_scale: float,
    pages_per_chunk: int = 8,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns [B, QH, D] f32 attention output for one decode step.

    `lengths[b]` counts ALL live tokens of row b including the one being
    decoded (whose K/V must already be written to the pool).
    """
    if interpret is None:
        interpret = pallas_interpret_default()
    B, QH, D = q.shape
    L, KVH, n_pages, ps, Dk = k_cache.shape
    assert D == Dk
    assert QH % KVH == 0
    G = QH // KVH
    Gp = max(G, 8)  # sublane-pad the head-group dim
    qg = q.reshape(B, KVH, G, D)
    if Gp != G:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, Gp - G), (0, 0)))
    out = _paged_attention_rows(
        qg, k_cache, v_cache, page_table, lengths, layer,
        sm_scale=sm_scale, pages_per_chunk=pages_per_chunk, q_span=1, gp=Gp,
        interpret=interpret,
    )
    out = out[:, :, :G, :]
    return out.reshape(B, QH, D)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "pages_per_chunk", "q_span", "gp", "interpret"),
)
def _paged_attention_rows(
    qg: jax.Array,  # [B, KVH, R, D] with R = q_span * gp
    k_cache: jax.Array,
    v_cache: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,
    layer: jax.Array | int,
    *,
    sm_scale: float,
    pages_per_chunk: int,
    q_span: int,
    gp: int,
    interpret: bool,
) -> jax.Array:
    B, KVH, R, D = qg.shape
    L, _, n_pages, ps, _ = k_cache.shape
    assert R == q_span * gp
    pmax = page_table.shape[1]
    ppc = min(pages_per_chunk, pmax)
    if pmax % ppc != 0:
        pad = round_up(pmax, ppc) - pmax
        page_table = jnp.pad(page_table, ((0, 0), (0, pad)))
        pmax += pad
    n_chunks = pmax // ppc

    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    lengths = jnp.asarray(lengths, jnp.int32)
    pt_flat = page_table.reshape(-1).astype(jnp.int32)
    buf_idx0 = jnp.zeros((1,), jnp.int32)
    init0 = jnp.ones((1,), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, KVH, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, R, D), lambda b, h, c, *_: (b, h, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, R, D), lambda b, h, c, *_: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, 128), jnp.float32),
            pltpu.VMEM((R, D), jnp.float32),
            pltpu.VMEM((2, ppc, ps, D), k_cache.dtype),
            pltpu.VMEM((2, ppc, ps, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(
        _paged_attn_kernel,
        batch_size=B,
        pages_per_chunk=ppc,
        pmax=pmax,
        sm_scale=sm_scale,
        q_span=q_span,
        gp=gp,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KVH, R, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(layer, lengths, pt_flat, buf_idx0, init0, qg, k_cache, v_cache)


def paged_attention_spec_xla(
    q: jax.Array,  # [B, QS, QH, D]
    k_cache: jax.Array,
    v_cache: jax.Array,
    page_table: jax.Array,
    lengths: jax.Array,  # [B] total incl. QS new tokens
    layer: jax.Array | int,
    *,
    sm_scale: float,
) -> jax.Array:
    """Reference XLA implementation of the verify attention."""
    B, QS, QH, D = q.shape
    L, KVH, n_pages, ps, _ = k_cache.shape
    G = QH // KVH
    layer = jnp.asarray(layer, jnp.int32)
    kl = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    kg = jnp.swapaxes(kl[:, page_table], 0, 1).reshape(B, KVH, -1, D)
    vg = jnp.swapaxes(vl[:, page_table], 0, 1).reshape(B, KVH, -1, D)
    qg = q.reshape(B, QS, KVH, G, D)
    s = jnp.einsum(
        "btkgd,bksd->btkgs", qg.astype(jnp.float32), kg.astype(jnp.float32)
    ) * sm_scale
    S = s.shape[-1]
    key_pos = jnp.arange(S)[None, None, :]
    limit = (lengths[:, None] - (QS - 1) + jnp.arange(QS)[None, :])[:, :, None]
    mask = key_pos < limit  # [B, QS, S]
    s = jnp.where(mask[:, :, None, None, :], s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("btkgs,bksd->btkgd", p, vg.astype(jnp.float32))
    return o.reshape(B, QS, QH, D)


def paged_attention_xla(
    q: jax.Array,  # [B, QH, D]
    k_cache: jax.Array,  # [L, KVH, n_pages, ps, D]
    v_cache: jax.Array,
    page_table: jax.Array,  # [B, pmax]
    lengths: jax.Array,  # [B]
    layer: jax.Array | int,
    *,
    sm_scale: float,
) -> jax.Array:
    """Reference XLA implementation (gather + masked softmax) for testing."""
    B, QH, D = q.shape
    L, KVH, n_pages, ps, _ = k_cache.shape
    G = QH // KVH
    layer = jnp.asarray(layer, jnp.int32)
    kl = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    # gather pages: [KVH, B, pmax, ps, D] -> [B, KVH, S, D]
    kg = jnp.swapaxes(kl[:, page_table], 0, 1).reshape(B, KVH, -1, D)
    vg = jnp.swapaxes(vl[:, page_table], 0, 1).reshape(B, KVH, -1, D)
    qg = q.reshape(B, KVH, G, D)
    s = jnp.einsum("bhgd,bhtd->bhgt", qg.astype(jnp.float32), kg.astype(jnp.float32))
    s = s * sm_scale
    S = s.shape[-1]
    mask = jnp.arange(S)[None, None, None, :] < lengths[:, None, None, None]
    s = jnp.where(mask, s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, vg.astype(jnp.float32))
    return o.reshape(B, QH, D)
