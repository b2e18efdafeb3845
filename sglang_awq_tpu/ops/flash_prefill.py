"""Causal flash attention for prefill/extend with a prefix offset.

TPU-native replacement for the reference's extend-attention Triton kernel
(`python/sglang/srt/layers/attention/triton_ops/extend_attention.py:542-567`,
SURVEY.md §A.3): the queries are the new chunk's tokens (contiguous), the
keys/values are the request's FULL sequence (cached prefix + new chunk),
causal within the chunk and full attention to the prefix.

v1 design (bs = 1 per call, chunked prefill — SURVEY.md §7 phase 1): the
caller gathers the request's K/V from the paged pool into contiguous
[S_pad, KVH, D] buffers (an XLA gather; prefill is compute-bound so the
extra pass over KV is a small constant), then this kernel runs a standard
flash attention with the causal mask offset by `prefix_len`:

    query i (absolute position prefix_len + i) attends key j
    iff  j <= prefix_len + i  and  j < kv_len.

Grid (q_head, q_tile, kv_tile) with online-softmax scratch carried across
the innermost kv dimension.  KV tiles entirely above the causal diagonal of
the current q tile are skipped.
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

from sglang_awq_tpu.utils import pallas_interpret_default

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _flash_prefill_kernel(
    # scalar prefetch: [prefix_len, q_len, kv_len]
    meta_ref,
    # inputs
    q_ref,  # [1, bq, D]
    k_ref,  # [1, bk, D]
    v_ref,  # [1, bk, D]
    # output
    o_ref,  # [1, bq, D]
    # scratch
    m_ref,  # [bq, 128] f32
    l_ref,  # [bq, 128] f32
    acc_ref,  # [bq, D] f32
    *,
    sm_scale: float,
    block_q: int,
    block_k: int,
):
    t, s = pl.program_id(1), pl.program_id(2)
    n_s = pl.num_programs(2)
    prefix_len, q_len, kv_len = meta_ref[0], meta_ref[1], meta_ref[2]

    # absolute query positions of this q tile: prefix + t*bq .. + bq
    q_lo_abs = prefix_len + t * block_q
    # live kv range for this tile: keys < min(kv_len, q_hi_abs+1)
    kv_hi = jnp.minimum(kv_len, q_lo_abs + block_q)
    live = s * block_k < kv_hi

    @pl.when(s == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(live)
    def _compute():
        q = q_ref[0]  # [bq, D]
        k = k_ref[0]  # [bk, D]
        qk = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        qk = qk * sm_scale
        q_pos = q_lo_abs + lax.broadcasted_iota(jnp.int32, qk.shape, 0)
        k_pos = s * block_k + lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        mask = (k_pos <= q_pos) & (k_pos < kv_len)
        qk = jnp.where(mask, qk, MASK_VALUE)

        m_prev = m_ref[:, :1]
        l_prev = l_ref[:, :1]
        m_cur = jnp.max(qk, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(qk - m_next)
        # fully-masked rows (q rows beyond q_len pad) produce p rows of
        # exp(MASK - MASK)=1; they are sliced away by the caller.
        l_cur = jnp.sum(p, axis=-1, keepdims=True)
        alpha = jnp.exp(m_prev - m_next)
        m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(alpha * l_prev + l_cur, l_ref.shape)
        pv = lax.dot_general(
            p.astype(jnp.bfloat16),
            v_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(s == n_s - 1)
    def _emit():
        l = l_ref[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "block_q", "block_k", "interpret"),
)
def flash_prefill(
    q: jax.Array,  # [QH, T_pad, D] bf16 (new-chunk queries, head-major)
    k: jax.Array,  # [KVH, S_pad, D] bf16 (prefix + new, gathered contiguous)
    v: jax.Array,  # [KVH, S_pad, D]
    prefix_len: jax.Array | int,  # tokens already cached before this chunk
    q_len: jax.Array | int,  # live queries (<= T_pad)
    kv_len: jax.Array | int,  # live keys (= prefix_len + q_len)
    *,
    sm_scale: float,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns [QH, T_pad, D] f32; rows >= q_len contain garbage (slice off)."""
    if interpret is None:
        interpret = pallas_interpret_default()
    QH, T, D = q.shape
    KVH, S, _ = k.shape
    assert QH % KVH == 0
    G = QH // KVH
    bq = min(block_q, T)
    bk = min(block_k, S)
    assert T % bq == 0 and S % bk == 0, (T, bq, S, bk)

    meta = jnp.stack(
        [
            jnp.asarray(prefix_len, jnp.int32),
            jnp.asarray(q_len, jnp.int32),
            jnp.asarray(kv_len, jnp.int32),
        ]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(QH, T // bq, S // bk),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda h, t, s, *_: (h, t, 0)),
            pl.BlockSpec((1, bk, D), lambda h, t, s, *_: (h // G, s, 0)),
            pl.BlockSpec((1, bk, D), lambda h, t, s, *_: (h // G, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda h, t, s, *_: (h, t, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _flash_prefill_kernel, sm_scale=sm_scale, block_q=bq, block_k=bk
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((QH, T, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * QH * T * S * D,
            bytes_accessed=2 * (QH * T * D + KVH * S * D),
            transcendentals=QH * T * S,
        ),
        interpret=interpret,
    )(meta, q, k, v)
    return out


def flash_prefill_xla(
    q: jax.Array,  # [QH, T, D]
    k: jax.Array,  # [KVH, S, D]
    v: jax.Array,
    prefix_len,
    q_len,
    kv_len,
    *,
    sm_scale: float,
) -> jax.Array:
    """Reference XLA implementation for testing."""
    QH, T, D = q.shape
    KVH, S, _ = k.shape
    G = QH // KVH
    kx = jnp.repeat(k, G, axis=0).astype(jnp.float32)
    vx = jnp.repeat(v, G, axis=0).astype(jnp.float32)
    s = jnp.einsum("htd,hsd->hts", q.astype(jnp.float32), kx) * sm_scale
    q_pos = jnp.asarray(prefix_len) + jnp.arange(T)[:, None]
    k_pos = jnp.arange(S)[None, :]
    mask = (k_pos <= q_pos) & (k_pos < jnp.asarray(kv_len))
    s = jnp.where(mask[None], s, MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("hts,hsd->htd", p, vx)
