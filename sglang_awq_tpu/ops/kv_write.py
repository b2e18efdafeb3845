"""In-place KV pool writes (Pallas).

Replaces the jnp scatter in mem_cache/kv_pool.py on the device hot path:
XLA lowers that scatter with a token-major preferred layout and inserts
FULL-POOL layout-conversion copies (observed: 2 x 5.8 GB temps on an
11.5 GB pool — instant HBM OOM).  These kernels update the pool strictly in
place via `input_output_aliases` and keep the default layout that the
paged-attention reader requires.

Mosaic DMA constraint: a copied slice must keep the last two (tiled) dims
whole, so single [KVH, D] rows cannot be written directly into
[L, KVH, P, ps, D].  Instead:

* prefill (`kv_write_prefill`): chunks are PAGE-ALIGNED by scheduler
  construction (prefix matches and chunk sizes are page multiples), so whole
  [KVH, ps, D] pages are composed in VMEM and written blind — rows beyond
  the live length carry padding garbage that attention masks out and decode
  later overwrites.
* decode (`kv_write_decode`): one token per sequence lands mid-page, so the
  page is read-modify-written ([KVH, ps, D] round trip per token; ~64x write
  amplification but ~2% of a decode step's HBM traffic).

Semantics match reference `set_kv_buffer`
(`python/sglang/srt/mem_cache/memory_pool.py` via `radix_attention.py:100-131`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.utils import cdiv, pallas_interpret_default


# ---------------------------------------------------------------------------
# prefill: whole-page writes
# ---------------------------------------------------------------------------


def _kv_write_prefill_kernel(
    layer_ref,  # [1]
    pages_ref,  # [n_pages] page id for each token group (slots[j*ps]//ps)
    npages_ref,  # [1] live page count
    k_new_ref,  # [T_pad, KVH, D] VMEM
    v_new_ref,
    k_in,
    v_in,
    k_hbm,  # aliased out [L, KVH, P, ps, D]
    v_hbm,
    kbuf,  # [KVH, ps, D] VMEM scratch
    vbuf,
    sem,
):
    layer = layer_ref[0]
    ps = k_hbm.shape[3]
    n = npages_ref[0]

    def body(j, _):
        @pl.when(j < n)
        def _():
            page = pages_ref[j]
            kbuf[...] = jnp.swapaxes(k_new_ref[pl.ds(j * ps, ps)], 0, 1)
            vbuf[...] = jnp.swapaxes(v_new_ref[pl.ds(j * ps, ps)], 0, 1)
            ck = pltpu.make_async_copy(kbuf, k_hbm.at[layer, :, page], sem)
            cv = pltpu.make_async_copy(vbuf, v_hbm.at[layer, :, page], sem)
            ck.start()
            cv.start()
            ck.wait()
            cv.wait()

        return 0

    lax.fori_loop(0, pages_ref.shape[0], body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill(
    k_cache: jax.Array,  # [L, KVH, P, ps, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [T_pad, KVH, D]; tokens PAGE-ALIGNED from slot 0
    v_new: jax.Array,
    pages: jax.Array,  # [T_pad // ps] page id per ps-token group
    n_pages: jax.Array,  # [] live page count (ceil(T / ps))
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, KVH, P, ps, D = k_cache.shape
    T = k_new.shape[0]
    assert T % ps == 0, (T, ps)
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((KVH, ps, D), k_cache.dtype),
            pltpu.VMEM((KVH, ps, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _kv_write_prefill_kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={5: 0, 6: 1},  # indices include scalar prefetch
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(pages, jnp.int32),
        jnp.asarray(n_pages, jnp.int32).reshape(1),
        k_new.astype(k_cache.dtype),
        v_new.astype(v_cache.dtype),
        k_cache,
        v_cache,
    )


# ---------------------------------------------------------------------------
# decode: per-token page read-modify-write
# ---------------------------------------------------------------------------


def _kv_write_decode_kernel(
    layer_ref,  # [1]
    slots_ref,  # [B]
    k_new_ref,  # [B, KVH, D] VMEM
    v_new_ref,
    k_in,
    v_in,
    k_hbm,  # aliased out [L, KVH, P, ps, D]
    v_hbm,
    kbuf,  # [B, KVH, ps, D]
    vbuf,
    sem,
    *,
    num_slots: int,
):
    """Bulk phases per CHUNK of sequences (all of a chunk's reads in flight
    together, vectorized modify, writes in flight) — a serial per-token RMW
    loop pays a full DMA round-trip latency per token (observed ~0.6 ms/layer
    at bs=64), while fully-batched buffers blow the VMEM scope at large
    batch x page_size (buffers scale with B*KVH*ps*D).

    PRECONDITION: live slots must lie in DISTINCT pages (two tokens sharing
    a page would last-write-win).  Decode batches satisfy this by
    construction — each sequence owns its tail page."""
    layer = layer_ref[0]
    ps = k_hbm.shape[3]
    B = k_new_ref.shape[0]
    BC = kbuf.shape[0]  # chunk rows buffered at once

    def live(i):
        slot = slots_ref[i]
        return (slot >= 0) & (slot < num_slots)

    def chunk(c0, _):
        def start_reads(j, _):
            i = c0 + j

            @pl.when((i < B) & live(i))
            def _():
                page = slots_ref[i] // ps
                pltpu.make_async_copy(k_hbm.at[layer, :, page], kbuf.at[j], sem).start()
                pltpu.make_async_copy(v_hbm.at[layer, :, page], vbuf.at[j], sem).start()

            return 0

        def wait_one(j, _):
            i = c0 + j

            @pl.when((i < B) & live(i))
            def _():
                pltpu.make_async_copy(k_hbm.at[0, :, 0], kbuf.at[0], sem).wait()
                pltpu.make_async_copy(v_hbm.at[0, :, 0], vbuf.at[0], sem).wait()

            return 0

        def modify(j, _):
            i = c0 + j

            @pl.when((i < B) & live(i))
            def _():
                off = slots_ref[i] % ps
                row = lax.broadcasted_iota(jnp.int32, kbuf.shape[1:], 1)
                kbuf[j] = jnp.where(row == off, k_new_ref[i][:, None, :], kbuf[j])
                vbuf[j] = jnp.where(row == off, v_new_ref[i][:, None, :], vbuf[j])

            return 0

        def start_writes(j, _):
            i = c0 + j

            @pl.when((i < B) & live(i))
            def _():
                page = slots_ref[i] // ps
                pltpu.make_async_copy(kbuf.at[j], k_hbm.at[layer, :, page], sem).start()
                pltpu.make_async_copy(vbuf.at[j], v_hbm.at[layer, :, page], sem).start()

            return 0

        lax.fori_loop(0, BC, start_reads, 0)
        lax.fori_loop(0, BC, wait_one, 0)
        lax.fori_loop(0, BC, modify, 0)
        lax.fori_loop(0, BC, start_writes, 0)
        lax.fori_loop(0, BC, wait_one, 0)
        return 0

    lax.fori_loop(0, (B + BC - 1) // BC, lambda c, x: chunk(c * BC, x), 0)


def _kv_write_spec_kernel(
    layer_ref,  # [1]
    slots_ref,  # [B * QS] flat; row b's tokens at contiguous slots
    k_new_ref,  # [B*QS, KVH, D] VMEM
    v_new_ref,
    k_in,
    v_in,
    k_hbm,  # aliased out [L, KVH, P, ps, D]
    v_hbm,
    kbuf,  # [B, 2, KVH, ps, D] — up to 2 pages touched per row (QS <= ps)
    vbuf,
    sem,
    *,
    q_span: int,
    num_slots: int,
):
    """Verify-step writes: QS contiguous tokens per sequence land in at most
    two tail pages; bulk page RMW like the decode kernel.  Distinct-pages
    precondition applies ACROSS sequences (per-seq tail pages are unique)."""
    layer = layer_ref[0]
    ps = k_hbm.shape[3]
    B = kbuf.shape[0]

    def page_of(b, j):
        # j in {0, 1}: first/last page the row's run touches
        first = slots_ref[b * q_span]
        last = slots_ref[b * q_span + (q_span - 1)]
        return jnp.where(j == 0, first // ps, last // ps)

    def row_live(b):
        s = slots_ref[b * q_span]
        return (s >= 0) & (s < num_slots)

    def page_live(b, j):
        return row_live(b) & ((j == 0) | (page_of(b, 1) != page_of(b, 0)))

    def start_reads(b, _):
        for j in range(2):
            @pl.when(page_live(b, j))
            def _():
                pg = page_of(b, j)
                pltpu.make_async_copy(
                    k_hbm.at[layer, :, pg], kbuf.at[b, j], sem
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[layer, :, pg], vbuf.at[b, j], sem
                ).start()

        return 0

    def wait_all(b, _):
        for j in range(2):
            @pl.when(page_live(b, j))
            def _():
                pltpu.make_async_copy(k_hbm.at[0, :, 0], kbuf.at[0, 0], sem).wait()
                pltpu.make_async_copy(v_hbm.at[0, :, 0], vbuf.at[0, 0], sem).wait()

        return 0

    def modify(b, _):
        @pl.when(row_live(b))
        def _():
            for j in range(2):
                pg = page_of(b, j)
                row = lax.broadcasted_iota(jnp.int32, kbuf.shape[2:], 1)
                for t in range(q_span):
                    slot = slots_ref[b * q_span + t]
                    match = (slot // ps == pg) & ((j == 0) | (pg != page_of(b, 0)))
                    sel = (row == slot % ps) & match
                    kbuf[b, j] = jnp.where(
                        sel, k_new_ref[b * q_span + t][:, None, :], kbuf[b, j]
                    )
                    vbuf[b, j] = jnp.where(
                        sel, v_new_ref[b * q_span + t][:, None, :], vbuf[b, j]
                    )

        return 0

    def start_writes(b, _):
        for j in range(2):
            @pl.when(page_live(b, j))
            def _():
                pg = page_of(b, j)
                pltpu.make_async_copy(
                    kbuf.at[b, j], k_hbm.at[layer, :, pg], sem
                ).start()
                pltpu.make_async_copy(
                    vbuf.at[b, j], v_hbm.at[layer, :, pg], sem
                ).start()

        return 0

    lax.fori_loop(0, B, start_reads, 0)
    lax.fori_loop(0, B, wait_all, 0)
    lax.fori_loop(0, B, modify, 0)
    lax.fori_loop(0, B, start_writes, 0)
    lax.fori_loop(0, B, wait_all, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_spec(
    k_cache: jax.Array,  # [L, KVH, P, ps, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, QS, KVH, D]
    v_new: jax.Array,
    slots: jax.Array,  # [B, QS] contiguous per row (PAD_SLOT rows skipped)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, KVH, P, ps, D = k_cache.shape
    B, QS = slots.shape
    assert QS <= ps, (QS, ps)
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, 2, KVH, ps, D), k_cache.dtype),
            pltpu.VMEM((B, 2, KVH, ps, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kv_write_spec_kernel, q_span=QS, num_slots=P * ps
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(slots, jnp.int32).reshape(-1),
        k_new.astype(k_cache.dtype).reshape(B * QS, KVH, D),
        v_new.astype(v_cache.dtype).reshape(B * QS, KVH, D),
        k_cache,
        v_cache,
    )


def _decode_chunk_rows(KVH: int, ps: int, D: int, B: int) -> int:
    """Rows buffered per phase: cap k+v buffers at ~6 MB of the VMEM scope."""
    per_row = 2 * KVH * ps * D * 2  # k+v, bf16
    return max(1, min(B, (6 * 1024 * 1024) // per_row))


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_decode(
    k_cache: jax.Array,  # [L, KVH, P, ps, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [B, KVH, D]
    v_new: jax.Array,
    slots: jax.Array,  # [B] int32 (PAD_SLOT / out-of-range -> skipped)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, KVH, P, ps, D = k_cache.shape
    B = k_new.shape[0]
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((_decode_chunk_rows(KVH, ps, D, B), KVH, ps, D), k_cache.dtype),
            pltpu.VMEM((_decode_chunk_rows(KVH, ps, D, B), KVH, ps, D), v_cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_kv_write_decode_kernel, num_slots=P * ps)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(slots, jnp.int32),
        k_new.astype(k_cache.dtype),
        v_new.astype(v_cache.dtype),
        k_cache,
        v_cache,
    )
