"""In-place KV pool writes (Pallas) — KV-interleaved token faces (v4).

Pool layout (mem_cache/kv_pool.py): [L, num_pages, page_size, 2, KVH*D].
A token's K/V is one whole (2, KVH*D) last-two-dims face, so every DMA here
slices only the page_size dim (or whole pages) — legal under Mosaic's
even-alignment rule for bf16 second-minor slices (validated on v5e; the
prior flat layout's [1, 2*KVH*D] row DMAs were rejected:
"Slice shape along dimension 0 must be aligned to tiling (2)").

Kernels (both alias the pool via `input_output_aliases`, in-place update):

* `kv_write_tokens`: scatter T token faces at arbitrary distinct slots
  (decode: one face per sequence; speculative verify: QS contiguous faces
  per sequence — contiguity is irrelevant here, every live slot is unique).
* `kv_write_prefill`: chunks are PAGE-ALIGNED by scheduler construction, so
  whole [ps, 2, KVH*D] pages are written blind from the input buffer — rows
  beyond the live length carry padding garbage that attention masks out and
  decode later overwrites.

Semantics match reference `set_kv_buffer`
(`python/sglang/srt/mem_cache/memory_pool.py` via `radix_attention.py:100-131`).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.utils import pallas_interpret_default


def _kv_write_tokens_kernel(
    layer_ref,  # [1]
    slots_ref,  # [T]
    kv_new_ref,  # [T, 2, KVH*D] VMEM
    kv_in,  # aliased
    kv_hbm,  # aliased out [L, P, ps, 2, KVH*D]
    sem,
    *,
    num_slots: int,
    unroll: bool,
):
    layer = layer_ref[0]
    ps = kv_hbm.shape[2]
    T = kv_new_ref.shape[0]

    def live(i):
        s = slots_ref[i]
        return (s >= 0) & (s < num_slots)

    def start(i, _=None):
        @pl.when(live(i))
        def _():
            s = slots_ref[i]
            pltpu.make_async_copy(
                kv_new_ref.at[pl.ds(i, 1)],
                kv_hbm.at[layer, s // ps, pl.ds(s % ps, 1)],
                sem,
            ).start()

        return 0

    def wait(i, _=None):
        @pl.when(live(i))
        def _():
            pltpu.make_async_copy(
                kv_new_ref.at[pl.ds(0, 1)], kv_hbm.at[0, 0, pl.ds(0, 1)], sem
            ).wait()

        return 0

    if unroll:
        # static unroll: fori_loop machinery cost ~0.7 us per scattered row
        # copy (41x the unrolled form, measured on v5e)
        for i in range(T):
            start(i)
        for i in range(T):
            wait(i)
    else:
        lax.fori_loop(0, T, start, 0)
        lax.fori_loop(0, T, wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_tokens(
    kv_cache: jax.Array,  # [L, P, ps, 2, KVH*D]
    kv_new: jax.Array,  # [T, 2, KVH*D]
    slots: jax.Array,  # [T] int32 (PAD_SLOT / out-of-range -> skipped)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, ps, _, X = kv_cache.shape
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    import os

    kernel = functools.partial(
        _kv_write_tokens_kernel,
        num_slots=P * ps,
        unroll=kv_new.shape[0] <= 128
        and os.environ.get("SGLT_KVW_UNROLL", "1") != "0",
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={3: 0},  # indices include scalar prefetch
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(slots, jnp.int32),
        kv_new.astype(kv_cache.dtype),
        kv_cache,
    )


def _kv_write_prefill_kernel(
    layer_ref,  # [1]
    pages_ref,  # [n_groups] page id per ps-token group; < 0 = dead group
    kv_new_ref,  # [T, 2, KVH*D] VMEM, page-aligned groups
    kv_in,
    kv_hbm,  # aliased out
    sem,
    *,
    num_pages: int,
):
    layer = layer_ref[0]
    ps = kv_hbm.shape[2]

    def live(j):
        p = pages_ref[j]
        return (p >= 0) & (p < num_pages)

    def start(j, _=None):
        @pl.when(live(j))
        def _():
            pltpu.make_async_copy(
                kv_new_ref.at[pl.ds(j * ps, ps)],
                kv_hbm.at[layer, pages_ref[j]],
                sem,
            ).start()

        return 0

    def wait(j, _=None):
        @pl.when(live(j))
        def _():
            pltpu.make_async_copy(
                kv_new_ref.at[pl.ds(0, ps)], kv_hbm.at[0, 0], sem
            ).wait()

        return 0

    if pages_ref.shape[0] <= 64:
        for j in range(pages_ref.shape[0]):
            start(j)
        for j in range(pages_ref.shape[0]):
            wait(j)
    else:
        lax.fori_loop(0, pages_ref.shape[0], start, 0)
        lax.fori_loop(0, pages_ref.shape[0], wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill(
    kv_cache: jax.Array,  # [L, P, ps, 2, KVH*D]
    kv_new: jax.Array,  # [T, 2, KVH*D]; every ps-token group page-aligned
    pages: jax.Array,  # [T // ps] page id per group (< 0 skips the group —
    #                    multi-request batches interleave padding groups)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, ps, _, X = kv_cache.shape
    T = kv_new.shape[0]
    assert T % ps == 0, (T, ps)
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(_kv_write_prefill_kernel, num_pages=P)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(pages, jnp.int32),
        kv_new.astype(kv_cache.dtype),
        kv_cache,
    )


# ---------------------------------------------------------------------------
# split-layout kernels (pool [L, P, 2, ps, fcK, XrK]; K face 0, V face 1)
# ---------------------------------------------------------------------------


def _kv_write_tokens_split_kernel(
    layer_ref,  # [1]
    slots_ref,  # [T]
    k_new_ref,  # [T, fcK, XrK] VMEM
    v_new_ref,  # [T, fcK, XrK] VMEM
    kv_in,  # aliased
    kv_hbm,  # aliased out [L, P, 2, ps, fcK, XrK]
    sem,
    *,
    num_slots: int,
    unroll: bool,
):
    layer = layer_ref[0]
    ps = kv_hbm.shape[3]
    T = k_new_ref.shape[0]

    def live(i):
        s = slots_ref[i]
        return (s >= 0) & (s < num_slots)

    def start(i, _=None):
        @pl.when(live(i))
        def _():
            s = slots_ref[i]
            pltpu.make_async_copy(
                k_new_ref.at[i],
                kv_hbm.at[layer, s // ps, 0, s % ps],
                sem,
            ).start()
            pltpu.make_async_copy(
                v_new_ref.at[i],
                kv_hbm.at[layer, s // ps, 1, s % ps],
                sem,
            ).start()

        return 0

    def wait(i, _=None):
        @pl.when(live(i))
        def _():
            for _ in range(2):
                pltpu.make_async_copy(
                    k_new_ref.at[0], kv_hbm.at[0, 0, 0, 0], sem
                ).wait()

        return 0

    if unroll:
        # static unroll: issue cost dominates scattered row writes (~0.7 us
        # per copy measured inside the fori_loop form — loop + dynamic-src
        # machinery); static src indices cut the scalar work per copy
        for i in range(T):
            start(i)
        for i in range(T):
            wait(i)
    else:
        lax.fori_loop(0, T, start, 0)
        lax.fori_loop(0, T, wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_tokens_split(
    kv_cache: jax.Array,  # [L, P, 2, ps, fcK, XrK]
    k_new: jax.Array,  # [T, fcK, XrK]
    v_new: jax.Array,  # [T, fcK, XrK]
    slots: jax.Array,  # [T] int32 (PAD_SLOT / out-of-range -> skipped)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, _, ps, fck, XrK = kv_cache.shape
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    import os

    kernel = functools.partial(
        _kv_write_tokens_split_kernel,
        num_slots=P * ps,
        unroll=k_new.shape[0] <= 128
        and os.environ.get("SGLT_KVW_UNROLL", "1") != "0",
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={4: 0},  # indices include scalar prefetch
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(slots, jnp.int32),
        k_new.astype(kv_cache.dtype),
        v_new.astype(kv_cache.dtype),
        kv_cache,
    )


def _kv_write_prefill_split_kernel(
    layer_ref,  # [1]
    pages_ref,  # [n_groups]
    k_new_ref,  # [T, fcK, XrK] VMEM, page-aligned groups
    v_new_ref,
    kv_in,
    kv_hbm,  # aliased out [L, P, 2, ps, fcK, XrK]
    sem,
    *,
    num_pages: int,
):
    layer = layer_ref[0]
    ps = kv_hbm.shape[3]

    def live(j):
        p = pages_ref[j]
        return (p >= 0) & (p < num_pages)

    def start(j, _=None):
        @pl.when(live(j))
        def _():
            pltpu.make_async_copy(
                k_new_ref.at[pl.ds(j * ps, ps)],
                kv_hbm.at[layer, pages_ref[j], 0],
                sem,
            ).start()
            pltpu.make_async_copy(
                v_new_ref.at[pl.ds(j * ps, ps)],
                kv_hbm.at[layer, pages_ref[j], 1],
                sem,
            ).start()

        return 0

    def wait(j, _=None):
        @pl.when(live(j))
        def _():
            for _ in range(2):
                pltpu.make_async_copy(
                    k_new_ref.at[pl.ds(0, ps)], kv_hbm.at[0, 0, 0], sem
                ).wait()

        return 0

    if pages_ref.shape[0] <= 64:
        for j in range(pages_ref.shape[0]):
            start(j)
        for j in range(pages_ref.shape[0]):
            wait(j)
    else:
        lax.fori_loop(0, pages_ref.shape[0], start, 0)
        lax.fori_loop(0, pages_ref.shape[0], wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill_split(
    kv_cache: jax.Array,  # [L, P, 2, ps, fcK, XrK]
    k_new: jax.Array,  # [T, fcK, XrK]; every ps-token group page-aligned
    v_new: jax.Array,
    pages: jax.Array,  # [T // ps] page id per group (< 0 skips the group)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, _, ps, fck, XrK = kv_cache.shape
    T = k_new.shape[0]
    assert T % ps == 0, (T, ps)
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(_kv_write_prefill_split_kernel, num_pages=P)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(pages, jnp.int32),
        k_new.astype(kv_cache.dtype),
        v_new.astype(kv_cache.dtype),
        kv_cache,
    )


# ---------------------------------------------------------------------------
# latent-layout kernels (pool [L, P, ps, Xr]; ONE row per token, K == V —
# MLA stores the latent a single time, reference memory_pool.py:1396 role)
# ---------------------------------------------------------------------------


def _kv_write_tokens_latent_kernel(
    layer_ref,  # [1]
    slots_ref,  # [T]
    r_new_ref,  # [T, Xr] VMEM latent rows
    kv_in,  # aliased
    kv_hbm,  # aliased out [L, P, ps, Xr]
    tmp_ref,  # [T, 8, Xr] VMEM read-modify-write staging
    sem,
    *,
    num_slots: int,
):
    """Single-row token writes via 8-row read-modify-write groups.

    The latent pool's ps dim is the HBM tile's second-minor, so DMA slices
    along it must be 8-row aligned (Mosaic (8, 128) tiling).  Each write
    reads its token's aligned 8-row group, patches one row by select, and
    writes the group back.  Group partner rows are either PREVIOUSLY
    written tokens of the same sequence (stable during this call) or
    garbage past the live length (masked by attention).  When a call
    carries several rows of one group (speculative spans: consecutive
    slots), later tokens patch the FIRST group member's staging block and
    only that head writes back.
    """
    layer = layer_ref[0]
    ps = kv_hbm.shape[2]
    T = r_new_ref.shape[0]

    def live(i):
        s = slots_ref[i]
        return (s >= 0) & (s < num_slots)

    def secondary(i):
        # shares its 8-row group with token i-1 (contiguous spec span)
        if i == 0:
            return jnp.bool_(False)
        return live(i) & live(i - 1) & (
            (slots_ref[i] // 8) == (slots_ref[i - 1] // 8)
        )

    def g0(i):
        # aligned group base row within the page (provably 8-aligned)
        return (slots_ref[i] % ps) // 8 * 8

    # chain heads: head(i) = first token of i's group present in this call
    heads = []
    for i in range(T):
        if i == 0:
            heads.append(jnp.int32(0))
        else:
            heads.append(jnp.where(secondary(i), heads[i - 1], jnp.int32(i)))

    # phase 1: read each group head's 8-row group
    for i in range(T):
        @pl.when(live(i) & ~secondary(i))
        def _(i=i):
            s = slots_ref[i]
            pltpu.make_async_copy(
                kv_hbm.at[layer, s // ps, pl.ds(g0(i), 8)], tmp_ref.at[i], sem
            ).start()
    for i in range(T):
        @pl.when(live(i) & ~secondary(i))
        def _(i=i):
            pltpu.make_async_copy(
                kv_hbm.at[0, 0, pl.ds(0, 8)], tmp_ref.at[0], sem
            ).wait()

    # phase 2: patch rows (select-store of the whole group: bf16 packs two
    # sublanes per 32-bit row, so single-sublane dynamic stores are
    # unprovably aligned for Mosaic)
    for i in range(T):
        @pl.when(live(i))
        def _(i=i):
            s = slots_ref[i]
            head = heads[i]
            old = tmp_ref[pl.ds(head, 1)]  # [1, 8, Xr]
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1) == s % 8
            )
            tmp_ref[pl.ds(head, 1)] = jnp.where(
                sel, r_new_ref[pl.ds(i, 1)][:, None, :], old
            )

    # phase 3: group heads write back
    for i in range(T):
        @pl.when(live(i) & ~secondary(i))
        def _(i=i):
            s = slots_ref[i]
            pltpu.make_async_copy(
                tmp_ref.at[i], kv_hbm.at[layer, s // ps, pl.ds(g0(i), 8)], sem
            ).start()
    for i in range(T):
        @pl.when(live(i) & ~secondary(i))
        def _(i=i):
            pltpu.make_async_copy(
                tmp_ref.at[0], kv_hbm.at[0, 0, pl.ds(0, 8)], sem
            ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_tokens_latent(
    kv_cache: jax.Array,  # [L, P, ps, Xr]
    r_new: jax.Array,  # [T, Xr] latent rows
    slots: jax.Array,  # [T] int32 (PAD_SLOT / out-of-range -> skipped)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, ps, Xr = kv_cache.shape
    assert ps % 8 == 0, ps  # RMW groups are 8-row aligned (HBM tiling)
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    T = r_new.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((T, 8, Xr), kv_cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kv_write_tokens_latent_kernel, num_slots=P * ps
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(slots, jnp.int32),
        r_new.astype(kv_cache.dtype),
        kv_cache,
    )


def _kv_write_prefill_latent_kernel(
    layer_ref,  # [1]
    pages_ref,  # [n_groups]
    r_new_ref,  # [T, Xr] VMEM, page-aligned groups
    kv_in,
    kv_hbm,  # aliased out [L, P, ps, Xr]
    sem,
    *,
    num_pages: int,
):
    layer = layer_ref[0]
    ps = kv_hbm.shape[2]

    def live(j):
        p = pages_ref[j]
        return (p >= 0) & (p < num_pages)

    def start(j, _=None):
        @pl.when(live(j))
        def _():
            pltpu.make_async_copy(
                r_new_ref.at[pl.ds(j * ps, ps)],
                kv_hbm.at[layer, pages_ref[j]],
                sem,
            ).start()

        return 0

    def wait(j, _=None):
        @pl.when(live(j))
        def _():
            pltpu.make_async_copy(
                r_new_ref.at[pl.ds(0, ps)], kv_hbm.at[0, 0], sem
            ).wait()

        return 0

    if pages_ref.shape[0] <= 64:
        for j in range(pages_ref.shape[0]):
            start(j)
        for j in range(pages_ref.shape[0]):
            wait(j)
    else:
        lax.fori_loop(0, pages_ref.shape[0], start, 0)
        lax.fori_loop(0, pages_ref.shape[0], wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill_latent(
    kv_cache: jax.Array,  # [L, P, ps, Xr]
    r_new: jax.Array,  # [T, Xr]; every ps-token group page-aligned
    pages: jax.Array,  # [T // ps] page id per group (< 0 skips the group)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, ps, Xr = kv_cache.shape
    T = r_new.shape[0]
    assert T % ps == 0, (T, ps)
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(_kv_write_prefill_latent_kernel, num_pages=P)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(pages, jnp.int32),
        r_new.astype(kv_cache.dtype),
        kv_cache,
    )


# ---------------------------------------------------------------------------
# wide-layout kernels (round 5): pool [L, P, 2, ps, KVH*D] — K and V page
# faces with ONE sublane row per token.  The face's flat row layout is what
# lets the decode walk contract q against [ck, KVH*D] chunks with no class
# columns (fcK == 1: qk has ck columns instead of fcK*ck — measured 140 vs
# 243 us/layer at ppc=8, docs/kernels.md round 5).  Token writes can no
# longer slice a single sublane (Mosaic bf16 second-minor slices must align
# to 2), so decode/spec writes are READ-MODIFY-WRITE of the aligned 2-row
# pair, two-phased so two batch tokens sharing a pair (spec verify's
# contiguous slots) serialize: phase-1 tokens re-read the pair AFTER
# phase-0's writebacks complete.  A pair holds exactly 2 slots, so at most
# one token defers per pair and the two phases cover every conflict.
# ---------------------------------------------------------------------------


def _kv_write_tokens_wide_kernel(
    layer_ref,  # [1]
    gbase_ref,  # [T] aligned first slot of the token's 8-row group (-1 skip)
    k_new_ref,  # [T, 8, Xr] VMEM group-merged K rows (garbage where unmasked)
    v_new_ref,  # [T, 8, Xr]
    mask_ref,  # [T, 8, 128] i32: 1 = row j of group i carries a new token
    kv_in,  # aliased
    kv_hbm,  # aliased out [L, P, 2, ps, Xr]
    kbuf,  # [T, 8, Xr] VMEM staging
    vbuf,  # [T, 8, Xr]
    sem,
    *,
    num_slots: int,
):
    """Group-merged RMW: bf16 HBM tiles are (8, 128), so the smallest
    legal ps-dim DMA is 8 rows.  The wrapper merges every batch token
    into its aligned 8-row group buffer (one owner per group), so each
    group is read once, vector-selected against the merged rows, and
    written once — no phases, no in-kernel scatter.  Decode batches are
    conflict-free by construction (a page belongs to one sequence);
    spec-verify's contiguous slots simply merge into one group."""
    layer = layer_ref[0]
    ps = kv_hbm.shape[3]
    T = k_new_ref.shape[0]

    def live(i):
        g = gbase_ref[i]
        return (g >= 0) & (g < num_slots)

    for i in range(T):

        @pl.when(live(i))
        def _read(i=i):
            g = gbase_ref[i]
            page = g // ps
            row = pl.multiple_of(lax.rem(g, ps), 8)
            pltpu.make_async_copy(
                kv_hbm.at[layer, page, 0, pl.ds(row, 8)], kbuf.at[i], sem
            ).start()
            pltpu.make_async_copy(
                kv_hbm.at[layer, page, 1, pl.ds(row, 8)], vbuf.at[i], sem
            ).start()

    for i in range(T):

        @pl.when(live(i))
        def _rwait(i=i):
            for _ in range(2):
                pltpu.make_async_copy(
                    kbuf.at[0], kv_hbm.at[0, 0, 0, pl.ds(0, 8)], sem
                ).wait()

    for i in range(T):

        @pl.when(live(i))
        def _merge(i=i):
            sel = mask_ref[i][:, :1] != 0  # [8, 1]
            kbuf[i] = jnp.where(sel, k_new_ref[i], kbuf[i])
            vbuf[i] = jnp.where(sel, v_new_ref[i], vbuf[i])

    for i in range(T):

        @pl.when(live(i))
        def _write(i=i):
            g = gbase_ref[i]
            page = g // ps
            row = pl.multiple_of(lax.rem(g, ps), 8)
            pltpu.make_async_copy(
                kbuf.at[i], kv_hbm.at[layer, page, 0, pl.ds(row, 8)], sem
            ).start()
            pltpu.make_async_copy(
                vbuf.at[i], kv_hbm.at[layer, page, 1, pl.ds(row, 8)], sem
            ).start()

    for i in range(T):

        @pl.when(live(i))
        def _wwait(i=i):
            for _ in range(2):
                pltpu.make_async_copy(
                    kbuf.at[0], kv_hbm.at[0, 0, 0, pl.ds(0, 8)], sem
                ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_tokens_wide(
    kv_cache: jax.Array,  # [L, P, 2, ps, Xr]
    k_new: jax.Array,  # [T, Xr]
    v_new: jax.Array,
    slots: jax.Array,  # [T] int32 (PAD_SLOT / out-of-range -> skipped)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, _, ps, Xr = kv_cache.shape
    assert ps % 8 == 0, ps
    T = k_new.shape[0]
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    slots = jnp.asarray(slots, jnp.int32)
    num_slots = P * ps
    live = (slots >= 0) & (slots < num_slots)
    group = jnp.where(live, slots // 8, -1 - jnp.arange(T))
    # one OWNER token per group: the first batch token in it
    eq = group[None, :] == group[:, None]  # [T, T]
    first = jnp.argmax(eq, axis=1)  # first j with the same group
    owner_of = first  # [T] owner token index for each token
    is_owner = first == jnp.arange(T)
    gbase = jnp.where(live & is_owner, group * 8, -1)
    # merge every token's row into its owner's group buffer
    kg = jnp.zeros((T, 8, Xr), kv_cache.dtype)
    vg = jnp.zeros((T, 8, Xr), kv_cache.dtype)
    mk = jnp.zeros((T, 8), jnp.int32)
    rows = jnp.where(live, slots % 8, 0)
    kg = kg.at[owner_of, rows].set(
        k_new.astype(kv_cache.dtype), mode="drop")
    vg = vg.at[owner_of, rows].set(
        v_new.astype(kv_cache.dtype), mode="drop")
    mk = mk.at[owner_of, rows].add(
        jnp.where(live, 1, 0), mode="drop")
    mask = jnp.broadcast_to(mk[:, :, None], (T, 8, 128)).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((T, 8, Xr), kv_cache.dtype),
            pltpu.VMEM((T, 8, Xr), kv_cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kv_write_tokens_wide_kernel, num_slots=num_slots,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={5: 0},  # indices include scalar prefetch
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        gbase,
        kg,
        vg,
        mask,
        kv_cache,
    )


def _kv_write_prefill_wide_kernel(
    layer_ref,  # [1]
    pages_ref,  # [n_groups]
    k_new_ref,  # [T, Xr] VMEM, page-aligned groups
    v_new_ref,
    kv_in,
    kv_hbm,  # aliased out [L, P, 2, ps, Xr]
    sem,
    *,
    num_pages: int,
):
    layer = layer_ref[0]
    ps = kv_hbm.shape[3]

    def live(j):
        p = pages_ref[j]
        return (p >= 0) & (p < num_pages)

    def start(j, _=None):
        @pl.when(live(j))
        def _():
            pltpu.make_async_copy(
                k_new_ref.at[pl.ds(j * ps, ps)],
                kv_hbm.at[layer, pages_ref[j], 0],
                sem,
            ).start()
            pltpu.make_async_copy(
                v_new_ref.at[pl.ds(j * ps, ps)],
                kv_hbm.at[layer, pages_ref[j], 1],
                sem,
            ).start()

        return 0

    def wait(j, _=None):
        @pl.when(live(j))
        def _():
            for _ in range(2):
                pltpu.make_async_copy(
                    k_new_ref.at[pl.ds(0, ps)], kv_hbm.at[0, 0, 0], sem
                ).wait()

        return 0

    if pages_ref.shape[0] <= 64:
        for j in range(pages_ref.shape[0]):
            start(j)
        for j in range(pages_ref.shape[0]):
            wait(j)
    else:
        lax.fori_loop(0, pages_ref.shape[0], start, 0)
        lax.fori_loop(0, pages_ref.shape[0], wait, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_prefill_wide(
    kv_cache: jax.Array,  # [L, P, 2, ps, Xr]
    k_new: jax.Array,  # [T, Xr]; every ps-token group page-aligned
    v_new: jax.Array,
    pages: jax.Array,  # [T // ps] page id per group (< 0 skips the group)
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, _, ps, Xr = kv_cache.shape
    T = k_new.shape[0]
    assert T % ps == 0, (T, ps)
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    kernel = functools.partial(_kv_write_prefill_wide_kernel, num_pages=P)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(pages, jnp.int32),
        k_new.astype(kv_cache.dtype),
        v_new.astype(kv_cache.dtype),
        kv_cache,
    )


def _kv_write_tokens_wide_decode_kernel(
    layer_ref,  # [1]
    slots_ref,  # [T]
    k_new_ref,  # [T, Xr] VMEM
    v_new_ref,  # [T, Xr]
    kv_in,  # aliased
    kv_hbm,  # aliased out [L, P, 2, ps, Xr]
    buf,  # [T, 2, 8, Xr] VMEM pair-of-faces staging
    sem,
    *,
    num_slots: int,
):
    """Decode-mode wide write: every batch token belongs to a DIFFERENT
    sequence, and a page belongs to one sequence, so no two tokens share
    an 8-row tile group — each token RMWs its own group with ONE combined
    K+V read and one write (the K and V faces of a page are adjacent, so
    [2, 8, Xr] is a single DMA).  No group-merge scatter, no [T, T]
    conflict matrix (those cost ~19 us/layer of XLA prep in the general
    spec-mode kernel)."""
    layer = layer_ref[0]
    ps = kv_hbm.shape[3]
    T = k_new_ref.shape[0]

    def live(i):
        s = slots_ref[i]
        return (s >= 0) & (s < num_slots)

    for i in range(T):

        @pl.when(live(i))
        def _read(i=i):
            s = slots_ref[i]
            row = pl.multiple_of(lax.rem(s, ps) // 8 * 8, 8)
            pltpu.make_async_copy(
                kv_hbm.at[layer, s // ps, :, pl.ds(row, 8)], buf.at[i], sem
            ).start()

    for i in range(T):

        @pl.when(live(i))
        def _rwait(i=i):
            pltpu.make_async_copy(
                buf.at[0], kv_hbm.at[0, 0, :, pl.ds(0, 8)], sem
            ).wait()

    for i in range(T):

        @pl.when(live(i))
        def _merge(i=i):
            # dynamic-sublane stores must be tile-aligned; a whole-block
            # row-select store is not
            off = lax.rem(slots_ref[i], 8)
            sel = lax.broadcasted_iota(jnp.int32, (8, 1), 0) == off
            buf[i, 0] = jnp.where(sel, k_new_ref[i][None], buf[i, 0])
            buf[i, 1] = jnp.where(sel, v_new_ref[i][None], buf[i, 1])

    for i in range(T):

        @pl.when(live(i))
        def _write(i=i):
            s = slots_ref[i]
            row = pl.multiple_of(lax.rem(s, ps) // 8 * 8, 8)
            pltpu.make_async_copy(
                buf.at[i], kv_hbm.at[layer, s // ps, :, pl.ds(row, 8)], sem
            ).start()

    for i in range(T):

        @pl.when(live(i))
        def _wwait(i=i):
            pltpu.make_async_copy(
                buf.at[0], kv_hbm.at[0, 0, :, pl.ds(0, 8)], sem
            ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_write_tokens_wide_decode(
    kv_cache: jax.Array,  # [L, P, 2, ps, Xr]
    k_new: jax.Array,  # [T, Xr]
    v_new: jax.Array,
    slots: jax.Array,  # [T] int32; caller guarantees pair-distinct groups
    layer: jax.Array | int,
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = pallas_interpret_default()
    L, P, _, ps, Xr = kv_cache.shape
    assert ps % 8 == 0, ps
    T = k_new.shape[0]
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((T, 2, 8, Xr), kv_cache.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kv_write_tokens_wide_decode_kernel, num_slots=P * ps,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_cache.shape, kv_cache.dtype),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        layer,
        jnp.asarray(slots, jnp.int32),
        k_new.astype(kv_cache.dtype),
        v_new.astype(kv_cache.dtype),
        kv_cache,
    )
