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
