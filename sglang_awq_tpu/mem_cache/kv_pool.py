"""Device-resident paged KV pool — split K/V page faces (round 2, v5).

Role model: reference `MHATokenToKVPool`
(`python/sglang/srt/mem_cache/memory_pool.py:605` — per-layer K/V buffers +
`set_kv_buffer`).  Two TPU layouts:

SPLIT (default, KVH >= 2):

    kv_cache : [L, num_pages, 2, page_size, fcK, KVH * D / fcK]

K lives on page face 0, V on face 1; within a face each token owns fcK
whole sublane rows (2 for bf16, 4 for fp8/int8 — the Mosaic second-minor
slice alignment), class row c holding heads [c*KVH/fcK, (c+1)*KVH/fcK) at
lane offsets.  The attention kernels DMA the K and V faces of a page
separately and each dot contracts ONLY its half of the chunk — HALF the
MXU traffic of the combined layout and no lane-parity shift (734 vs 542
GB/s decode attention measured on v5e, benchmarks/spike_split_pool.py).

COMBINED (v4, kept for KVH == 1 — MLA latent rows must span the whole
face width — and 1-byte pools with KVH % 4 != 0):

    kv_cache : [L, num_pages, page_size, fc, 2 * KVH * D / fc]

K/V-interleaved token faces; kernels score Q against K AND V rows in one
dot, mask the V columns out of the softmax, and lane-roll the
probabilities onto the V columns for the PV dot.

Both layouts share the invariants that shaped them (v1 head-major ->
v2 [ps, 2*KVH, D] -> v3 flat -> v4 combined -> v5 split history):

* one page face is contiguous — whole-page DMAs, never per-head ones
  (the round-1 283 GB/s ceiling);
* per-head access in-kernel is a LANE slice at a 128-multiple offset
  (free), never a second-minor index (189 GB/s relayout measured);
* a token's face is a whole last-two-dims block, so decode writes slice
  only the page_size dim — Mosaic requires second-minor slices aligned
  to the tile ("Slice shape along dimension 0 must be aligned to tiling
  (2)" killed v3's flat [1, 2*KVH*D] row writes on real hardware).

All mutation is functional: `write_kv` returns the updated array and is
called inside the jitted model step with a donated buffer, so XLA updates in
place (via the Pallas kernels in ops/kv_write.py on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

# Sentinel slot for padded tokens.  NOT -1: jnp's .at[] wraps negative
# indices (numpy semantics) even under mode="drop", which would corrupt the
# pool's last page; a large positive index is genuinely out of bounds and
# gets dropped.
PAD_SLOT = 1 << 30


@dataclasses.dataclass(frozen=True)
class KVPoolSpec:
    num_layers: int
    kv_heads: int  # per shard
    num_pages: int
    page_size: int
    head_dim: int
    dtype: str = "bfloat16"
    # MLA: K and V are the SAME latent row -> store it once ([L, P, ps, Xr]
    # "latent" layout, 0.5x the combined layout's bytes; reference stores
    # one latent row, memory_pool.py:1396).  Set by models whose attention
    # passes k is v (deepseek_v2).
    shared_kv: bool = False

    @property
    def jdtype(self):
        return {
            "bfloat16": jnp.bfloat16,
            "int8": jnp.int8,
            "fp8_e4m3": jnp.float8_e4m3fn,
        }[self.dtype]

    @property
    def face_rows(self) -> int:
        """Sublane rows per token face (combined layout).  Mosaic tiles
        1-byte dtypes at (4, 128) sublanes x lanes, so an fp8/int8 face
        must be 4 rows: (K heads 0..KVH/2-1, K heads KVH/2.., V lo-heads,
        V hi-heads), each row 2*KVH*D/4 lanes.  A head never straddles
        rows, so the attention kernels keep their one-dot-per-chunk
        structure (the column-class mask generalizes the 2-row K/V parity
        mask)."""
        return 4 if jnp.dtype(self.jdtype).itemsize == 1 else 2

    @property
    def layout(self) -> str:
        """"split" (round-2 v5): K and V live on separate page faces
        [L, P, 2, ps, fcK, XrK] so each attention dot contracts only its
        half of the chunk — HALF the MXU traffic of the combined layout
        and no lane-parity shift (measured 734 vs 542 GB/s on v5e,
        benchmarks/spike_split_pool.py).  Token writes stay legal: a K (or
        V) face is fcK whole sublane rows, fcK-aligned.

        "combined" ([L, P, ps, fc, Xr], K/V-interleaved token faces)
        remains for KVH == 1 (MLA latent rows: the head must span the
        whole face width) and for 1-byte pools whose per-shard head count
        can't fill 4 K-rows."""
        itemsize = jnp.dtype(self.jdtype).itemsize
        if self.shared_kv:
            assert self.kv_heads == 1, "shared_kv (latent) needs KVH == 1"
            assert itemsize == 2, "latent layout: bf16 only"
            assert self.head_dim % 128 == 0, self.head_dim
            assert self.page_size % 8 == 0, self.page_size
            return "latent"
        # "wide" (round 5): split K/V faces with ONE flat row per token
        # ([L, P, 2, ps, KVH*D]) — the decode walk contracts q against
        # [ck, KVH*D] chunks with NO class columns (fcK=1), measured 140
        # vs 243 us/layer at ppc=8.  bf16 only: token writes are group-
        # merged RMW of the aligned (8, 128) HBM tile rows (ops/kv_write.py
        # wide kernels — Mosaic ps-dim DMA slices must cover whole tiles).
        import os

        if (
            itemsize == 2
            and (self.kv_heads * self.head_dim) % 128 == 0
            and self.page_size % 8 == 0
            and os.environ.get("SGLT_KV_WIDE", "1") != "0"
        ):
            return "wide"
        fck = 4 if itemsize == 1 else 2
        if self.kv_heads % fck != 0:
            return "combined"
        return "split"

    @property
    def split_faces(self) -> int:
        """K (or V) sublane rows per token in the split layout: Mosaic
        second-minor slices must align to the tile (2 rows bf16, 4 rows
        1-byte), so single-token face writes need this many rows."""
        return 4 if jnp.dtype(self.jdtype).itemsize == 1 else 2

    @property
    def shape(self):
        if self.layout == "latent":
            return (
                self.num_layers,
                self.num_pages,
                self.page_size,
                self.head_dim,
            )
        if self.layout == "wide":
            return (
                self.num_layers,
                self.num_pages,
                2,  # 0 = K, 1 = V
                self.page_size,
                self.kv_heads * self.head_dim,
            )
        if self.layout == "split":
            fck = self.split_faces
            return (
                self.num_layers,
                self.num_pages,
                2,  # 0 = K, 1 = V
                self.page_size,
                fck,
                self.kv_heads * self.head_dim // fck,
            )
        fr = self.face_rows
        if fr == 4 and self.kv_heads % 2 != 0:
            raise ValueError(
                f"fp8/int8 KV needs an even per-shard kv-head count "
                f"(got {self.kv_heads}): a head must not straddle the "
                f"two K sublane rows of the 4-row token face"
            )
        return (
            self.num_layers,
            self.num_pages,
            self.page_size,
            fr,
            2 * self.kv_heads * self.head_dim // fr,
        )

    def bytes_per_token(self) -> int:
        itemsize = jnp.dtype(self.jdtype).itemsize
        kv_copies = 1 if self.shared_kv else 2
        return (
            kv_copies * self.num_layers * self.kv_heads * self.head_dim
            * itemsize
        )

    def alloc(self) -> jax.Array:
        return jnp.zeros(self.shape, self.jdtype)


def pool_kind(kv_cache) -> str:
    """Layout of a pool array: latent (4D), split (6D), wide (5D with the
    K/V face axis at dim 2), combined (5D token faces).  Wide and combined
    are both 5-D: wide has shape[2] == 2 (faces) and shape[3] = page_size
    >= 8; combined has shape[2] = page_size and shape[3] = face_rows <= 4."""
    if kv_cache.ndim == 4:
        return "latent"
    if kv_cache.ndim == 6:
        return "split"
    if kv_cache.ndim == 5 and kv_cache.shape[2] == 2 and kv_cache.shape[3] > 4:
        return "wide"
    return "combined"


def write_kv(
    kv_cache: jax.Array,  # [L, P, ps, 2, KVH*D]
    k_new: jax.Array,  # [T, KVH, D]
    v_new: jax.Array,
    slots: jax.Array,  # [T] int32 flat slot = page * ps + offset (may contain
    #                    PAD_SLOT entries for padded tokens)
    layer: jax.Array | int,
    mode: str = "decode",  # "decode" | "prefill" | "spec"
    spec_span: int = 0,  # QS for mode="spec" (contiguous tokens per sequence)
) -> jax.Array:
    """Write new K/V rows into the pool at flat token slots.

    On TPU this MUST be the Pallas in-place kernels (ops/kv_write.py): XLA
    lowers the jnp scatter with layout-conversion copies of the full pool.
    The jnp scatter remains as the CPU/test path.
    """
    from sglang_awq_tpu.utils import is_tpu_backend

    T = k_new.shape[0]
    if kv_cache.ndim == 4:  # latent layout [L, P, ps, Xr]: K == V, one row
        L, P, ps, Xr = kv_cache.shape
        rf = k_new.astype(kv_cache.dtype).reshape(T, Xr)
        if is_tpu_backend():
            from sglang_awq_tpu.ops.kv_write import (
                kv_write_prefill_latent,
                kv_write_tokens_latent,
            )

            if mode == "prefill":
                num_slots = P * ps
                group_slots = slots.reshape(T // ps, ps)[:, 0]
                valid = (group_slots >= 0) & (group_slots < num_slots)
                pages = jnp.where(valid, group_slots // ps, -1)
                return kv_write_prefill_latent(kv_cache, rf, pages, layer)
            return kv_write_tokens_latent(kv_cache, rf, slots, layer)
        layer = jnp.asarray(layer, jnp.int32)
        return kv_cache.at[layer, slots // ps, slots % ps].set(
            rf, mode="drop"
        )
    if pool_kind(kv_cache) == "wide":  # [L, P, 2, ps, KVH*D]
        L, P, _, ps, Xr = kv_cache.shape
        kf = k_new.astype(kv_cache.dtype).reshape(T, Xr)
        vf = v_new.astype(kv_cache.dtype).reshape(T, Xr)
        if is_tpu_backend():
            from sglang_awq_tpu.ops.kv_write import (
                kv_write_prefill_wide,
                kv_write_tokens_wide,
            )

            if mode == "prefill":
                num_slots = P * ps
                group_slots = slots.reshape(T // ps, ps)[:, 0]
                valid = (group_slots >= 0) & (group_slots < num_slots)
                pages = jnp.where(valid, group_slots // ps, -1)
                return kv_write_prefill_wide(kv_cache, kf, vf, pages, layer)
            if mode == "decode":
                # one token per SEQUENCE -> distinct 8-row tile groups by
                # construction (a page belongs to one sequence): the lean
                # kernel skips the group-merge machinery
                from sglang_awq_tpu.ops.kv_write import (
                    kv_write_tokens_wide_decode)

                return kv_write_tokens_wide_decode(
                    kv_cache, kf, vf, slots, layer)
            return kv_write_tokens_wide(kv_cache, kf, vf, slots, layer)
        layer = jnp.asarray(layer, jnp.int32)
        pages = slots // ps
        offs = slots % ps
        kv_cache = kv_cache.at[layer, pages, 0, offs].set(kf, mode="drop")
        kv_cache = kv_cache.at[layer, pages, 1, offs].set(vf, mode="drop")
        return kv_cache
    if kv_cache.ndim == 6:  # split layout [L, P, 2, ps, fcK, XrK]
        L, P, _, ps, fck, XrK = kv_cache.shape
        kf = k_new.astype(kv_cache.dtype).reshape(T, fck, XrK)
        vf = v_new.astype(kv_cache.dtype).reshape(T, fck, XrK)
        if is_tpu_backend():
            from sglang_awq_tpu.ops.kv_write import (
                kv_write_prefill_split,
                kv_write_tokens_split,
            )

            if mode == "prefill":
                num_slots = P * ps
                group_slots = slots.reshape(T // ps, ps)[:, 0]
                valid = (group_slots >= 0) & (group_slots < num_slots)
                pages = jnp.where(valid, group_slots // ps, -1)
                return kv_write_prefill_split(kv_cache, kf, vf, pages, layer)
            return kv_write_tokens_split(kv_cache, kf, vf, slots, layer)
        layer = jnp.asarray(layer, jnp.int32)
        pages = slots // ps
        offs = slots % ps
        kv_cache = kv_cache.at[layer, pages, 0, offs].set(kf, mode="drop")
        kv_cache = kv_cache.at[layer, pages, 1, offs].set(vf, mode="drop")
        return kv_cache

    fr = kv_cache.shape[-2]
    kf = k_new.astype(kv_cache.dtype).reshape(T, -1)
    vf = v_new.astype(kv_cache.dtype).reshape(T, -1)
    if fr == 2:
        kv_new = jnp.stack([kf, vf], axis=1)  # [T, 2, KVH*D]
    else:  # 4-row face for 1-byte dtypes: (K_lo, K_hi, V_lo, V_hi)
        half = kf.shape[1] // 2
        kv_new = jnp.stack(
            [kf[:, :half], kf[:, half:], vf[:, :half], vf[:, half:]], axis=1
        )  # [T, 4, KVH*D/2]

    if is_tpu_backend():
        from sglang_awq_tpu.ops.kv_write import kv_write_prefill, kv_write_tokens

        if mode == "prefill":
            ps_ = kv_cache.shape[2]
            num_slots = kv_cache.shape[1] * ps_
            group_slots = slots.reshape(T // ps_, ps_)[:, 0]
            valid = (group_slots >= 0) & (group_slots < num_slots)
            pages = jnp.where(valid, group_slots // ps_, -1)
            return kv_write_prefill(kv_cache, kv_new, pages, layer)
        # decode and spec are both "scatter distinct token rows": every live
        # slot is unique, so one face-DMA kernel serves both.
        return kv_write_tokens(kv_cache, kv_new, slots, layer)

    L, P, ps, _, X = kv_cache.shape
    layer = jnp.asarray(layer, jnp.int32)
    pages = slots // ps
    offs = slots % ps
    kv_cache = kv_cache.at[layer, pages, offs].set(kv_new, mode="drop")
    return kv_cache
