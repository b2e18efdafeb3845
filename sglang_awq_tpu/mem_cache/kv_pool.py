"""Device-resident paged KV pool.

Role model: reference `MHATokenToKVPool`
(`python/sglang/srt/mem_cache/memory_pool.py:605` — per-layer K/V buffers +
`set_kv_buffer`).  TPU shape (SURVEY.md §7 decision 4, head-major for
contiguous page DMA — see ops/paged_attention.py):

    k_cache, v_cache : [num_layers, kv_heads, num_pages, page_size, head_dim]

All mutation is functional: `write_kv` returns updated arrays and is called
inside the jitted model step with donated buffers, so XLA performs the
scatter in place.
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

    @property
    def jdtype(self):
        return {
            "bfloat16": jnp.bfloat16,
            "int8": jnp.int8,
            "fp8_e4m3": jnp.float8_e4m3fn,
        }[self.dtype]

    @property
    def shape(self):
        return (
            self.num_layers,
            self.kv_heads,
            self.num_pages,
            self.page_size,
            self.head_dim,
        )

    def bytes_per_token(self) -> int:
        itemsize = jnp.dtype(self.jdtype).itemsize
        return 2 * self.num_layers * self.kv_heads * self.head_dim * itemsize

    def alloc(self) -> Tuple[jax.Array, jax.Array]:
        z = jnp.zeros(self.shape, self.jdtype)
        return z, jnp.zeros_like(z)


def write_kv(
    k_cache: jax.Array,  # [L, KVH, P, ps, D]
    v_cache: jax.Array,
    k_new: jax.Array,  # [T, KVH, D]
    v_new: jax.Array,
    slots: jax.Array,  # [T] int32 flat slot = page * ps + offset (may contain
    #                    PAD_SLOT entries for padded tokens)
    layer: jax.Array | int,
    mode: str = "decode",  # "decode" | "prefill" | "spec"
    spec_span: int = 0,  # QS for mode="spec" (contiguous tokens per sequence)
) -> Tuple[jax.Array, jax.Array]:
    """Write new K/V rows into the pool at flat token slots.

    On TPU this MUST be the Pallas in-place kernels (ops/kv_write.py): XLA
    lowers the jnp scatter with a token-major preferred layout and inserts
    full-pool layout-conversion copies (2x pool HBM -> instant OOM at
    serving sizes).  The jnp scatter remains as the CPU/test path.
    """
    from sglang_awq_tpu.utils import is_tpu_backend

    if is_tpu_backend():
        from sglang_awq_tpu.ops.kv_write import kv_write_decode, kv_write_prefill

        if mode == "spec":
            from sglang_awq_tpu.ops.kv_write import kv_write_spec

            B = k_new.shape[0] // spec_span
            KVH, D = k_new.shape[1], k_new.shape[2]
            return kv_write_spec(
                k_cache,
                v_cache,
                k_new.reshape(B, spec_span, KVH, D),
                v_new.reshape(B, spec_span, KVH, D),
                slots.reshape(B, spec_span),
                layer,
            )
        if mode == "prefill":
            T = k_new.shape[0]
            ps_ = k_cache.shape[3]
            num_slots = k_cache.shape[2] * ps_
            group_slots = slots.reshape(T // ps_, ps_)[:, 0]
            pages = group_slots // ps_
            n_pages = jnp.sum(
                ((group_slots >= 0) & (group_slots < num_slots)).astype(jnp.int32)
            )
            return kv_write_prefill(
                k_cache, v_cache, k_new, v_new, pages, n_pages, layer
            )
        return kv_write_decode(k_cache, v_cache, k_new, v_new, slots, layer)
    L, KVH, P, ps, D = k_cache.shape
    layer = jnp.asarray(layer, jnp.int32)
    pages = slots // ps
    offs = slots % ps
    # Index layout: layer (traced scalar) + pages/offs are ADVANCED indices
    # separated by the kv-head slice, so the broadcast [T] dims move to the
    # front: the update value has shape [T, KVH, D].
    k_cache = k_cache.at[layer, :, pages, offs, :].set(
        k_new.astype(k_cache.dtype), mode="drop"
    )
    v_cache = v_cache.at[layer, :, pages, offs, :].set(
        v_new.astype(v_cache.dtype), mode="drop"
    )
    return k_cache, v_cache


def gather_kv(
    k_cache: jax.Array,  # [L, KVH, P, ps, D]
    v_cache: jax.Array,
    pages: jax.Array,  # [n] int32 page ids (padded entries arbitrary)
    layer: jax.Array | int,
) -> Tuple[jax.Array, jax.Array]:
    """Gather whole pages -> contiguous [KVH, n*ps, D] (prefill attention)."""
    L, KVH, P, ps, D = k_cache.shape
    layer = jnp.asarray(layer, jnp.int32)
    kl = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vl = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    kg = kl[:, pages].reshape(KVH, -1, D)
    vg = vl[:, pages].reshape(KVH, -1, D)
    return kg, vg
