"""HiCache: host-memory KV tier (L2) behind the device radix cache.

Role model: reference `mem_cache/hiradix_cache.py` + the device<->host
`cache_controller.py:100` (write-on-evict, load-on-match).  TPU
re-design:

* A "page" for offload purposes spans ALL layers of the combined pool:
  one host entry is [L, ps, fc, Xr] — exactly the face layout the
  kv_write_prefill Pallas kernel consumes, so restore = replay the pages
  through the same whole-page-DMA write path as prefill (no bespoke
  upload kernel, no full-pool scatter).
* Host entries are keyed by a rolling prefix-hash chain
  (h_i = hash((h_{i-1}, page_tokens_i)), verified by the page tuple), so
  lookup walks page-by-page from any device-tree match point without
  storing full prefixes per entry.
* Write-on-evict is ASYNC (reference cache_controller's streaming role):
  the eviction hook only dispatches the device-side page gather — JAX
  executes it in dispatch order, i.e. before any later kv-write can
  reuse the pages — and hands the device array to a writer thread that
  does the blocking device->host fetch and host-index insertion.  The
  scheduling hot path never waits on PCIe/relay.  The rare load-on-match
  path (request intake) flushes the writer first, so lookups observe
  every completed eviction.

Enabled with --enable-hierarchical-cache / --hicache-size-gb; requires
the Python radix tree (the C++ tree gains the evict hook later).
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)


class HostKVCache:
    """Bounded host pool of whole-prefix-page KV entries (LRU)."""

    def __init__(self, kv_spec, capacity_bytes: int):
        # page dims: [ps, fc, Xr] (combined) or [2, ps, fcK, XrK] (split)
        shape = kv_spec.shape
        L = shape[0]
        self.page_shape = (L,) + shape[2:]
        itemsize = np.dtype(kv_spec.jdtype).itemsize
        self.page_bytes = int(np.prod(self.page_shape)) * itemsize
        self.capacity = max(int(capacity_bytes // self.page_bytes), 1)
        self.store = np.empty((self.capacity,) + self.page_shape,
                              kv_spec.jdtype)
        # (parent_hash, page_tokens) -> (slot, own_hash)
        self.index: Dict[Tuple[int, tuple], Tuple[int, int]] = {}
        self._slot_key: List[Optional[tuple]] = [None] * self.capacity
        self._lru: Dict[Tuple[int, tuple], int] = {}  # key -> tick
        self._tick = 0
        self.hits = 0
        self.misses = 0
        logger.info(
            "HiCache host pool: %d pages x %.2f MiB",
            self.capacity, self.page_bytes / 1024**2,
        )

    @staticmethod
    def chain(parent_hash: int, page_tokens: tuple) -> int:
        return hash((parent_hash, page_tokens))

    def _alloc_slot(self) -> int:
        if len(self.index) < self.capacity:
            used = {s for s, _ in self.index.values()}
            for s in range(self.capacity):
                if s not in used:
                    return s
        victim = min(self._lru, key=self._lru.get)
        slot, _ = self.index.pop(victim)
        del self._lru[victim]
        return slot

    def put(self, parent_hash: int, page_tokens: tuple, data: np.ndarray) -> int:
        """Store one page -> its chain hash."""
        key = (parent_hash, page_tokens)
        h = self.chain(parent_hash, page_tokens)
        if key in self.index:
            slot, _ = self.index[key]
        else:
            slot = self._alloc_slot()
            self.index[key] = (slot, h)
        self.store[slot] = data
        self._tick += 1
        self._lru[key] = self._tick
        return h

    def get(self, parent_hash: int, page_tokens: tuple):
        """-> (slot, chain_hash) | None."""
        hit = self.index.get((parent_hash, page_tokens))
        if hit is None:
            self.misses += 1
            return None
        self.hits += 1
        self._tick += 1
        self._lru[(parent_hash, page_tokens)] = self._tick
        return hit


class HiCacheController:
    """Device<->host transfer glue owned by the scheduler."""

    def __init__(self, runner, capacity_bytes: int, page_size: int,
                 storage: Optional[str] = None):
        self.runner = runner
        self.page_size = page_size
        self.host = HostKVCache(runner.kv_spec, capacity_bytes)
        # L3 (round 5): pluggable persistent store behind the host tier —
        # reference HiCacheStorage ABC (hicache_storage.py:62).  Keys are
        # restart-stable blake2b chains salted with the pool geometry.
        self.storage = None
        self._salt = ""
        if storage:
            from sglang_awq_tpu.mem_cache.hicache_storage import (
                create_storage_backend)

            self.storage = create_storage_backend(storage)
            spec = runner.kv_spec
            self._salt = f"{spec.shape}|{np.dtype(spec.jdtype).name}"
            # npy files can't carry ml_dtypes (bf16/fp8): store pages as
            # same-width unsigned-int views and view back on load
            self._pool_dt = np.dtype(spec.jdtype)
            self._raw_dt = np.dtype(f"u{self._pool_dt.itemsize}")
        # async writer: device->host fetches happen off the scheduler thread
        self._writes: "queue.Queue" = queue.Queue()
        self._host_lock = threading.Lock()
        self._writer = threading.Thread(
            target=self._write_loop, name="hicache-writer", daemon=True
        )
        self._writer.start()

    # -- device -> host (evict hook) -----------------------------------

    def on_evict(self, full_key: List[tuple], pages: List[int]):
        """Called by the radix tree with the evicted node's FULL key path
        (list of page-token tuples, root->node) and its device pages
        (aligned with the key tail).  Only DISPATCHES the gather here:
        device execution order guarantees it reads the pages before any
        later kv-write reuses them; the writer thread does the fetch."""
        n = len(pages)
        if n == 0:
            return
        import jax.numpy as jnp

        data_dev = jnp.take(
            self.runner.kv_cache, jnp.asarray(pages, jnp.int32), axis=1
        )  # [L, n, ps, fc, Xr], async on device
        self._writes.put((list(full_key), n, data_dev))

    def _write_loop(self):
        while True:
            item = self._writes.get()
            try:
                full_key, n, data_dev = item
                data = np.moveaxis(np.asarray(data_dev), 1, 0)  # [n, L, ...]
                h = 0
                for pk in full_key[: len(full_key) - n]:
                    h = self.host.chain(h, pk)
                with self._host_lock:
                    for i, pk in enumerate(full_key[len(full_key) - n:]):
                        h = self.host.put(h, pk, data[i])
                if self.storage is not None:
                    from sglang_awq_tpu.mem_cache.hicache_storage import (
                        stable_chain)

                    sh = ""
                    for pk in full_key[: len(full_key) - n]:
                        sh = stable_chain(sh, pk, self._salt)
                    keys, vals = [], []
                    for i, pk in enumerate(full_key[len(full_key) - n:]):
                        sh = stable_chain(sh, pk, self._salt)
                        keys.append(sh)
                        vals.append(np.ascontiguousarray(
                            data[i]).view(self._raw_dt))
                    self.storage.batch_set(keys, vals)
            except Exception:  # noqa: BLE001
                logger.exception("hicache writer failed (entry dropped)")
            finally:
                self._writes.task_done()

    def flush(self):
        """Block until every dispatched eviction landed in the host index."""
        self._writes.join()

    # -- host -> device (match extension) ------------------------------

    def match_extend(self, keys: List[tuple], matched_pages: int):
        """Pages past the device match that exist on host: returns a COPY
        of their KV data [n, L, ps, fc, Xr] (n may be 0).  A copy — not
        slot indices — because the async writer may LRU-recycle a host
        slot between lookup and restore (e.g. when making device room for
        the restore evicts more pages).  keys = the prompt's full
        page-key list."""
        self.flush()  # intake is rare; observe all completed evictions
        h = 0
        for pk in keys[:matched_pages]:
            h = self.host.chain(h, pk)
        slots = []
        with self._host_lock:
            walked = matched_pages
            for pk in keys[matched_pages:]:
                hit = self.host.get(h, pk)
                if hit is None:
                    break
                slot, h = hit
                slots.append(slot)
                walked += 1
            out = self.host.store[slots].copy()
        if self.storage is None:
            return out
        # L3 continuation: pages past the L2 match may still live in the
        # persistent store (e.g. after a server restart, when L2 is empty)
        from sglang_awq_tpu.mem_cache.hicache_storage import stable_chain

        sh = ""
        for pk in keys[:walked]:
            sh = stable_chain(sh, pk, self._salt)
        l3_keys = []
        for pk in keys[walked:]:
            sh = stable_chain(sh, pk, self._salt)
            l3_keys.append(sh)
        if not l3_keys:
            return out
        got = self.storage.batch_get(l3_keys)
        extra = []
        for g in got:
            if g is None or g.shape != self.host.page_shape:
                break
            extra.append(g.view(self._pool_dt))
        if not extra:
            return out
        if len(out):
            return np.concatenate([out, np.stack(extra)], axis=0)
        return np.stack(extra)

    def restore(self, data, device_pages: List[int]):
        """Upload host entries into freshly-allocated device pages through
        the prefill write kernel (whole-page DMAs per layer)."""
        assert len(data) == len(device_pages)
        self.restore_raw(data, device_pages)

    def restore_raw(self, data, device_pages: List[int]):
        """data [n, L, <page dims>] -> device pages (PD transfer reuses
        this without a host tier).  Page dims are [ps, fc, Xr] (combined
        pool) or [2, ps, fcK, XrK] (split pool)."""
        data = np.ascontiguousarray(np.moveaxis(np.asarray(data), 1, 0))
        L, n = data.shape[0], data.shape[1]
        from sglang_awq_tpu.mem_cache.kv_pool import pool_kind

        kind = pool_kind(self.runner.kv_cache)
        if kind in ("split", "wide"):  # K/V page faces
            ps = data.shape[3]
            k = np.ascontiguousarray(data[:, :, 0]).reshape(
                L, n * ps, *data.shape[4:]
            )
            v = np.ascontiguousarray(data[:, :, 1]).reshape(
                L, n * ps, *data.shape[4:]
            )
            self.runner.kv_cache = self._restore_fn(n)(
                self.runner.kv_cache, k, v,
                np.asarray(device_pages, np.int32),
            )
            return
        ps = data.shape[2]
        self.runner.kv_cache = self._restore_fn(n)(
            self.runner.kv_cache,
            data.reshape(L, n * ps, *data.shape[3:]),
            np.asarray(device_pages, np.int32),
        )

    def _restore_fn(self, n_pages: int):
        from sglang_awq_tpu.mem_cache.kv_pool import pool_kind

        kind = pool_kind(self.runner.kv_cache)
        split = kind in ("split", "wide")
        wide = kind == "wide"
        latent = kind == "latent"
        key = ("hicache_restore", n_pages, split, latent, wide)
        fns = self.runner._fns
        if key not in fns:
            import jax
            import jax.numpy as jnp

            from sglang_awq_tpu.ops.kv_write import (
                kv_write_prefill,
                kv_write_prefill_latent,
                kv_write_prefill_split,
                kv_write_prefill_wide,
            )
            if latent:
                kv_write_prefill = kv_write_prefill_latent  # noqa: F811
            write_faces = kv_write_prefill_wide if wide else \
                kv_write_prefill_split

            if split:

                def raw(kv, k, v, pages):
                    def body(kv, args):
                        l, lk, lv = args
                        return write_faces(kv, lk, lv, pages, l), None

                    kv, _ = jax.lax.scan(
                        body, kv, (jnp.arange(kv.shape[0]), k, v)
                    )
                    return kv

            else:

                def raw(kv, data, pages):
                    def body(kv, args):
                        l, layer_data = args
                        return kv_write_prefill(kv, layer_data, pages, l), None

                    kv, _ = jax.lax.scan(
                        body, kv, (jnp.arange(kv.shape[0]), data)
                    )
                    return kv

            fns[key] = jax.jit(raw, donate_argnums=(0,))
        return fns[key]
