"""ctypes wrapper over the native C++ radix tree.

Role model: reference `python/sglang/srt/mem_cache/radix_cache_cpp.py`
(Python facade over the pybind tree_v2).  Same public surface as the pure
Python RadixCache so the scheduler can swap implementations
(`--radix-cache-impl cpp|python|auto`).

The shared library is built on first use with g++ (pybind11 is not in the
image; the C ABI + ctypes avoids any build-time Python dependency).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

from sglang_awq_tpu.mem_cache.allocator import PagedAllocator
from sglang_awq_tpu.mem_cache.radix_cache import MatchResult

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "radix_tree.cpp")
_LIB_CACHE: Optional[ctypes.CDLL] = None


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB_CACHE
    if _LIB_CACHE is not None:
        return _LIB_CACHE
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "sglang_awq_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libradix_tree.so")
    if not os.path.exists(so_path) or os.path.getmtime(so_path) < os.path.getmtime(_SRC):
        tmp = so_path + ".tmp"
        cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)
        except Exception as e:  # noqa: BLE001
            logger.warning("C++ radix tree build failed (%s); using Python tree", e)
            return None
    lib = ctypes.CDLL(so_path)
    lib.rt_create.restype = ctypes.c_void_p
    lib.rt_create.argtypes = [ctypes.c_int32]
    lib.rt_destroy.argtypes = [ctypes.c_void_p]
    lib.rt_reset.argtypes = [ctypes.c_void_p]
    lib.rt_match_prefix.restype = ctypes.c_int64
    lib.rt_match_prefix.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.rt_insert.restype = ctypes.c_int64
    lib.rt_insert.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.rt_lock.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int32]
    lib.rt_evict.restype = ctypes.c_int64
    lib.rt_evict.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    for f in ("rt_evictable_pages", "rt_protected_pages", "rt_total_pages"):
        getattr(lib, f).restype = ctypes.c_int64
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    _LIB_CACHE = lib
    return lib


def cpp_tree_available() -> bool:
    return _build_lib() is not None


class CppRadixCache:
    """Drop-in replacement for RadixCache backed by the C++ tree."""

    def __init__(self, allocator: PagedAllocator, page_size: int, disable: bool = False):
        self.lib = _build_lib()
        if self.lib is None:
            raise RuntimeError("C++ radix tree unavailable")
        self.allocator = allocator
        self.page_size = page_size
        self.disable = disable
        self.handle = ctypes.c_void_p(self.lib.rt_create(page_size))
        self._max_pages = allocator.num_pages

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.rt_destroy(self.handle)
        except Exception:
            pass

    def reset(self):
        self.lib.rt_reset(self.handle)

    # -- queries --------------------------------------------------------

    def match_prefix(self, token_ids: List[int], max_pages=None) -> MatchResult:
        if self.disable:
            return MatchResult([], 0, self.page_size)
        if max_pages is not None:
            token_ids = token_ids[: max_pages * self.page_size]
        toks = np.asarray(token_ids, np.int32)
        out = np.empty(max(len(toks) // self.page_size, 1), np.int32)
        node = ctypes.c_uint64(0)
        n = self.lib.rt_match_prefix(
            self.handle,
            toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(toks),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(out),
            ctypes.byref(node),
        )
        return MatchResult(out[:n].tolist(), node.value, self.page_size)

    def evictable_size(self) -> int:
        return int(self.lib.rt_evictable_pages(self.handle)) * self.page_size

    def protected_size(self) -> int:
        return int(self.lib.rt_protected_pages(self.handle)) * self.page_size

    def total_pages(self) -> int:
        return int(self.lib.rt_total_pages(self.handle))

    # -- mutation -------------------------------------------------------

    def insert(self, token_ids: List[int], pages: List[int]) -> int:
        if self.disable:
            return 0
        toks = np.asarray(token_ids, np.int32)
        pg = np.asarray(pages, np.int32)
        return int(
            self.lib.rt_insert(
                self.handle,
                toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(toks),
                pg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(pg),
            )
        )

    def insert2(
        self, token_ids: List[int], pages: List[int], dead_pages: int = 0
    ) -> List[int]:
        """Position-list duplicate reporting (see RadixCache.insert2)."""
        assert dead_pages == 0, "dead pages need the SWA radix tree"
        return list(range(self.insert(token_ids, pages)))

    def inc_lock_ref(self, node) -> None:
        if node:
            self.lib.rt_lock(self.handle, int(node), 1)

    def dec_lock_ref(self, node) -> None:
        if node:
            self.lib.rt_lock(self.handle, int(node), -1)

    def evict(self, num_pages: int) -> int:
        if self.disable:
            return 0
        out = np.empty(self._max_pages, np.int32)
        n = self.lib.rt_evict(
            self.handle,
            num_pages,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(out),
        )
        if n > 0:
            self.allocator.free_pages(out[:n].tolist())
        return int(n)

    # -- self checks ----------------------------------------------------

    def check_invariant(self, request_held_pages: int):
        self.allocator.check_consistency(self.total_pages() + request_held_pages)
