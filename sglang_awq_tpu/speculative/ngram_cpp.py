"""ctypes facade over the native n-gram cache (reference cpp_ngram role).

Drop-in replacement for NgramCache; the scheduler prefers it when the C++
toolchain is available (`CppNgramCache` mirrors update/draft).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "csrc", "ngram_cache.cpp")
_LIB: Optional[ctypes.CDLL] = None


def _build() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    cache_dir = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "sglang_awq_tpu",
    )
    os.makedirs(cache_dir, exist_ok=True)
    so = os.path.join(cache_dir, "libngram_cache.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(_SRC):
        tmp = so + ".tmp"
        try:
            subprocess.run(
                ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp, so)
        except Exception as e:  # noqa: BLE001
            logger.warning("C++ ngram cache build failed (%s)", e)
            return None
    lib = ctypes.CDLL(so)
    lib.ng_create.restype = ctypes.c_void_p
    lib.ng_create.argtypes = [ctypes.c_int32, ctypes.c_int64]
    lib.ng_destroy.argtypes = [ctypes.c_void_p]
    lib.ng_update.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.ng_draft.restype = ctypes.c_int64
    lib.ng_draft.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.ng_size.restype = ctypes.c_int64
    lib.ng_size.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


def cpp_ngram_available() -> bool:
    return _build() is not None


class CppNgramCache:
    def __init__(self, n: int = 3, capacity: int = 1 << 20):
        self.lib = _build()
        if self.lib is None:
            raise RuntimeError("C++ ngram cache unavailable")
        self.n = n
        self.handle = ctypes.c_void_p(self.lib.ng_create(n, capacity))

    def __del__(self):
        try:
            if getattr(self, "handle", None):
                self.lib.ng_destroy(self.handle)
        except Exception:
            pass

    def update(self, tokens: Sequence[int]):
        arr = np.asarray(tokens, np.int32)
        self.lib.ng_update(
            self.handle,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
        )

    def draft(self, context: Sequence[int], k: int) -> List[int]:
        ctx = np.asarray(context, np.int32)
        out = np.empty(max(k, 1), np.int32)
        m = self.lib.ng_draft(
            self.handle,
            ctx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(ctx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            k,
        )
        return out[:m].tolist()
