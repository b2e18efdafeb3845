"""L3 pluggable KV storage behind HiCache (round 5).

Reference role: `python/sglang/srt/mem_cache/hicache_storage.py:62`
(`HiCacheStorage` ABC — batch_get/batch_set over hash-chain keys) plus the
backend factory (`srt/mem_cache/storage/backend_factory.py`).  External
stores (mooncake, 3fs, …) are not present in this image; the ABC plus a
posix-directory backend (file per page) makes prefix KV survive server
restarts and gives deployments an integration point for real stores.

Keying: the in-process L2 chain uses Python's salted `hash()` (fine within
one process); L3 keys must be STABLE across restarts, so they are a
blake2b chain over (parent_key, page token ids, pool fingerprint).  The
pool fingerprint folds in layer count / page geometry / dtype so a
checkpoint or config change never deserializes stale bytes.
"""

from __future__ import annotations

import hashlib
import logging
import os
import tempfile
from abc import ABC, abstractmethod
from typing import List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def stable_chain(parent: str, page_tokens: Sequence[int], salt: str = "") -> str:
    """Restart-stable page key: blake2b(parent || tokens || salt)."""
    h = hashlib.blake2b(digest_size=20)
    h.update(parent.encode())
    h.update(np.asarray(page_tokens, np.int64).tobytes())
    if salt:
        h.update(salt.encode())
    return h.hexdigest()


class HiCacheStorage(ABC):
    """Batch KV page store (reference hicache_storage.py:62 surface)."""

    @abstractmethod
    def batch_get(self, keys: List[str]) -> List[Optional[np.ndarray]]:
        """Fetch pages; None per missing key.  Must be all-or-prefix safe:
        callers stop at the first None (prefix semantics)."""

    @abstractmethod
    def batch_set(self, keys: List[str], values: List[np.ndarray]) -> bool:
        """Store pages; best-effort (False = some writes failed)."""

    @abstractmethod
    def exists(self, key: str) -> bool: ...

    def close(self) -> None:  # pragma: no cover - optional
        pass


class PosixDirStorage(HiCacheStorage):
    """File-per-page directory backend: <dir>/<key[:2]>/<key>.npy.

    Writes are atomic (tmp + rename) so a killed server never leaves a
    torn page; reads validate the npy header shape/dtype implicitly."""

    def __init__(self, root: str):
        self.root = os.path.expanduser(root)
        os.makedirs(self.root, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.root, key[:2], key + ".npy")

    def exists(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def batch_get(self, keys: List[str]) -> List[Optional[np.ndarray]]:
        out: List[Optional[np.ndarray]] = []
        for k in keys:
            try:
                out.append(np.load(self._path(k)))
            except (OSError, ValueError):
                out.append(None)
        return out

    def batch_set(self, keys: List[str], values: List[np.ndarray]) -> bool:
        ok = True
        for k, v in zip(keys, values):
            path = self._path(k)
            try:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                fd, tmp = tempfile.mkstemp(
                    dir=os.path.dirname(path), suffix=".tmp")
                with os.fdopen(fd, "wb") as f:
                    np.save(f, v)
                os.replace(tmp, path)
            except OSError:
                logger.exception("posix hicache write failed: %s", path)
                ok = False
        return ok


def create_storage_backend(spec: str) -> HiCacheStorage:
    """Factory (reference backend_factory role): 'posix://<dir>' (alias
    'file://'); extend with real stores by registering schemes here."""
    if "://" not in spec:
        return PosixDirStorage(spec)
    scheme, rest = spec.split("://", 1)
    if scheme in ("posix", "file"):
        return PosixDirStorage(rest)
    raise ValueError(f"unknown hicache storage backend: {scheme!r}")
