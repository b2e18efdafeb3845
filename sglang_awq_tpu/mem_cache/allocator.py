"""Paged KV allocator (host side).

Role model: the reference's `PagedTokenToKVPoolAllocator`
(`python/sglang/srt/mem_cache/allocator.py:411` — `alloc_extend` /
`alloc_decode` over a device free-list with Triton helpers).  On TPU the
allocator is pure host bookkeeping: it hands out PAGE indices into the
device pool; token slot = page * page_size + offset is computed where
needed.  The scheduler's budget arithmetic (SURVEY.md §A.4) only needs
`available_size()` in tokens.

Debug accounting mirrors the reference's allocator self-checks
(`allocator.py:432` SGLANG_DEBUG_MEMORY_POOL): `check_consistency()`
asserts no page is double-allocated or double-freed.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from sglang_awq_tpu.environ import envs
from sglang_awq_tpu.utils import cdiv


class PagedAllocator:
    def __init__(self, num_pages: int, page_size: int):
        assert num_pages > 0 and page_size >= 1
        self.num_pages = num_pages
        self.page_size = page_size
        self._free: List[int] = list(range(num_pages - 1, -1, -1))  # stack
        self._allocated = np.zeros(num_pages, dtype=bool)
        self.debug = envs.SGLT_DEBUG_MEMORY_POOL.value

    # --- queries -----------------------------------------------------------

    def available_pages(self) -> int:
        return len(self._free)

    def available_size(self) -> int:
        """Free capacity in TOKENS (reference available_size semantics)."""
        return len(self._free) * self.page_size

    def pages_needed(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.page_size)

    # --- alloc / free ------------------------------------------------------

    def alloc_pages(self, n: int) -> Optional[List[int]]:
        """Allocate n pages, or None if not enough (all-or-nothing)."""
        if n > len(self._free):
            return None
        pages = [self._free.pop() for _ in range(n)]
        if self.debug:
            assert not self._allocated[pages].any(), "double allocation"
        self._allocated[pages] = True
        return pages

    def alloc_extend(
        self, seq_len_before: int, seq_len_after: int, existing_pages: List[int]
    ) -> Optional[List[int]]:
        """Pages to grow a sequence from seq_len_before to seq_len_after tokens.

        Returns ONLY the newly allocated pages (caller appends to its page
        list), or None on OOM.  Mirrors reference `alloc_extend`
        (`allocator.py:411+`): the partially-filled last page is reused.
        """
        have = len(existing_pages)
        assert have == self.pages_needed(seq_len_before) or (
            seq_len_before == 0 and have == 0
        ), (seq_len_before, have)
        need = self.pages_needed(seq_len_after) - have
        if need <= 0:
            return []
        return self.alloc_pages(need)

    def alloc_decode(self, seq_len_after: int, existing_pages: List[int]) -> Optional[List[int]]:
        """One decode step: grow by a single token (reference alloc_decode)."""
        return self.alloc_extend(seq_len_after - 1, seq_len_after, existing_pages)

    def free_pages(self, pages: List[int]):
        if not pages:
            return
        if self.debug:
            assert self._allocated[pages].all(), "double free"
        self._allocated[list(pages)] = False
        self._free.extend(pages)

    # --- self checks (reference scheduler_runtime_checker_mixin.py:173) ----

    def check_consistency(self, external_pages: int):
        """available + externally-held == total (decode self-check invariant)."""
        assert len(self._free) + external_pages == self.num_pages, (
            f"page leak: free={len(self._free)} held={external_pages} "
            f"total={self.num_pages}"
        )

    def clear(self):
        self._free = list(range(self.num_pages - 1, -1, -1))
        self._allocated[:] = False
