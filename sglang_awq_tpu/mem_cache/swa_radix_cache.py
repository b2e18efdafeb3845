"""Sliding-window-aware radix tree (SWA prefix cache).

Role model: the reference's SWARadixCache
(`python/sglang/srt/mem_cache/swa_radix_cache.py:331` — tombstoned nodes
`:50-98`, window-validated matching `_match_prefix_helper:800-858`, two-tier
locks `inc_lock_ref:675`, swa eviction `evict:590`).

For models where EVERY layer attends through a sliding window, KV deeper
than (window + DMA margin) below the current fill boundary is never read
again.  The reference keeps separate full/SWA token pools; on TPU the KV
pool is one page-granular array shared by all layers, so this tree applies
only to all-SWA models (hybrid global/local models keep the plain tree — a
page holds every layer's KV and a single global layer pins it).

Mechanics, TPU-adapted to the page-granular tree in radix_cache.py:

* tombstone: a node whose pages were handed back to the allocator; its
  KEYS stay in the tree so deep prefixes remain matchable, its `pages`
  become placeholder 0s (valid-but-never-read — the attention kernel DMAs
  nothing below window+margin, mirroring the scheduler's active-sequence
  release rule in `_release_swa_pages`).
* match validity: a match of L pages is usable iff the trailing
  `win_pages` pages before L are live — extension from token L*ps attends
  only to (L*ps - window, L*ps].  The walk records the deepest boundary
  where >= win_pages pages matched since the last tombstone (reference
  `match_len_since_tombstone`).
* two-tier locks: `lock_ref` protects the whole path's KEYS from full
  eviction (as in the plain tree); `swa_lock_ref` additionally protects
  the trailing `win_pages` of a running request's matched path from
  tombstoning.  The window only slides forward, so locking the tail once
  at match time is sufficient for the request's lifetime.
* eviction: under pressure, first TOMBSTONE front-most unlocked nodes
  (free KV, keep keys — long prefixes stay reusable), then fall back to
  the plain leaves-first LRU full eviction.

Lock-drift note: inc/dec walk root-ward accumulating page counts to find
the swa-locked tail; a node split between inc and dec can leave a stray
swa_lock_ref on the upper half (conservative: the page stays pinned).
dec saturates at 0, so underflow is impossible (see dec_lock_ref).
"""

from __future__ import annotations

import heapq
import time
from typing import List, Optional

from sglang_awq_tpu.mem_cache.allocator import PagedAllocator
from sglang_awq_tpu.mem_cache.radix_cache import MatchResult, RadixCache, TreeNode
from sglang_awq_tpu.utils import cdiv

# Largest span the ragged-attention kernel may DMA below the window start
# (chunk granularity: ppc<=16 pages x page_size<=64); pages below
# window+margin are provably never read.  Must match the scheduler's
# active-release margin (`_release_swa_pages`).
SWA_DMA_MARGIN = 1024


class SWARadixCache(RadixCache):
    """Page-granular radix tree with tombstoned (KV-freed) interior nodes."""

    def __init__(
        self,
        allocator: PagedAllocator,
        page_size: int,
        window: int,
        margin: int = SWA_DMA_MARGIN,
        disable: bool = False,
    ):
        assert window > 0
        self.window = window
        self.win_pages = cdiv(window + margin, page_size)
        super().__init__(allocator, page_size, disable=disable)

    # ------------------------------------------------------------------
    # window-validated matching
    # ------------------------------------------------------------------

    def match_prefix(
        self, token_ids: List[int], max_pages: Optional[int] = None
    ) -> MatchResult:
        """Deepest matched boundary whose trailing win_pages are live.

        Tombstoned pages inside the returned prefix are placeholder 0s —
        they sit deeper than window+margin below the boundary, so the
        attention kernel never reads them.
        """
        if self.disable:
            return MatchResult([], self.root, self.page_size)
        keys = self._page_keys(token_ids)
        if max_pages is not None:
            keys = keys[:max_pages]
        node = self.root
        pages: List[int] = []
        best_len = 0
        best_node = self.root
        since_tomb = float("inf")  # pages matched since last tombstone
        i = 0
        while i < len(keys):
            child = node.children.get(keys[i])
            if child is None:
                break
            child.last_access_time = time.monotonic()
            j = 0
            while j < len(child.key) and i + j < len(keys) and child.key[j] == keys[i + j]:
                j += 1
            if j == 0:
                break
            if j < len(child.key):
                # split so the matched boundary is a node boundary
                child = self._split_node(child, j)
            if child.tombstone:
                if since_tomb >= self.win_pages:
                    best_len, best_node = len(pages), node
                since_tomb = 0
            else:
                since_tomb += j
            pages.extend(child.pages)
            i += j
            node = child
        if since_tomb >= self.win_pages:
            best_len, best_node = len(pages), node
        return MatchResult(pages[:best_len], best_node, self.page_size)

    # ------------------------------------------------------------------
    # insertion with released (dead) prefixes + tombstone revival
    # ------------------------------------------------------------------

    def insert2(
        self, token_ids: List[int], pages: List[int], dead_pages: int = 0
    ) -> List[int]:
        """Insert a request's filled pages; first `dead_pages` entries of
        `pages` are placeholders (the scheduler already released that KV
        past the window).

        Per position:
        * tree live, ours live  -> duplicate: position returned (caller
          frees its copy)
        * tree live, ours dead  -> nothing (tree copy wins; ours is gone)
        * tree tombstoned, ours live -> REVIVE: the tree adopts our pages
          (ownership transfers — NOT a duplicate)
        * tree tombstoned/missing, ours dead -> tombstoned node (keys only)
        * tree missing, ours live -> new live node (tree takes ownership)
        """
        if self.disable:
            return []
        keys = self._page_keys(token_ids)
        pages = pages[: len(keys)]
        assert len(pages) == len(keys), (len(pages), len(keys))
        dead_pages = min(dead_pages, len(keys))
        node = self.root
        i = 0
        dup_pos: List[int] = []
        while i < len(keys):
            child = node.children.get(keys[i])
            if child is None:
                if i < dead_pages:
                    d = TreeNode()
                    d.parent = node
                    d.key = keys[i:dead_pages]
                    d.pages = [0] * len(d.key)
                    d.tombstone = True
                    node.children[keys[i]] = d
                    node, i = d, dead_pages
                    if i >= len(keys):
                        return dup_pos
                new = TreeNode()
                new.parent = node
                new.key = keys[i:]
                new.pages = list(pages[i:])
                node.children[keys[i]] = new
                self._tree_pages += len(new.pages)
                return dup_pos
            child.last_access_time = time.monotonic()
            j = 0
            while j < len(child.key) and i + j < len(keys) and child.key[j] == keys[i + j]:
                j += 1
            if j == 0:
                # first page diverges mid-page-key cannot happen (children
                # keyed by first page), but guard against pathological input
                break
            if j < len(child.key):
                child = self._split_node(child, j)
            # split at the dead/live boundary so handling is uniform
            if child.tombstone and i < dead_pages < i + j:
                child = self._split_node(child, dead_pages - i)
                j = dead_pages - i
            if child.tombstone:
                if i >= dead_pages:
                    # revive: adopt the caller's live pages
                    child.pages = list(pages[i : i + j])
                    child.tombstone = False
                    self._tree_pages += j
                # else: both copies dead — node stays a tombstone
            else:
                for p in range(i, i + j):
                    if p >= dead_pages:
                        dup_pos.append(p)
            i += j
            node = child
        return dup_pos

    # ------------------------------------------------------------------
    # two-tier locks
    # ------------------------------------------------------------------

    def inc_lock_ref(self, node: TreeNode):
        """Full-lock the whole path; swa-lock the trailing win_pages."""
        remaining = self.win_pages
        n = node
        while n is not None and n is not self.root:
            n.lock_ref += 1
            if remaining > 0:
                n.swa_lock_ref += 1
                remaining -= len(n.key)
            n = n.parent

    def dec_lock_ref(self, node: TreeNode):
        remaining = self.win_pages
        n = node
        while n is not None and n is not self.root:
            assert n.lock_ref > 0
            n.lock_ref -= 1
            if remaining > 0:
                # saturate: a split between inc and dec can shift the page
                # accounting by one node (stray lock on the upper half is
                # conservative; underflow would be unsafe)
                if n.swa_lock_ref > 0:
                    n.swa_lock_ref -= 1
                remaining -= len(n.key)
            n = n.parent

    # ------------------------------------------------------------------
    # eviction: tombstone-first, then full LRU
    # ------------------------------------------------------------------

    def evict(self, num_pages: int) -> int:
        if self.disable:
            return 0
        freed = self._tombstone_evict(num_pages)
        if freed < num_pages:
            freed += super().evict(num_pages - freed)
        return freed

    def _tombstone_evict(self, num_pages: int) -> int:
        """Free KV of front-most unlocked nodes, keeping their keys.

        The tombstone front advances from the root (reference swa LRU
        ordering `evict:590` — nodes closer to the root first), so every
        path keeps a contiguous live tail and long prefixes stay usable.
        """
        # frontier: live nodes whose ancestors are all tombstoned (or root)
        cands = []
        stack = list(self.root.children.values())
        while stack:
            n = stack.pop()
            if n.tombstone:
                stack.extend(n.children.values())
            elif n.swa_lock_ref == 0:
                cands.append((n.last_access_time, n))
        heapq.heapify(cands)
        freed = 0
        while freed < num_pages and cands:
            _, node = heapq.heappop(cands)
            if node.tombstone or node.swa_lock_ref > 0:
                continue
            if self.evict_hook is not None:
                path = []
                p = node
                while p is not None and p is not self.root:
                    path.append(p)
                    p = p.parent
                full_key: List = []
                for anc in reversed(path):
                    full_key.extend(anc.key)
                self.evict_hook(full_key, list(node.pages))
            self.allocator.free_pages(node.pages)
            freed += len(node.pages)
            self._tree_pages -= len(node.pages)
            node.pages = [0] * len(node.key)
            node.tombstone = True
            for c in node.children.values():
                if not c.tombstone and c.swa_lock_ref == 0:
                    heapq.heappush(cands, (c.last_access_time, c))
        return freed

    def evictable_size(self) -> int:
        """Reclaimable tokens: live pages not swa-locked (tombstonable) —
        a superset of fully-evictable pages (swa_lock implies full lock)."""
        total = 0
        stack = [self.root]
        while stack:
            n = stack.pop()
            if n is not self.root and n.swa_lock_ref == 0:
                total += n.live_pages
            stack.extend(n.children.values())
        return total * self.page_size
