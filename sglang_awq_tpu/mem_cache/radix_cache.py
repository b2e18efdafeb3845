"""Token-space radix tree over KV pages (prefix cache).

Role model: the reference's RadixAttention prefix cache
(`python/sglang/srt/mem_cache/radix_cache.py:252` — `match_prefix:340`,
`insert:412`, `cache_finished_req/cache_unfinished_req:429,475`, LRU
`evict:544`, lock refs `:571,585`, page-aligned keys `:423-427`).

TPU adaptation: KV is page-granular from day one (page_size >= 8,
SURVEY.md §A.8), so tree edges carry whole pages — a key is a tuple of
`page_size` token-id tuples, and values are page indices into the device
pool.  Only full pages are shared; a request's partially-filled last page is
never inserted.

Eviction invariant (ported per SURVEY.md §A.4 "port the checks early"):
    allocator.free + tree-held + request-held == total pages
and `evictable_size() + protected_size()` == tree-held tokens.
"""

from __future__ import annotations

import heapq
import time
from typing import Dict, List, Optional, Tuple

from sglang_awq_tpu.mem_cache.allocator import PagedAllocator


class TreeNode:
    counter = 0

    def __init__(self):
        self.children: Dict[Tuple[int, ...], "TreeNode"] = {}  # keyed by first page
        self.parent: Optional[TreeNode] = None
        self.key: List[Tuple[int, ...]] = []  # list of page-keys (token tuples)
        self.pages: List[int] = []  # page indices, len == len(key)
        self.lock_ref = 0
        # SWA tree state (reference swa_radix_cache.py:50-98 TreeNode):
        # a tombstoned node's KV pages are freed (pages become placeholder
        # 0s) but its keys stay matchable; swa_lock_ref protects the
        # in-window tail of a running request's path from tombstoning.
        # Plain RadixCache never sets either.
        self.tombstone = False
        self.swa_lock_ref = 0
        self.last_access_time = time.monotonic()
        self.id = TreeNode.counter
        TreeNode.counter += 1

    @property
    def live_pages(self) -> int:
        return 0 if self.tombstone else len(self.pages)

    @property
    def evictable(self) -> bool:
        return self.lock_ref == 0 and len(self.children) == 0

    def __lt__(self, other: "TreeNode"):
        return self.last_access_time < other.last_access_time


class MatchResult:
    def __init__(self, pages: List[int], last_node: "TreeNode", page_size: int):
        self.pages = pages
        self.last_node = last_node
        self.matched_len = len(pages) * page_size  # tokens


class RadixCache:
    """Page-granular radix tree; thread-unsafe (scheduler-owned)."""

    def __init__(self, allocator: PagedAllocator, page_size: int, disable: bool = False):
        self.allocator = allocator
        self.page_size = page_size
        self.disable = disable
        # HiCache hook: called with (full key path, pages) BEFORE eviction
        # frees the pages, so the controller can offload them to host
        self.evict_hook = None
        self.reset()

    def reset(self):
        self.root = TreeNode()
        self.root.lock_ref = 1  # never evict root
        self._tree_pages = 0

    # ------------------------------------------------------------------
    # key helpers
    # ------------------------------------------------------------------

    def _page_keys(self, token_ids: List[int]) -> List[Tuple[int, ...]]:
        """Full pages only; drops the unfilled tail."""
        ps = self.page_size
        n = len(token_ids) // ps
        return [tuple(token_ids[i * ps : (i + 1) * ps]) for i in range(n)]

    # ------------------------------------------------------------------
    # queries
    # ------------------------------------------------------------------

    def match_prefix(
        self, token_ids: List[int], max_pages: Optional[int] = None
    ) -> MatchResult:
        """Longest cached page-aligned prefix of token_ids.

        Walks the tree; splits a node if the match ends inside its edge.
        Does NOT lock — callers use inc_lock_ref(last_node).  `max_pages`
        caps the match (the scheduler's reuse limits must be applied INSIDE
        the match so window-validity logic in the SWA subclass sees the
        true boundary).
        """
        if self.disable:
            return MatchResult([], self.root, self.page_size)
        keys = self._page_keys(token_ids)
        if max_pages is not None:
            keys = keys[:max_pages]
        node = self.root
        pages: List[int] = []
        i = 0
        while i < len(keys):
            child = node.children.get(keys[i])
            if child is None:
                break
            child.last_access_time = time.monotonic()
            # match within the child's edge
            j = 0
            while j < len(child.key) and i + j < len(keys) and child.key[j] == keys[i + j]:
                j += 1
            pages.extend(child.pages[:j])
            if j < len(child.key):
                # partial edge match: split child so last_node ends at match
                child = self._split_node(child, j)
                i += j
                node = child
                break
            i += j
            node = child
        return MatchResult(pages, node, self.page_size)

    def evictable_size(self) -> int:
        """Tokens held by unlocked tree nodes (reclaimable)."""
        return self._evictable_pages() * self.page_size

    def protected_size(self) -> int:
        total = 0
        stack = [self.root]
        while stack:
            n = stack.pop()
            if n.lock_ref > 0 and n is not self.root:
                total += n.live_pages
            stack.extend(n.children.values())
        return total * self.page_size

    def total_pages(self) -> int:
        return self._tree_pages

    def _evictable_pages(self) -> int:
        # pages on paths not locked: total - pages under lock
        total = 0
        stack = [self.root]
        while stack:
            n = stack.pop()
            if n is not self.root and n.lock_ref == 0:
                total += n.live_pages
            stack.extend(n.children.values())
        return total

    # ------------------------------------------------------------------
    # mutation
    # ------------------------------------------------------------------

    def _split_node(self, node: TreeNode, at: int) -> TreeNode:
        """Split node's edge at page index `at`; returns the new upper node."""
        assert 0 < at < len(node.key)
        upper = TreeNode()
        upper.parent = node.parent
        upper.key = node.key[:at]
        upper.pages = node.pages[:at]
        upper.lock_ref = node.lock_ref
        upper.tombstone = node.tombstone
        upper.swa_lock_ref = node.swa_lock_ref
        upper.last_access_time = node.last_access_time
        upper.children = {node.key[at]: node}
        node.parent.children[upper.key[0]] = upper
        node.parent = upper
        node.key = node.key[at:]
        node.pages = node.pages[at:]
        return upper

    def insert(self, token_ids: List[int], pages: List[int]) -> int:
        """Insert the page-aligned prefix of token_ids with its pages.

        Returns the number of LEADING pages that were already present (whose
        duplicates the caller must free — reference cache_finished_req
        behavior).  The tree takes ownership of the non-duplicate tail pages.
        """
        if self.disable:
            return 0
        keys = self._page_keys(token_ids)
        pages = pages[: len(keys)]
        assert len(pages) == len(keys), (len(pages), len(keys))
        node = self.root
        i = 0
        dup = 0
        while i < len(keys):
            child = node.children.get(keys[i])
            if child is None:
                new = TreeNode()
                new.parent = node
                new.key = keys[i:]
                new.pages = pages[i:]
                node.children[keys[i]] = new
                self._tree_pages += len(new.pages)
                return dup
            child.last_access_time = time.monotonic()
            j = 0
            while j < len(child.key) and i + j < len(keys) and child.key[j] == keys[i + j]:
                j += 1
            dup += j
            if j < len(child.key):
                child = self._split_node(child, j)
            i += j
            node = child
        return dup

    def insert2(
        self, token_ids: List[int], pages: List[int], dead_pages: int = 0
    ) -> List[int]:
        """Like insert, but returns the POSITIONS (indices into `pages`)
        of the caller's duplicate copies (pages the tree already held live
        — the caller frees its own copies at those positions).  The SWA
        subclass overrides this to handle `dead_pages` (the caller's first
        `dead_pages` entries are placeholders for KV it already released
        past its sliding window) and tombstone revival; the plain tree has
        no released pages, so positions are always a contiguous prefix."""
        assert dead_pages == 0, "dead pages need the SWA radix tree"
        return list(range(self.insert(token_ids, pages)))

    def inc_lock_ref(self, node: TreeNode):
        """Protect the path root..node from eviction."""
        while node is not None and node is not self.root:
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode):
        while node is not None and node is not self.root:
            assert node.lock_ref > 0
            node.lock_ref -= 1
            node = node.parent

    def evict(self, num_pages: int) -> int:
        """Evict up to num_pages LRU unlocked leaf pages back to the allocator.

        Returns pages actually freed (reference evict:544 — leaves-first LRU).
        """
        if self.disable:
            return 0
        leaves = [n for n in self._iter_nodes() if n.evictable]
        heapq.heapify(leaves)
        freed = 0
        while freed < num_pages and leaves:
            node = heapq.heappop(leaves)
            if not node.evictable:
                continue
            # evict whole node (page tail first would allow partial, but whole
            # nodes keep bookkeeping simple; nodes are split at match points)
            if self.evict_hook is not None and not node.tombstone:
                path = []
                p = node
                while p is not None and p is not self.root:
                    path.append(p)
                    p = p.parent
                full_key = []
                for anc in reversed(path):
                    full_key.extend(anc.key)
                self.evict_hook(full_key, list(node.pages))
            if not node.tombstone:
                self.allocator.free_pages(node.pages)
            freed += node.live_pages
            self._tree_pages -= node.live_pages
            parent = node.parent
            del parent.children[node.key[0]]
            if parent is not self.root and parent.evictable:
                heapq.heappush(leaves, parent)
        return freed

    def _iter_nodes(self):
        stack = list(self.root.children.values())
        while stack:
            n = stack.pop()
            yield n
            stack.extend(n.children.values())

    # ------------------------------------------------------------------
    # self-check (reference scheduler_runtime_checker_mixin.py:173-188)
    # ------------------------------------------------------------------

    def check_invariant(self, request_held_pages: int):
        """allocator.free + tree(live) + request-held == total."""
        tree_pages = sum(n.live_pages for n in self._iter_nodes())
        assert tree_pages == self._tree_pages, (tree_pages, self._tree_pages)
        self.allocator.check_consistency(tree_pages + request_held_pages)
