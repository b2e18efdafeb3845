"""N-gram draft cache for speculative decoding.

Role model: reference ngram speculative decoding
(`python/sglang/srt/speculative/ngram_worker.py` + `cpp_ngram/ngram.cpp`):
drafts come from n-gram continuations observed in the request's own prompt
and generated text, verified in one TARGET_VERIFY-style forward.  Greedy
acceptance; sampled requests simply get draft length 0 (every step still
yields >= 1 token).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Sequence, Tuple


class NgramCache:
    def __init__(self, n: int = 3, capacity: int = 1 << 20):
        self.n = n
        self.capacity = capacity
        # context tuple -> {next_token: count}
        self.map: "OrderedDict[Tuple[int, ...], Dict[int, int]]" = OrderedDict()

    def update(self, tokens: Sequence[int]):
        n = self.n
        if len(tokens) <= n:
            return
        for i in range(len(tokens) - n):
            ctx = tuple(tokens[i : i + n])
            nxt = tokens[i + n]
            slot = self.map.get(ctx)
            if slot is None:
                if len(self.map) >= self.capacity:
                    self.map.popitem(last=False)  # FIFO eviction
                slot = {}
                self.map[ctx] = slot
            slot[nxt] = slot.get(nxt, 0) + 1

    def draft(self, context: Sequence[int], k: int) -> List[int]:
        """Up to k draft tokens continuing `context` (greedy most-frequent)."""
        cur = list(context[-self.n :])
        out: List[int] = []
        for _ in range(k):
            if len(cur) < self.n:
                break
            slot = self.map.get(tuple(cur[-self.n :]))
            if not slot:
                break
            nxt = max(slot.items(), key=lambda kv: kv[1])[0]
            out.append(nxt)
            cur.append(nxt)
        return out
