"""Waiting-queue priority + prefill admission budget.

Role model: reference `python/sglang/srt/managers/schedule_policy.py`
(`SchedulePolicy.calc_priority:100` — cache-aware LPM vs FCFS/LOF/random —
and `PrefillAdder:320` with the token budget formulas of SURVEY.md §A.4).
"""

from __future__ import annotations

import random
from typing import List, Optional

from sglang_awq_tpu.environ import envs
from sglang_awq_tpu.managers.schedule_batch import Req
from sglang_awq_tpu.mem_cache.radix_cache import RadixCache

CLIP_MAX_NEW_TOKENS = envs.SGLT_CLIP_MAX_NEW_TOKENS_ESTIMATION.value


class SchedulePolicy:
    """Orders the waiting queue; LPM computes radix matches as a side effect
    (cached on req.prefix_len/pages for the adder to reuse)."""

    def __init__(self, policy: str, tree: RadixCache):
        self.policy = policy
        self.tree = tree

    def calc_priority(self, waiting) -> None:
        """Reorders the waiting deque in place."""
        if self.policy == "fcfs":
            return  # arrival order (queue order)
        items = list(waiting)
        if self.policy == "random":
            random.shuffle(items)
        elif self.policy == "lof":  # longest output first
            items.sort(key=lambda r: -r.sampling_params.max_new_tokens)
        elif self.policy == "lpm":  # longest (cached) prefix match first
            items.sort(key=lambda r: -self.tree.match_prefix(r.fill_ids).matched_len)
        elif self.policy == "dfs-weight":
            items = self._dfs_weight_order(items)
        else:
            raise ValueError(f"unknown schedule policy {self.policy!r}")
        waiting.clear()
        waiting.extend(items)

    def _dfs_weight_order(self, items: List[Req]) -> List[Req]:
        """Group shared-prefix requests adjacently: DFS over a trie of the
        waiting prompts, heavier subtrees first (reference calc_priority
        dfs-weight branch) — adjacent admission maximizes in-batch radix
        reuse."""
        ps = self.tree.page_size
        root: dict = {"children": {}, "reqs": []}
        for r in items:
            node = root
            ids = r.fill_ids
            for i in range(0, len(ids) // ps * ps, ps):
                key = tuple(ids[i : i + ps])
                node = node["children"].setdefault(
                    key, {"children": {}, "reqs": []}
                )
            node["reqs"].append(r)

        def weight(node) -> int:
            w = len(node["reqs"])
            for c in node["children"].values():
                w += weight(c)
            node["_w"] = w
            return w

        weight(root)
        out: List[Req] = []

        def dfs(node):
            out.extend(node["reqs"])
            for c in sorted(node["children"].values(),
                            key=lambda n: -n["_w"]):
                dfs(c)

        dfs(root)
        return out


class AddReqResult:
    CONTINUE = "continue"
    NO_TOKEN = "no_token"
    OTHER = "other"


class PrefillBudget:
    """Token budget for assembling one prefill round (reference PrefillAdder).

    rem_total_tokens = allocator free + tree evictable
                       - sum_running(min(remaining_new, CLIP) * new_token_ratio)
    (reference schedule_policy.py:355-403)
    """

    def __init__(
        self,
        allocator_free_tokens: int,
        evictable_tokens: int,
        running: List[Req],
        new_token_ratio: float,
        max_prefill_tokens: int,
        chunked_prefill_size: int,
    ):
        reserved = sum(
            min(r.remaining_new_tokens, CLIP_MAX_NEW_TOKENS) for r in running
        ) * new_token_ratio
        self.rem_total_tokens = (
            allocator_free_tokens + evictable_tokens - int(reserved)
        )
        self.rem_input_tokens = max_prefill_tokens
        self.chunk = chunked_prefill_size

    def can_add(self, req: Req) -> str:
        if self.rem_input_tokens <= 0:
            return AddReqResult.OTHER
        # full remaining prefill + (clipped) generation headroom — the
        # reference add_one_req formula (schedule_policy.py:572).  NOT
        # extend_len twice: that over-reservation livelocked small pools
        # (a 64-token prompt + 4 new demanded 132 of 128 pool tokens).
        need = req.extend_len + min(
            req.remaining_new_tokens, CLIP_MAX_NEW_TOKENS
        )
        if self.rem_total_tokens < need:
            return AddReqResult.NO_TOKEN
        return AddReqResult.CONTINUE

    def commit(self, extend_tokens: int, reserve_tokens: int):
        self.rem_input_tokens -= extend_tokens
        self.rem_total_tokens -= extend_tokens + reserve_tokens
