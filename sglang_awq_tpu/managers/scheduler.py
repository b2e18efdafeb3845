"""Continuous-batching scheduler.

Role model: reference `Scheduler`
(`python/sglang/srt/managers/scheduler.py:215` — waiting queue + running
batch + radix cache; `get_next_batch_to_run:1704`, `get_new_batch_prefill:1783`,
`run_batch:2052`, `process_batch_result:2195`, retraction
`schedule_batch.py:1711`, budget formulas SURVEY.md §A.4).

TPU adaptation: a single host thread drives the chip through the
ModelRunner's bucketed-jit steps; prefill packs many requests into one
ragged extend batch, decode runs the whole running batch.  The reference's
per-rank scheduler processes + ZMQ broadcast collapse into this one loop
(SPMD; §2.6).

Overlap scheduling (round 2 — reference `event_loop_overlap`
`python/sglang/srt/managers/scheduler.py:1036` + FutureMap
`managers/overlap_utils.py:32`): batch N+1 is DISPATCHED before batch N's
sampled ids are fetched.  Decode input tokens resolve on device from the
per-request `DeviceSamplingState` rows (model_executor/sampling_state.py),
so the host never blocks on a step to build the next one; `self.pending`
holds the in-flight batch whose results are processed one step later.
Correctness notes:
* a request that finished at step N wastes one slot in already-dispatched
  step N+1; its extra token is discarded and its stale KV write lands in
  pages that device-ordering guarantees are overwritten before any read;
* retraction and the sync-only paths (grammar masks, ngram spec, multi-step
  decode) first DRAIN pending results — they need complete output_ids;
* after a sync path ran, device rows are stale -> reseeded on the next
  overlap dispatch (`_sync_device_rows`).
"""

from __future__ import annotations

import logging
import os
import time
from collections import OrderedDict, deque
from typing import Deque, List, Optional

import numpy as np

from sglang_awq_tpu.environ import envs
from sglang_awq_tpu.managers.schedule_batch import FinishInfo, FinishReason, Req
from sglang_awq_tpu.managers.schedule_policy import (
    CLIP_MAX_NEW_TOKENS,
    AddReqResult,
    PrefillBudget,
    SchedulePolicy,
)
from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT
from sglang_awq_tpu.mem_cache.allocator import PagedAllocator
from sglang_awq_tpu.mem_cache.radix_cache import RadixCache
from sglang_awq_tpu.model_executor.forward_batch import (
    DecodeInput,
    ExtendBatchInput,
)
from sglang_awq_tpu.model_executor.model_runner import ModelRunner
from sglang_awq_tpu.server_args import ServerArgs
from sglang_awq_tpu.tracing import (
    trace_req_finish,
    trace_slice_end,
    trace_slice_start,
    tracing_enabled,
)
from sglang_awq_tpu.utils import cdiv

logger = logging.getLogger(__name__)

RETRACT_DECODE_STEPS = envs.SGLT_RETRACT_DECODE_STEPS.value


class ReqOutput:
    """One step's incremental output for a request (token ids; detokenization
    happens downstream — reference BatchTokenIDOutput role, io_struct.py:913)."""

    def __init__(self, req: Req, new_tokens: List[int]):
        self.rid = req.rid
        self.new_tokens = new_tokens
        n = len(new_tokens)
        self.new_logprobs = (
            req.output_token_logprobs[-n:] if n and req.output_token_logprobs else []
        )
        self.new_top_logprobs = (
            req.output_top_logprobs[-n:] if n and req.output_top_logprobs else []
        )
        self.finished = req.finished()
        self.finish_reason = (
            req.finish_info.to_finish_reason_str() if req.finished() else None
        )
        self.output_len = len(req.output_ids)
        self.prompt_len = len(req.input_ids)
        self.cached_tokens = req.prefix_len
        self.embedding = req.embedding
        # prompt-token logprobs ship once, on the finishing chunk
        self.input_token_logprobs = (
            list(req.input_token_logprobs) if self.finished else None
        )
        self.input_top_logprobs = (
            list(req.input_top_logprobs) if self.finished else None
        )


class Scheduler:
    def __init__(self, server_args: ServerArgs, runner: ModelRunner):
        self.server_args = server_args
        self.runner = runner
        self.page_size = runner.page_size

        self.allocator = PagedAllocator(runner.num_pages, self.page_size)
        self.tree = self._make_tree(server_args)
        self.hicache = None
        if server_args.enable_hierarchical_cache:
            from sglang_awq_tpu.mem_cache.hicache import HiCacheController
            from sglang_awq_tpu.mem_cache.radix_cache import RadixCache

            if type(self.tree) is not RadixCache:
                logger.warning(
                    "HiCache needs the plain Python radix tree (evict hook, "
                    "full-match restore); switching from %s",
                    type(self.tree).__name__,
                )
                self.tree = RadixCache(
                    self.allocator, self.page_size,
                    disable=server_args.disable_radix_cache,
                )
            self.hicache = HiCacheController(
                runner, int(server_args.hicache_size_gb * 1024**3),
                self.page_size, storage=server_args.hicache_storage,
            )
            self.tree.evict_hook = self.hicache.on_evict
        self.policy = SchedulePolicy(server_args.schedule_policy, self.tree)

        self.waiting: Deque[Req] = deque()
        self.running: List[Req] = []
        self.chunked_req: Optional[Req] = None
        # in-flight dispatched batches (overlap): entries
        # ("decode"|"prefill", items, ids_dev, lp_dev|None, want_lp)
        self.pending: Deque = deque()
        self._out_buffer: List[ReqOutput] = []
        self._rows_dirty = False  # device rows stale after a sync-path step

        self.base_new_token_ratio = min(1.0, 0.3 * server_args.schedule_conservativeness)
        self.new_token_ratio = self.base_new_token_ratio
        self.new_token_ratio_decay = 0.001

        self.steps = 0
        self.last_progress_time = time.monotonic()
        self.abort_rids: set = set()

        from sglang_awq_tpu.metrics.collector import SchedulerMetrics

        self.metrics = SchedulerMetrics(server_args.served_model_name or "model")

        # --- speculative decoding (ngram | eagle) ---
        self.ngram = None
        self.eagle = server_args.speculative_algorithm == "eagle"
        self.spec_width = 0
        if server_args.speculative_algorithm == "ngram":
            try:
                from sglang_awq_tpu.speculative.ngram_cpp import CppNgramCache

                self.ngram = CppNgramCache(n=3)
                logger.info("using C++ ngram cache")
            except Exception:
                from sglang_awq_tpu.speculative.ngram import NgramCache

                self.ngram = NgramCache(n=3)
        if self.ngram is not None or self.eagle:
            # verify width: 1 real token + (width-1) draft positions
            self.spec_width = max(2, server_args.speculative_num_draft_tokens)
            assert self.spec_width <= self.page_size, (
                "speculative width must be <= page_size (KV write kernel "
                "touches at most two tail pages per sequence)"
            )
        # EAGLE tree mode: top-k branch roots, each continued greedily
        # (reference eagle_worker.py:511 topk>1 tree draft + tree verify)
        self.spec_topk = (
            max(1, server_args.speculative_eagle_topk) if self.eagle else 1
        )
        if self.spec_topk > 1:
            qs_tree = 1 + self.spec_topk * (self.spec_width - 1)
            assert qs_tree <= self.page_size, (
                f"tree verify window {qs_tree} (1 + topk*(width-1)) must be "
                "<= page_size (KV writes touch at most two tail pages)"
            )
            self._tree_mask = None  # built lazily (numpy, static per config)
        # score-driven topology (round 5): the tree shape is chosen per
        # request per step from cumulative draft logprobs; only EAGLE has
        # draft scores (ngram trees stay static)
        self.spec_tree_scored = (
            self.spec_topk > 1 and self.eagle
            and server_args.speculative_tree_mode == "scored"
        )
        self.spec_accept_sum = 0
        self.spec_steps = 0

        # --- hybrid linear-attention prefix cache (mamba-radix role) ---
        # page-aligned recurrent-state checkpoints keyed by the exact token
        # prefix; a radix match is only usable up to a checkpointed
        # boundary (reference srt/mem_cache/mamba_radix_cache.py)
        self.state_ckpts: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._free_ckpt_rows: List[int] = []
        if (
            getattr(runner.model, "has_linear_state", False)
            and getattr(runner, "n_state_ckpts", 0) > 0
            and not server_args.disable_radix_cache
        ):
            self._free_ckpt_rows = list(
                range(runner.state_ckpt_base,
                      runner.state_ckpt_base + runner.n_state_ckpts)
            )

    def _make_tree(self, server_args: ServerArgs):
        # all-SWA models (every layer windowed) get the sliding-window-aware
        # tree: out-of-window KV tombstones under pressure while deep
        # prefixes stay matchable (reference swa_radix_cache.py role).
        # Hybrid global/local models keep the plain tree — one page holds
        # every layer's KV, and a single global layer pins it forever.
        w = getattr(self.runner.model, "layer_windows", None) or ()
        if (
            w
            and all(x and x > 0 for x in w)
            and not server_args.disable_radix_cache
        ):
            from sglang_awq_tpu.mem_cache.swa_radix_cache import SWARadixCache

            logger.info("using SWA radix tree (window=%d)", max(w))
            return SWARadixCache(self.allocator, self.page_size, window=max(w))
        impl = server_args.radix_cache_impl
        if impl in ("auto", "cpp"):
            try:
                from sglang_awq_tpu.mem_cache.radix_cache_cpp import CppRadixCache

                tree = CppRadixCache(
                    self.allocator,
                    self.page_size,
                    disable=server_args.disable_radix_cache,
                )
                logger.info("using C++ radix tree")
                return tree
            except Exception as e:  # noqa: BLE001
                if impl == "cpp":
                    raise
                logger.warning("C++ radix tree unavailable (%s); using Python", e)
        return RadixCache(
            self.allocator, self.page_size, disable=server_args.disable_radix_cache
        )

    # ------------------------------------------------------------------
    # intake
    # ------------------------------------------------------------------

    def add_request(self, req: Req):
        if (
            self.server_args.max_queued_requests is not None
            and len(self.waiting) >= self.server_args.max_queued_requests
        ):
            req.finish_info = FinishInfo(FinishReason.ABORT)
            return
        max_ctx = self.runner.model_config.context_length
        if len(req.input_ids) >= max_ctx:
            req.input_ids = req.input_ids[: max_ctx - 1]
        # a prompt that can NEVER fit the KV pool must be rejected up front,
        # not spin in admission forever (reference: abort on over-capacity)
        pool_tokens = self.runner.max_total_tokens
        if len(req.input_ids) + 1 > pool_tokens:
            logger.warning(
                "rejecting %s: prompt %d tokens > KV pool %d",
                req.rid, len(req.input_ids), pool_tokens,
            )
            req.finish_info = FinishInfo(FinishReason.ABORT)
            return
        # clamp generation length to context
        room = max_ctx - len(req.input_ids) - 1
        req.sampling_params.max_new_tokens = min(req.max_new_tokens, max(room, 0))
        req.lora_slot = -1
        if req.sampling_params.lora_path:
            if self.runner.lora is None:
                req.finish_info = FinishInfo(FinishReason.ABORT)
                return
            try:
                req.lora_slot = self.runner.lora.slot_of(
                    req.sampling_params.lora_path
                )
            except KeyError:
                req.finish_info = FinishInfo(FinishReason.ABORT)
                return
        req.queued_time = time.monotonic()
        self.waiting.append(req)

    def abort_request(self, rid: str):
        self.abort_rids.add(rid)

    def has_work(self) -> bool:
        return bool(self.waiting or self.running or self.chunked_req or self.pending)

    # ------------------------------------------------------------------
    # main iteration
    # ------------------------------------------------------------------

    def step(self) -> List[ReqOutput]:
        """One scheduler iteration -> incremental outputs.

        Overlap pattern (reference event_loop_overlap, scheduler.py:1036):
        dispatch this step's batch FIRST, then process the previous step's
        results — the device computes batch N+1 while the host fetches and
        post-processes batch N."""
        self._process_aborts()

        dispatched = False
        prefill_reqs = self._get_prefill_batch()
        if prefill_reqs:
            dispatched = self._dispatch_prefill(prefill_reqs)
        elif self.running:
            if (self.ngram is not None or self.eagle) and all(
                # grammar / logit_bias rows participate at width 1 and
                # penalty rows ride the verify with per-row device counts
                # (reference runs spec per-request, eagle_worker.py);
                # mrope deltas still fall back (KV index vs rope offset)
                not getattr(r, "mrope_delta", 0)
                for r in self.running
            ):
                # sampled rows keep spec ON: the verify applies chain
                # accept/reject on device (distribution-preserving,
                # layers/sampler.py spec_accept_sample)
                self._drain_pending()
                self._out_buffer += self._run_decode_step_spec()
                self._rows_dirty = True
            elif (
                self.server_args.num_continuous_decode_steps > 1
                and not self.waiting
                and all(
                    r.grammar is None
                    and not r.sampling_params.return_logprob
                    and not r.sampling_params.has_penalties
                    and not r.sampling_params.has_logit_bias
                    # multi-step derives slots from positions in-jit;
                    # mrope deltas shift positions off the KV index
                    and not getattr(r, "mrope_delta", 0)
                    for r in self.running
                )
            ):
                self._drain_pending()
                self._out_buffer += self._run_decode_multi()
                self._rows_dirty = True
            elif any(
                r.grammar is not None or r.sampling_params.has_logit_bias
                for r in self.running
            ):
                if os.environ.get("SGLT_GRAMMAR_OVERLAP", "1") == "1":
                    # two-phase overlap: dispatch the forward first, build
                    # this step's masks while it runs (fetching last step's
                    # token overlaps the in-flight forward), then dispatch
                    # the masked sample
                    dispatched = self._dispatch_decode_constrained()
                else:
                    # grammar masks / logit_bias matrices need last step's
                    # token before the next dispatch — stay synchronous
                    self._drain_pending()
                    self._out_buffer += self._run_decode_step()
                    self._rows_dirty = True
            else:
                dispatched = self._dispatch_decode()

        if self.pending and (not dispatched or len(self.pending) > 1):
            self._process_one_pending()

        self.steps += 1
        if self.steps % 512 == 0 and not self.pending:
            self.check_memory()
        if self.steps % 16 == 0:
            used = 1.0 - self.allocator.available_pages() / self.allocator.num_pages
            self.metrics.set_queue_state(len(self.running), len(self.waiting), used)
        outputs, self._out_buffer = self._out_buffer, []
        if outputs or dispatched:
            self.last_progress_time = time.monotonic()
        return outputs

    # ------------------------------------------------------------------
    # prefill
    # ------------------------------------------------------------------

    MAX_PREFILL_REQS = 16  # rows per extend batch (EXTEND_BS_BUCKETS cap)

    def _max_prefill_reqs(self) -> int:
        # hybrid linear-attention models batch too since round 4: the
        # deltanet extend is segment-aware (models/qwen3_next.py
        # _deltanet_extend — per-token state resets + tail gathers)
        return self.MAX_PREFILL_REQS

    def _cache_ids(self, req: Req):
        """Token stream used as the radix/HiCache KEY.  Adapter requests
        are NAMESPACED by salting every token with the adapter slot
        (reference keys the radix tree by lora_path,
        srt/mem_cache/radix_cache.py key scheme): per-adapter prefixes get
        their own subtree — and per-adapter cache HITS — instead of the
        old v1 behavior of opting out of the cache entirely.  The salt
        stays in int32 range (slot < 256, vocab < 2^21)."""
        slot = getattr(req, "lora_slot", -1)
        if slot < 0:
            return req.fill_ids
        return [t + ((slot + 1) << 21) for t in req.fill_ids]

    def _match_fresh(self, req: Req):
        """Radix-match a fresh request's prompt and lock the prefix."""
        ps = self.page_size
        if req.input_embeds is not None:
            return  # placeholder token ids carry no cache identity
        if getattr(self.runner.model, "has_linear_state", False):
            # hybrid linear-attention models: KV pages alone are unusable —
            # the recurrent state must ALSO exist at the reuse boundary.
            # Match the tree, then clamp to the deepest page-aligned
            # state checkpoint (round-4 mamba-radix role).
            self._match_fresh_hybrid(req)
            return
        # never reuse the whole fill (at least one token must compute
        # so logits exist — reference match trim)
        max_match = (len(req.fill_ids) - 1) // ps * ps
        if req.wants_input_lp:
            # prompt logprobs for token idx need the hidden state at
            # idx-1 computed this run: cap reuse at the scoring start
            # (reference adjusts extend_input_len the same way)
            max_match = min(
                max_match, req.sampling_params.logprob_start_len // ps * ps
            )
        # the cap is applied INSIDE the match: the SWA tree must validate
        # window liveness at the true reuse boundary
        m = self.tree.match_prefix(
            self._cache_ids(req), max_pages=max_match // ps)
        matched = min(m.matched_len, max_match)
        n_prefix_pages = matched // ps
        req.pages = list(m.pages[:n_prefix_pages])
        req.prefix_pages = n_prefix_pages
        req.prefix_len = matched
        req.fill_len = matched
        req.last_node = m.last_node
        self.tree.inc_lock_ref(m.last_node)
        if self.hicache is not None:
            self._hicache_extend(req, max_match)

    def _match_fresh_hybrid(self, req: Req):
        if not self._free_ckpt_rows and not self.state_ckpts:
            return
        ps = self.page_size
        max_match = (len(req.fill_ids) - 1) // ps * ps
        if req.wants_input_lp:
            max_match = min(
                max_match, req.sampling_params.logprob_start_len // ps * ps
            )
        m = self.tree.match_prefix(req.fill_ids, max_pages=max_match // ps)
        matched = min(m.matched_len, max_match)
        # deepest checkpoint at or below the tree match whose token prefix
        # is exactly ours
        best = 0
        best_row = -1
        for key, (row, n) in self.state_ckpts.items():
            if n <= matched and n > best and tuple(req.fill_ids[:n]) == key:
                best, best_row = n, row
        if best == 0:
            return
        self.state_ckpts.move_to_end(tuple(req.fill_ids[:best]))
        n_pages = best // ps
        req.pages = list(m.pages[:n_pages])
        req.prefix_pages = n_pages
        req.prefix_len = best
        req.fill_len = best
        req.last_node = m.last_node
        self.tree.inc_lock_ref(m.last_node)
        req._state_src_row = best_row  # restored at dispatch
        # (cache_hit_rate metric feeds from req.prefix_len at finish)

    def _hybrid_take_ckpt(self, reqs, kv_lens, q_lens):
        """Decide per-request state checkpoints for this extend dispatch.

        A request completing its prompt this chunk snapshots conv/rec at
        the last page-aligned boundary inside the chunk; the row is
        LRU-recycled.  -> (ckpt_pos, ckpt_rows) or None."""
        if not self._free_ckpt_rows and not self.state_ckpts:
            return None
        ps = self.page_size
        pos = np.full(len(reqs), -1, np.int32)
        rows = np.full(len(reqs), -1, np.int32)
        any_ck = False
        for i, req in enumerate(reqs):
            target = req.fill_len + req._chunk
            if target < len(req.fill_ids) or getattr(req, "lora_slot", -1) >= 0:
                continue  # prompt not complete yet / adapter-specific state
            aligned = target // ps * ps
            if aligned <= req.fill_len or aligned < ps:
                continue  # boundary not inside this chunk
            key = tuple(req.fill_ids[:aligned])
            if key in self.state_ckpts:
                self.state_ckpts.move_to_end(key)
                continue
            if self._free_ckpt_rows:
                row = self._free_ckpt_rows.pop()
            elif self.state_ckpts:
                _, (row, _n) = self.state_ckpts.popitem(last=False)
            else:
                break
            self.state_ckpts[key] = (row, aligned)
            pos[i] = aligned - 1 - req.fill_len
            rows[i] = row
            any_ck = True
        return (pos, rows) if any_ck else None

    def _hicache_extend(self, req: Req, max_match: int):
        """Extend a fresh request's device-tree match with pages restored
        from the host tier (reference hiradix load-on-match)."""
        ps = self.page_size
        keys = self.tree._page_keys(self._cache_ids(req))
        extra = self.hicache.match_extend(keys, req.prefix_pages)
        extra = extra[: max_match // ps - req.prefix_pages]
        if len(extra) == 0:
            return
        before = req.prefix_pages * ps
        # evicting to make room is fine: the evicted pages offload to the
        # host tier through the same hook (they may round-trip back later)
        new_pages = self._alloc_with_evict(
            before, before + len(extra) * ps, req.pages
        )
        if new_pages is None:
            return
        self.hicache.restore(extra, new_pages)
        req.pages.extend(new_pages)
        total_fp = req.prefix_pages + len(extra)
        cids = self._cache_ids(req)
        dup = self.tree.insert(
            cids[: total_fp * ps], req.pages[:total_fp]
        )
        m2 = self.tree.match_prefix(cids[: total_fp * ps])
        assert m2.matched_len == total_fp * ps
        self.allocator.free_pages(req.pages[req.prefix_pages : dup])
        req.pages[:total_fp] = m2.pages
        if req.last_node is not None:
            self.tree.dec_lock_ref(req.last_node)
        self.tree.inc_lock_ref(m2.last_node)
        req.last_node = m2.last_node
        req.prefix_pages = total_fp
        req.prefix_len = total_fp * ps
        req.fill_len = total_fp * ps
        if self.metrics.enabled:
            self.metrics.hicache_hit_pages.inc(len(extra))
        logger.debug("hicache: restored %d pages for %s", len(extra), req.rid)

    def _get_prefill_batch(self) -> List[Req]:
        """Assemble this round's prefill batch (reference
        `get_new_batch_prefill`, scheduler.py:1783 + PrefillAdder loop
        schedule_policy.py:572): the in-flight chunked request first, then
        waiting requests by policy priority until the token budget, row cap
        or memory budget runs out.  Only the LAST admitted request may be
        chunked."""
        reqs: List[Req] = []
        BQ = self.runner.block_q
        # room is tracked in PADDED tokens (each req's chunk rounds up to a
        # BQ multiple in the token-major layout) so the padded batch always
        # fits the largest prefill token bucket
        room = cdiv(self.server_args.chunked_prefill_size, BQ) * BQ
        if self.chunked_req is not None:
            req = self.chunked_req
            req._chunk = min(req.extend_len, room)
            room -= cdiv(req._chunk, BQ) * BQ
            reqs.append(req)
            if req.is_embedding or req.input_embeds is not None:
                return reqs  # solo step executables
        if (
            room <= 0
            or not self.waiting
            or len(self.running) + len(reqs) >= self.server_args.max_running_requests
        ):
            return reqs
        self.policy.calc_priority(self.waiting)
        budget = PrefillBudget(
            self.allocator.available_size(),
            self.tree.evictable_size(),
            self.running,
            self.new_token_ratio,
            self.server_args.max_prefill_tokens,
            self.server_args.chunked_prefill_size,
        )
        batch_page0: set = set()  # in-batch prefix dedup (reference
        # IN_BATCH_PREFIX_CACHING check): a request whose first page
        # matches a batch-mate's — but is not yet in the tree — defers one
        # round so it HITS the cache instead of recomputing the prefix
        for req in list(self.waiting):
            if (
                room <= 0
                or len(reqs) >= self._max_prefill_reqs()
                or len(self.running) + len(reqs)
                >= self.server_args.max_running_requests
            ):
                break
            ps_ = self.page_size
            if (
                req.fill_len == 0
                and len(req.fill_ids) > ps_
                and not req.wants_input_lp
            ):
                key0 = tuple(self._cache_ids(req)[:ps_])
                if (
                    key0 in batch_page0
                    and self.tree.match_prefix(
                        self._cache_ids(req)).matched_len == 0
                ):
                    continue  # defer: next round it rides the radix cache
                batch_page0.add(key0)
            if req.is_embedding or req.input_embeds is not None:
                if reqs:
                    break  # these run solo (different step executables)
                self.waiting.remove(req)
                if req.fill_len == 0 and req.prefix_len == 0:
                    self._match_fresh(req)
                req._chunk = min(req.extend_len, room)
                # bidirectional image spans must stay whole within a chunk
                # (Gemma3-mm: in-chunk keys carry span identity; a split
                # span would lose its bidirectional tail)
                for s0, s1 in getattr(req, "mm_spans", ()) or ():
                    end = req.fill_len + req._chunk
                    if s0 < end < s1:
                        req._chunk = (
                            s0 - req.fill_len if s0 > req.fill_len
                            else min(s1 - req.fill_len, req.extend_len)
                        )
                if req.is_embedding:
                    return [req]
                reqs.append(req)
                break  # solo input_embeds batch
            verdict = budget.can_add(req)
            if verdict == AddReqResult.NO_TOKEN:
                break
            if verdict == AddReqResult.OTHER:
                break
            self.waiting.remove(req)
            if req.fill_len == 0 and req.prefix_len == 0:
                self._match_fresh(req)
            chunk = min(req.extend_len, room)
            req._chunk = chunk
            budget.commit(chunk, min(req.remaining_new_tokens, CLIP_MAX_NEW_TOKENS))
            room -= cdiv(chunk, BQ) * BQ
            reqs.append(req)
            if chunk < req.extend_len:
                break  # this req becomes the chunked req; batch is full
        return reqs

    def _dispatch_prefill(self, reqs: List[Req]) -> bool:
        """Dispatch one batched ragged extend (async).  Completing requests
        join `running` immediately — their first sampled token lives in the
        device row table so the next decode can consume it before the host
        ever fetches it.  Host-side result processing (token append, finish
        checks, stream output) happens in `_process_one_pending`.  Returns
        True if a batch entered the pipeline."""
        ps = self.page_size
        BQ = self.runner.block_q
        self.chunked_req = None

        # --- allocate pages + build the ragged token-major arrays ---
        admitted: List[Req] = []
        for req in reqs:
            target = req.fill_len + req._chunk
            new_pages = self._alloc_with_evict(req.fill_len, target, req.pages)
            if new_pages is None:
                # could not make room — requeue this and all later reqs
                idx = reqs.index(req)
                for r in reqs[idx:]:
                    self._release_prefill_state(r)
                    self.waiting.appendleft(r)
                break
            req.pages.extend(new_pages)
            admitted.append(req)
        if not admitted:
            return False
        reqs = admitted
        if tracing_enabled():
            for req in reqs:
                trace_slice_end(req.rid, "queue")
                trace_slice_start(
                    req.rid, "prefill",
                    prompt_tokens=len(req.input_ids),
                    cached_tokens=req.prefix_len,
                )

        # --- acquire device sampling-state rows at admission ---
        st = self.runner.sampling_state
        for req in reqs:
            if req.is_embedding or req.row is not None:
                continue
            req.row = st.acquire_row()
            st.reset_counts(np.asarray([req.row], np.int32))
            if req.sampling_params.has_penalties and req.output_ids:
                # retraction resume: rebuild output counts from host history
                st.upload_counts(req.row, req.output_ids)

        # hybrid prefix reuse: restore the checkpointed state into the
        # request's own row before its first chunk runs
        restores = [
            (getattr(r, "_state_src_row", -1), r.row)
            for r in reqs
            if getattr(r, "_state_src_row", -1) >= 0 and r.row is not None
        ]
        if restores:
            src, dst = zip(*restores)
            self.runner.copy_state_rows(list(src), list(dst))
            for r in reqs:
                r._state_src_row = -1

        B = len(reqs)
        tq = sum((req._chunk + BQ - 1) // BQ * BQ for req in reqs)
        tokens = np.zeros(tq, np.int32)
        mrope = getattr(self.runner.model, "mrope_section", None)
        positions = (
            np.zeros((3, tq), np.int32) if mrope else np.zeros(tq, np.int32)
        )
        slots = np.full(tq, PAD_SLOT, np.int32)
        kv_lens = np.zeros(B, np.int32)
        q_lens = np.zeros(B, np.int32)
        qb_base = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in reqs)
        page_table = np.zeros((B, pmax), np.int32)
        rows = []
        lora_tok = np.full(tq, -1, np.int32)
        want_input_lp = any(r.wants_input_lp for r in reqs)
        eagle = self.eagle or want_input_lp  # both need shifted tokens
        if eagle:
            draft_tokens = np.zeros(tq, np.int32)
            draft_slots = np.full(tq, PAD_SLOT, np.int32)
            draft_q_lens = np.zeros(B, np.int32)
            draft_kv_lens = np.zeros(B, np.int32)
        offset = 0
        for i, req in enumerate(reqs):
            chunk = req._chunk
            target = req.fill_len + chunk
            pos = np.arange(req.fill_len, target, dtype=np.int32)
            pages_np = np.asarray(req.pages, np.int32)
            tokens[offset : offset + chunk] = req.fill_ids[req.fill_len : target]
            if mrope:
                mp = getattr(req, "mrope_positions", None)
                positions[:, offset : offset + chunk] = (
                    mp[:, req.fill_len : target] if mp is not None
                    else pos[None]
                )
            else:
                positions[offset : offset + chunk] = pos
            slots[offset : offset + chunk] = pages_np[pos // ps] * ps + pos % ps
            kv_lens[i] = target
            q_lens[i] = chunk
            qb_base[i] = offset // BQ
            page_table[i, : len(req.pages)] = req.pages
            rows.append(req.sampling_row())
            if self.runner.lora is not None:
                lora_tok[offset : offset + chunk] = getattr(req, "lora_slot", -1)
            if eagle:
                # EAGLE shift: draft pos p consumes token p+1; the final
                # chunk is one shorter (the first chain step covers the
                # prompt's last position with the sampled token)
                dq = chunk if target < len(req.fill_ids) else chunk - 1
                dq = max(dq, 0)
                draft_tokens[offset : offset + dq] = req.fill_ids[
                    req.fill_len + 1 : req.fill_len + 1 + dq
                ]
                draft_slots[offset : offset + dq] = slots[offset : offset + dq]
                draft_q_lens[i] = dq
                draft_kv_lens[i] = req.fill_len + dq
            offset += (chunk + BQ - 1) // BQ * BQ

        # completing rows: the prompt is fully filled this step, so the
        # sampled id is this request's first output token
        comp = [r.extend_len <= r._chunk for r in reqs]
        fresh = [not r.output_ids for r in reqs]
        row_ids = np.full(B, self.runner.sampling_state.trash_row, np.int32)
        for i, r in enumerate(reqs):
            if comp[i] and fresh[i] and not r.is_embedding:
                row_ids[i] = r.row  # device publishes the sampled id here

        input_embeds = None
        spans = None
        if len(reqs) == 1 and reqs[0].input_embeds is not None:
            r0 = reqs[0]
            input_embeds = r0.input_embeds[
                r0.fill_len : r0.fill_len + r0._chunk
            ]
            if getattr(r0, "mm_spans", None):
                spans = np.zeros(r0._chunk, np.int32)
                for si, (s0, s1) in enumerate(r0.mm_spans):
                    a = max(s0, r0.fill_len) - r0.fill_len
                    b = min(s1, r0.fill_len + r0._chunk) - r0.fill_len
                    if b > a:
                        spans[a:b] = si + 1
                if not spans.any():
                    spans = None
        ext = ExtendBatchInput(
            tokens=tokens,
            positions=positions,
            slots=slots,
            page_table=page_table,
            kv_lens=kv_lens,
            q_lens=q_lens,
            qb_base=qb_base,
            sampling=rows,
            row_ids=row_ids,
            input_embeds=input_embeds,
            spans=spans,
            draft_tokens=draft_tokens if eagle else None,
            draft_slots=draft_slots if eagle else None,
            draft_q_lens=draft_q_lens if eagle else None,
            draft_kv_lens=draft_kv_lens if eagle else None,
            lora_idx=lora_tok,
        )

        # --- embedding requests run solo through the hidden-state fn ---
        if reqs[0].is_embedding:
            req = reqs[0]
            target = req.fill_len + req._chunk
            if target == len(req.fill_ids):
                req.embedding = self.runner.forward_embed(ext)[0].tolist()
                req.fill_len = target
                self._cache_unfinished(req)
                req.finish_info = FinishInfo(FinishReason.LENGTH)
                self._out_buffer.append(ReqOutput(req, []))
                self._finish_req(req)
                return False
            # intermediate chunk: still must write KV — run the embed fn
            self.runner.forward_embed(ext)
            req.fill_len = target
            self._cache_unfinished(req)
            self.chunked_req = req
            return False

        want_lp = any(
            r.sampling_params.return_logprob
            for i, r in enumerate(reqs) if comp[i]
        )
        update_counts = any(
            r.sampling_params.has_penalties
            for i, r in enumerate(reqs) if comp[i] and fresh[i]
        )
        vocab_mask = None
        if any(r.grammar is not None and comp[i] for i, r in enumerate(reqs)):
            V = self.runner.model_config.vocab_size
            vocab_mask = np.ones((B, V), bool)
            for i, r in enumerate(reqs):
                if r.grammar is not None and comp[i]:
                    vocab_mask[i] = r.grammar.vocab_mask()

        prefill_bias = None
        if any(
            comp[i] and r.sampling_params.has_logit_bias
            for i, r in enumerate(reqs)
        ):
            prefill_bias = self._logit_bias_matrix(
                list(reqs), self.runner.model_config.vocab_size
            )
        state_ckpt = None
        ring_ckpt = None
        if self._free_ckpt_rows or self.state_ckpts:
            state_ckpt = self._hybrid_take_ckpt(reqs, kv_lens, q_lens)
            if state_ckpt is not None and getattr(
                    self.runner.model, "ring_ckpt_by_copy", False):
                # SWA rings checkpoint by copying ring pages AFTER the
                # dispatch (the ring holds window + chunk, so the whole
                # checkpointed span is still resident); nothing rides the
                # extend step itself
                ring_ckpt = state_ckpt
                state_ckpt = None
        if want_input_lp:
            ids, lp, in_lp = self.runner.forward_extend_batch(
                ext, want_logprobs=want_lp, vocab_mask=vocab_mask,
                update_counts=update_counts, async_result=True,
                want_input_lp=True, logit_bias=prefill_bias,
                state_ckpt=state_ckpt,
            )
        else:
            in_lp = None
            ids, lp = self.runner.forward_extend_batch(
                ext, want_logprobs=want_lp, vocab_mask=vocab_mask,
                update_counts=update_counts, async_result=True,
                logit_bias=prefill_bias, state_ckpt=state_ckpt,
            )
        if ring_ckpt is not None:
            # SWA rings: the checkpoint is a ring-page copy dispatched
            # AFTER the extend (data dependency on the pool orders it)
            _, ck_rows = ring_ckpt
            src = [reqs[i].row for i in range(len(reqs))
                   if ck_rows[i] >= 0 and reqs[i].row is not None]
            dst = [int(ck_rows[i]) for i in range(len(reqs))
                   if ck_rows[i] >= 0 and reqs[i].row is not None]
            if src:
                self.runner.copy_state_rows(src, dst)
        # record input (prompt) logprobs per request region
        if in_lp is not None:
            chosen = np.asarray(in_lp["logprobs"])
            tops_i = np.asarray(in_lp["top_ids"])
            tops_v = np.asarray(in_lp["top_logprobs"])
            for i, req in enumerate(reqs):
                if not req.wants_input_lp:
                    continue
                s = req.fill_len  # chunk start (absolute prompt index)
                base = int(qb_base[i]) * BQ
                dq = int(draft_q_lens[i])
                start = req.sampling_params.logprob_start_len
                k = min(req.sampling_params.top_logprobs_num, 20)
                for j in range(dq):
                    tok_idx = s + 1 + j  # prompt index being scored
                    if tok_idx <= start:
                        continue
                    if tok_idx >= len(req.fill_ids) + 1:
                        break
                    req.input_token_logprobs.append(
                        (float(chosen[base + j]), int(draft_tokens[base + j]))
                    )
                    if k > 0:
                        req.input_top_logprobs.append(
                            {
                                int(t): float(v)
                                for t, v in zip(
                                    tops_i[base + j][:k], tops_v[base + j][:k]
                                )
                            }
                        )

        # retracted completing reqs: the re-sample is a duplicate of the
        # already-known last token — seed their rows from host history
        seed_rows, seed_toks = [], []
        for i, req in enumerate(reqs):
            if comp[i] and not fresh[i] and not req.is_embedding:
                seed_rows.append(req.row)
                seed_toks.append(req.output_ids[-1])
        if seed_rows:
            st.seed_rows(
                np.asarray(seed_rows, np.int32), np.asarray(seed_toks, np.int32)
            )

        # host bookkeeping that needs no device results
        for i, req in enumerate(reqs):
            req.fill_len += req._chunk
            self._cache_unfinished(req)
            if not comp[i]:
                self.chunked_req = req  # only the last req can be chunked
                continue
            if self.ngram is not None:
                self.ngram.update(req.fill_ids)
            self.running.append(req)

        self.pending.append(
            ("prefill", [
                (req, i, comp[i], fresh[i]) for i, req in enumerate(reqs)
            ], ids, lp, want_lp)
        )
        return True

    @staticmethod
    def _logit_bias_matrix(reqs, vocab: int):
        """Dense [B, V] bias (OpenAI logit_bias) — built only when some
        request carries one (rare; these requests ride the sync paths)."""
        if not any(r.sampling_params.has_logit_bias for r in reqs):
            return None
        bias = np.zeros((len(reqs), vocab), np.float32)
        for i, r in enumerate(reqs):
            lb = r.sampling_params.logit_bias
            if lb:
                for tok, v in lb.items():
                    t = int(tok)
                    if 0 <= t < vocab:
                        bias[i, t] = float(v)
        return bias

    def _advance_grammar(self, req: Req, token: int):
        """Advance the grammar DFA; force-finish when the grammar completes
        (EOS under mask, or no continuation remains)."""
        g = req.grammar
        if g is None or req.finished():
            if g is not None and req.finished():
                pass
            return
        g.accept_token(token)
        if g.finished or g.is_terminated():
            req.finish_info = FinishInfo(FinishReason.STOP_STR)

    def _record_logprobs(self, req: Req, lp: dict, row: int):
        req.output_token_logprobs.append(float(lp["logprobs"][row]))
        k = min(req.sampling_params.top_logprobs_num, lp["top_ids"].shape[1])
        if k > 0:
            req.output_top_logprobs.append(
                {
                    int(t): float(v)
                    for t, v in zip(lp["top_ids"][row][:k], lp["top_logprobs"][row][:k])
                }
            )
        else:
            req.output_top_logprobs.append({})

    def _cache_unfinished(self, req: Req):
        """Publish this request's filled full pages into the radix tree so
        concurrent requests share them (reference cache_unfinished_req,
        radix_cache.py:475).  The request's duplicate pages are swapped for
        the tree's and freed; the path is re-locked at the deeper node."""
        if self.server_args.disable_radix_cache:
            return
        if req.input_embeds is not None:
            return  # placeholder ids would alias unrelated prompts
        ps = self.page_size
        fp = req.fill_len // ps
        if fp == 0:
            return
        key = self._cache_ids(req)[: fp * ps]
        released = getattr(req, "swa_released", 0)
        dup_pos = self.tree.insert2(key, req.pages[:fp], dead_pages=released)
        start = max(req.prefix_pages, released)
        m = self.tree.match_prefix(key)
        assert m.matched_len == fp * ps, (m.matched_len, fp * ps)
        # free our own copies of pages the tree already held live
        self.allocator.free_pages(
            [req.pages[p] for p in dup_pos if p >= start]
        )
        req.pages[:fp] = m.pages
        if req.last_node is not None:
            self.tree.dec_lock_ref(req.last_node)
        self.tree.inc_lock_ref(m.last_node)
        req.last_node = m.last_node
        req.prefix_pages = fp

    def _alloc_with_evict(self, before: int, after: int, pages):
        """alloc_extend with tree eviction fallback (reference: allocator OOM
        -> evict evictable radix pages, then retry)."""
        new = self.allocator.alloc_extend(before, after, pages)
        if new is None:
            need = cdiv(after, self.page_size) - len(pages)
            self.tree.evict(need - self.allocator.available_pages())
            new = self.allocator.alloc_extend(before, after, pages)
        return new

    def _release_prefill_state(self, req: Req):
        """Undo partial prefill state (pages + lock + row) before requeueing."""
        self.allocator.free_pages(req.owned_pages())
        if req.last_node is not None:
            self.tree.dec_lock_ref(req.last_node)
        if req.row is not None:
            self.runner.sampling_state.release_row(req.row)
            req.row = None
        req.reset_for_retract()

    # ------------------------------------------------------------------
    # overlap pipeline
    # ------------------------------------------------------------------

    def _dispatch_decode(self) -> bool:
        """Dispatch one decode step whose input tokens resolve on device
        from the sampling-state rows (no host sync).  fill_len is bumped at
        dispatch; output tokens are appended when the result is processed."""
        self._ensure_decode_memory()
        if not self.running:
            return False
        if self._rows_dirty:
            self._sync_device_rows()
        ps = self.page_size
        B = len(self.running)
        positions = np.zeros(B, np.int32)
        slots = np.zeros(B, np.int32)
        lengths = np.zeros(B, np.int32)
        steps = np.zeros(B, np.int32)
        row_ids = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in self.running)
        page_table = np.zeros((B, pmax), np.int32)
        rows = []
        for i, r in enumerate(self.running):
            pos = r.fill_len
            # mrope requests rope at an offset (delta) while KV slots stay
            # token-indexed
            positions[i] = pos + getattr(r, "mrope_delta", 0)
            slots[i] = r.pages[pos // ps] * ps + pos % ps
            lengths[i] = pos + 1
            # tokens sampled so far == fill_len - prompt + 1 (fill_ids
            # excludes the newest output; holds across in-flight bumps)
            steps[i] = pos - len(r.input_ids) + 1
            row_ids[i] = r.row
            page_table[i, : len(r.pages)] = r.pages
            rows.append(r.sampling_row())
        want_lp = any(r.sampling_params.return_logprob for r in self.running)
        want_pen = any(r.sampling_params.has_penalties for r in self.running)
        d = DecodeInput(
            tokens=np.zeros(B, np.int32),  # unused: device rows feed inputs
            positions=positions,
            slots=slots,
            page_table=page_table,
            lengths=lengths,
            sample_steps=steps,
            sampling=rows,
            row_ids=row_ids,
            lora_idx=np.asarray([getattr(r, 'lora_slot', -1) for r in self.running], np.int32),
        )
        ids, lp = self.runner.forward_decode_overlap(
            d, want_logprobs=want_lp, update_counts=want_pen
        )
        for r in self.running:
            r.fill_len += 1
        self.pending.append(("decode", list(self.running), ids, lp, want_lp))
        return True

    def _dispatch_decode_constrained(self) -> bool:
        """Two-phase overlap decode for grammar / logit_bias batches.

        Phase A (forward -> device logits) dispatches immediately with
        device-resident input tokens; the blocking fetch of the PREVIOUS
        step's ids then overlaps the in-flight forward, the grammar DFAs
        advance, and phase B (bit-packed mask + sample) dispatches.  One
        constrained request no longer forces co-residents synchronous —
        TPU analogue of the reference's same-stream bitmask pipelining
        (`srt/constrained/xgrammar_backend.py:94-117`)."""
        self._ensure_decode_memory()
        if not self.running:
            return False
        if self._rows_dirty:
            self._sync_device_rows()
        ps = self.page_size
        items = list(self.running)
        B = len(items)
        positions = np.zeros(B, np.int32)
        slots = np.zeros(B, np.int32)
        lengths = np.zeros(B, np.int32)
        steps = np.zeros(B, np.int32)
        row_ids = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in items)
        page_table = np.zeros((B, pmax), np.int32)
        rows = []
        for i, r in enumerate(items):
            pos = r.fill_len
            # mrope requests rope at an offset (delta) while KV slots stay
            # token-indexed
            positions[i] = pos + getattr(r, "mrope_delta", 0)
            slots[i] = r.pages[pos // ps] * ps + pos % ps
            lengths[i] = pos + 1
            steps[i] = pos - len(r.input_ids) + 1
            row_ids[i] = r.row
            page_table[i, : len(r.pages)] = r.pages
            rows.append(r.sampling_row())
        want_lp = any(r.sampling_params.return_logprob for r in items)
        want_pen = any(r.sampling_params.has_penalties for r in items)
        d = DecodeInput(
            tokens=np.zeros(B, np.int32),  # unused: device rows feed inputs
            positions=positions,
            slots=slots,
            page_table=page_table,
            lengths=lengths,
            sample_steps=steps,
            sampling=rows,
            row_ids=row_ids,
            lora_idx=np.asarray(
                [getattr(r, "lora_slot", -1) for r in items], np.int32
            ),
        )
        ctx = self.runner.forward_decode_logits(d, update_counts=want_pen)
        for r in items:
            r.fill_len += 1
        # the forward is in flight: fetch last step's ids now (overlapped)
        # so the grammar states — and therefore this step's masks — are exact
        self._inflight_snapshot = items
        self._drain_pending()
        self._inflight_snapshot = None
        V = self.runner.model_config.vocab_size
        vocab_mask = None
        if any(r.grammar is not None for r in items):
            vocab_mask = np.ones((B, V), bool)
            for i, r in enumerate(items):
                if r.grammar is not None and not r.finished() \
                        and not getattr(r, "inflight_discard", 0):
                    vocab_mask[i] = r.grammar.vocab_mask()
        logit_bias = self._logit_bias_matrix(items, V)
        ids, lp = self.runner.sample_constrained(
            ctx, vocab_mask=vocab_mask, logit_bias=logit_bias,
            want_logprobs=want_lp,
        )
        self.pending.append(("decode", items, ids, lp, want_lp))
        return True

    def _process_one_pending(self):
        """Fetch + post-process the oldest in-flight batch (the only sync
        point of the pipeline)."""
        kind, items, ids, lp, want_lp = self.pending.popleft()
        ids = np.asarray(ids)
        if lp is not None:
            lp = {k: np.asarray(v) for k, v in lp.items()}
        now = time.monotonic()
        if kind == "decode":
            for i, r in enumerate(items):
                if r.finished():  # finished/aborted while this was in flight
                    continue
                if getattr(r, "inflight_discard", 0):
                    # sampled id orphaned by a jump-forward (its KV write —
                    # the INPUT token's — remains valid; only the sample is
                    # discarded)
                    r.inflight_discard -= 1
                    continue
                new_id = int(ids[i])
                r.output_ids.append(new_id)
                if want_lp and r.sampling_params.return_logprob:
                    self._record_logprobs(r, lp, i)
                r.check_finished(new_id)
                jf = []
                if r.grammar is not None:
                    self._advance_grammar(r, new_id)
                    if not r.finished() and \
                            not self.server_args.disable_jump_forward:
                        jf = self._try_jump_forward(r)
                self._out_buffer.append(ReqOutput(r, [new_id] + jf))
                if r.finished():
                    if r in self.running:
                        self.running.remove(r)
                    self._finish_req(r)
                elif jf:
                    # forced tokens have no KV: re-extend through prefill;
                    # discard the sampled ids of any in-flight decode steps
                    if r in self.running:
                        self.running.remove(r)
                    n_if = sum(
                        1 for e in self.pending
                        if e[0] == "decode" and r in e[1]
                    )
                    snap = getattr(self, "_inflight_snapshot", None)
                    if snap is not None and r in snap:
                        n_if += 1
                    r.inflight_discard = (
                        getattr(r, "inflight_discard", 0) + n_if
                    )
                    self.waiting.appendleft(r)
            self.new_token_ratio = max(
                self.new_token_ratio - self.new_token_ratio_decay,
                self.base_new_token_ratio,
            )
        else:  # prefill
            for r, i, completing, fresh_ in items:
                if not completing or r.finished():
                    continue
                if not fresh_:
                    # retracted re-prefill: the sampled id duplicates the
                    # already-known last token — discard
                    continue
                next_id = int(ids[i])
                r.output_ids.append(next_id)
                if want_lp and lp is not None and r.sampling_params.return_logprob:
                    self._record_logprobs(r, lp, i)
                if r.first_token_time is None:
                    r.first_token_time = now
                    if tracing_enabled():
                        trace_slice_end(r.rid, "prefill")
                        trace_slice_start(r.rid, "decode")
                r.check_finished(next_id)
                self._advance_grammar(r, next_id)
                self._out_buffer.append(ReqOutput(r, [next_id]))
                if r.finished():
                    if r in self.running:
                        self.running.remove(r)
                    self._finish_req(r)
        self.last_progress_time = time.monotonic()

    def _drain_pending(self):
        """Process every in-flight batch (sync point — used before paths
        that need complete host-side output_ids)."""
        while self.pending:
            self._process_one_pending()

    def _sync_device_rows(self):
        """Reseed device rows + penalty counts from host history after a
        sync-path step left them stale."""
        st = self.runner.sampling_state
        rows, toks = [], []
        for r in self.running:
            if r.output_ids and r.row is not None:
                rows.append(r.row)
                toks.append(r.output_ids[-1])
        if rows:
            st.seed_rows(np.asarray(rows, np.int32), np.asarray(toks, np.int32))
        for r in self.running:
            if r.sampling_params.has_penalties and r.row is not None:
                st.reset_counts(np.asarray([r.row], np.int32))
                st.upload_counts(r.row, r.output_ids)
        self._rows_dirty = False

    def drop_inflight(self):
        """Failure recovery: forget dispatched batches, reclaim all rows."""
        self.pending.clear()
        self._out_buffer.clear()
        for r in list(self.running) + list(self.waiting):
            r.row = None
        if self.chunked_req is not None:
            self.chunked_req.row = None
        self.runner.sampling_state.reset_rows()
        self._rows_dirty = True

    # ------------------------------------------------------------------
    # decode
    # ------------------------------------------------------------------

    def _run_decode_step(self) -> List[ReqOutput]:
        self._ensure_decode_memory()
        if not self.running:
            return []
        ps = self.page_size
        B = len(self.running)
        tokens = np.zeros(B, np.int32)
        positions = np.zeros(B, np.int32)
        slots = np.zeros(B, np.int32)
        lengths = np.zeros(B, np.int32)
        sample_steps = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in self.running)
        page_table = np.zeros((B, pmax), np.int32)
        rows = []
        for i, r in enumerate(self.running):
            tokens[i] = r.output_ids[-1]
            pos = r.fill_len
            # mrope requests rope at an offset (delta) while KV slots stay
            # token-indexed
            positions[i] = pos + getattr(r, "mrope_delta", 0)
            slots[i] = r.pages[pos // ps] * ps + pos % ps
            lengths[i] = pos + 1
            sample_steps[i] = len(r.output_ids)
            page_table[i, : len(r.pages)] = r.pages
            rows.append(r.sampling_row())

        d = DecodeInput(
            tokens=tokens,
            positions=positions,
            slots=slots,
            page_table=page_table,
            lengths=lengths,
            sample_steps=sample_steps,
            sampling=rows,
            lora_idx=np.asarray([getattr(r, 'lora_slot', -1) for r in self.running], np.int32),
        )
        want_lp = any(r.sampling_params.return_logprob for r in self.running)
        V = self.runner.model_config.vocab_size
        vocab_mask = None
        if any(r.grammar is not None for r in self.running):
            vocab_mask = np.ones((B, V), bool)
            for i, r in enumerate(self.running):
                if r.grammar is not None:
                    vocab_mask[i] = r.grammar.vocab_mask()
        output_counts = None
        if any(r.sampling_params.has_penalties for r in self.running):
            output_counts = np.zeros((B, V), np.int32)
            for i, r in enumerate(self.running):
                if r.sampling_params.has_penalties and r.output_ids:
                    ids_np = np.asarray(r.output_ids)
                    np.add.at(output_counts[i], ids_np[ids_np < V], 1)
        logit_bias = self._logit_bias_matrix(self.running, V)
        ids, lp = self.runner.forward_decode(
            d, want_logprobs=want_lp, vocab_mask=vocab_mask,
            output_counts=output_counts, logit_bias=logit_bias,
        )

        outputs = []
        still_running = []
        for i, r in enumerate(self.running):
            r.fill_len += 1
            new_id = int(ids[i])
            r.output_ids.append(new_id)
            if want_lp and r.sampling_params.return_logprob:
                self._record_logprobs(r, lp, i)
            r.check_finished(new_id)
            self._advance_grammar(r, new_id)
            jf = []
            if (
                r.grammar is not None
                and not r.finished()
                and not self.server_args.disable_jump_forward
            ):
                jf = self._try_jump_forward(r)
            outputs.append(ReqOutput(r, [new_id] + jf))
            if r.finished():
                self._finish_req(r)
            elif jf:
                # forced tokens have no KV yet: re-extend through prefill
                # (retraction-resume machinery; pages and row retained)
                self.waiting.appendleft(r)
            else:
                still_running.append(r)
        self.running = still_running
        self.new_token_ratio = max(
            self.new_token_ratio - self.new_token_ratio_decay,
            self.base_new_token_ratio,
        )
        return outputs

    def _try_jump_forward(self, r: Req):
        """Append the grammar's forced continuation without model steps
        (reference jump-forward, xgrammar_backend.py:94-138).  Token
        boundaries may differ from free-running decode (retokenization
        effect) — the emitted STRING is identical and grammar-legal."""
        toks = r.grammar.jump_forward_tokens()
        if len(toks) < 2:
            return []
        applied = []
        for t in toks:
            r.output_ids.append(t)
            applied.append(t)
            r.check_finished(t)
            self._advance_grammar(r, t)
            if r.finished():
                break
        return applied

    def _release_swa_pages(self):
        """All-SWA models (every layer windowed, radix disabled): pages
        wholly below every window — with a chunk-straddle safety margin for
        the attention DMA — will never be read again; hand them back
        (reference SWA radix role, swa_radix_cache.py, active-sequence
        subset; cached-prefix tombstones are the listed upgrade)."""
        win = getattr(self, "_swa_release_win", None)
        if win is None:
            from sglang_awq_tpu.mem_cache.swa_radix_cache import SWARadixCache

            w = getattr(self.runner.model, "layer_windows", None) or ()
            # MAX across layers: a page is dead only once below EVERY
            # window.  Runs when the radix tree is off OR is the SWA tree
            # (whose insert2 understands released placeholder prefixes).
            win = max(w) if (w and all(x > 0 for x in w)
                             and (self.server_args.disable_radix_cache
                                  or isinstance(self.tree, SWARadixCache))) else 0
            self._swa_release_win = win
        if not win:
            return
        ps = self.page_size
        from sglang_awq_tpu.mem_cache.swa_radix_cache import SWA_DMA_MARGIN

        margin = SWA_DMA_MARGIN  # largest attention chunk (ppc<=16 x ps<=64)
        for r in self.running:
            # tree-owned prefix pages are never released here — the SWA
            # tree tombstones them under pressure instead
            k = max(getattr(r, "swa_released", 0), r.prefix_pages)
            freed = []
            while (k + 1) * ps <= r.fill_len - win - margin and k < len(r.pages):
                freed.append(r.pages[k])
                r.pages[k] = 0  # valid-but-never-read placeholder
                k += 1
            if freed:
                r.swa_released = k
                self.allocator.free_pages(freed)

    def _ensure_decode_memory(self, grow: int = 1):
        """Grow each running req by `grow` tokens; retract on OOM
        (reference check_decode_mem + retract_decode)."""
        ps = self.page_size
        self._release_swa_pages()

        def deficit(r):
            return max(cdiv(r.fill_len + grow, ps) - len(r.pages), 0)

        want = sum(deficit(r) for r in self.running)
        if want == 0:
            return
        if self.allocator.available_pages() < want:
            self.tree.evict(want - self.allocator.available_pages())
        while (
            sum(deficit(r) for r in self.running) > self.allocator.available_pages()
            and len(self.running) > 1
        ):
            if self.pending:
                # retraction decisions + requeue need complete output_ids
                self._drain_pending()
                continue
            self._retract_one()
        for r in self.running:
            d = deficit(r)
            if d:
                pages = self.allocator.alloc_pages(d)
                assert pages is not None, "decode OOM after retraction"
                r.pages.extend(pages)

    def _run_decode_multi(self) -> List[ReqOutput]:
        """k decode steps in one dispatch (reference
        --num-continuous-decode-steps): sampled ids feed the next step on
        device; host processes the k-token strips afterwards.  Tokens past a
        stop condition are discarded (their KV is length-masked garbage that
        later steps overwrite)."""
        k = min(
            self.server_args.num_continuous_decode_steps,
            min(r.remaining_new_tokens for r in self.running),
        )
        if k <= 1:
            return self._run_decode_step()
        self._ensure_decode_memory(grow=k)
        if not self.running:
            return []
        ps = self.page_size
        B = len(self.running)
        tokens = np.zeros(B, np.int32)
        lengths = np.zeros(B, np.int32)
        steps = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in self.running)
        page_table = np.zeros((B, pmax), np.int32)
        rows = []
        for i, r in enumerate(self.running):
            tokens[i] = r.output_ids[-1]
            lengths[i] = r.fill_len + 1
            steps[i] = len(r.output_ids)
            page_table[i, : len(r.pages)] = r.pages
            rows.append(r.sampling_row())
        d = DecodeInput(
            tokens=tokens,
            positions=lengths - 1,
            slots=np.zeros(B, np.int32),  # derived in-jit
            page_table=page_table,
            lengths=lengths,
            sample_steps=steps,
            sampling=rows,
            lora_idx=np.asarray([getattr(r, 'lora_slot', -1) for r in self.running], np.int32),
        )
        ids = self.runner.forward_decode_multi(d, k)  # [k, bs_pad]
        outputs = []
        still_running = []
        for i, r in enumerate(self.running):
            new_tokens = []
            for s_ in range(k):
                tok = int(ids[s_, i])
                r.output_ids.append(tok)
                new_tokens.append(tok)
                r.fill_len += 1
                r.check_finished(tok)
                if r.finished():
                    break
            outputs.append(ReqOutput(r, new_tokens))
            if r.finished():
                self._finish_req(r)
            else:
                still_running.append(r)
        self.running = still_running
        return outputs

    def _run_decode_step_spec(self) -> List[ReqOutput]:
        """Speculative decode step (ngram drafts + one verify forward).

        Reference role: ngram_worker.py draft + TARGET_VERIFY; greedy
        acceptance, KV rollback is free (rejected rows' KV is overwritten by
        later steps and masked by length meanwhile)."""
        if (
            self.spec_topk > 1
            and self.running
            and self.runner.lora is None  # tree verify has no lora plumbing
            and all(
                # sampled rows verify by draw-matching (round 5); grammar /
                # logit-bias rows still ride the chain path's masked verify
                r.grammar is None
                and not r.sampling_params.has_logit_bias
                for r in self.running
            )
        ):
            if self.spec_tree_scored:
                return self._run_decode_step_spec_tree_scored()
            return self._run_decode_step_spec_tree()
        QS = self.spec_width
        self._ensure_decode_memory(grow=QS)
        if not self.running:
            return []
        ps = self.page_size
        B = len(self.running)
        tokens = np.zeros((B, QS), np.int32)
        positions = np.zeros((B, QS), np.int32)
        slots = np.zeros((B, QS), np.int32)
        lengths = np.zeros(B, np.int32)
        fill_old = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in self.running)
        page_table = np.zeros((B, pmax), np.int32)
        for i, r in enumerate(self.running):
            page_table[i, : len(r.pages)] = r.pages
            fill_old[i] = r.fill_len

        constrained = [
            r.grammar is not None or r.sampling_params.has_logit_bias
            for r in self.running
        ]
        if self.eagle:
            rows = np.asarray(
                [r.row if r.row is not None else -1 for r in self.running],
                np.int32,
            )
            t0 = np.asarray([r.output_ids[-1] for r in self.running], np.int32)
            draft_mat = self.runner.eagle_draft_chain(
                rows, t0, fill_old, page_table, QS - 1
            )
            drafts_per_row = [list(map(int, draft_mat[i])) for i in range(B)]
        else:
            drafts_per_row = [
                self.ngram.draft(r.input_ids + r.output_ids, QS - 1)
                for r in self.running
            ]
        for i, c in enumerate(constrained):
            if c:  # width-1 rows: drafts are never accepted, skip proposing
                drafts_per_row[i] = []

        for i, r in enumerate(self.running):
            drafts = drafts_per_row[i]
            row = [r.output_ids[-1]] + drafts + [0] * (QS - 1 - len(drafts))
            tokens[i] = row
            pos = np.arange(r.fill_len, r.fill_len + QS)
            positions[i] = pos
            pages_np = np.asarray(r.pages, np.int32)
            slots[i] = pages_np[pos // ps] * ps + pos % ps
            lengths[i] = r.fill_len + QS

        all_greedy = all(r.sampling_params.is_greedy for r in self.running)
        bias0 = None
        spec_caps = None
        if any(constrained):
            V = self.runner.model_config.vocab_size
            bias0 = np.zeros((B, V), np.float32)
            spec_caps = np.full(B, QS, np.int32)
            for i, r in enumerate(self.running):
                if not constrained[i]:
                    continue
                spec_caps[i] = 1
                if r.grammar is not None:
                    bias0[i] = np.where(r.grammar.vocab_mask(), 0.0, -1e30)
                if r.sampling_params.has_logit_bias:
                    for tid, bv in r.sampling_params.logit_bias.items():
                        t = int(tid)
                        if 0 <= t < V:
                            bias0[i, t] += float(bv)
        want_pen = any(r.sampling_params.has_penalties for r in self.running)
        ids, emit_ids, emit_len = self.runner.forward_spec_verify(
            tokens, positions, slots, page_table, lengths,
            sampling=[r.sampling_row() for r in self.running],
            sample_steps=np.asarray(
                [len(r.output_ids) for r in self.running], np.int32),
            all_greedy=all_greedy,
            lora_idx=np.asarray([getattr(r, 'lora_slot', -1) for r in self.running], np.int32),
            bias0=bias0, spec_caps=spec_caps,
            row_ids=np.asarray([r.row for r in self.running], np.int32),
            update_counts=want_pen,
        )

        accepts = np.ones(B, np.int32)
        outputs = []
        still_running = []
        for i, r in enumerate(self.running):
            accepted = int(emit_len[i])
            accepts[i] = accepted
            new_tokens = []
            for t in range(accepted):
                tok = int(emit_ids[i, t])
                r.output_ids.append(tok)
                new_tokens.append(tok)
                if r.grammar is not None:
                    self._advance_grammar(r, tok)
                r.check_finished(tok)
                if r.finished():
                    break
            r.fill_len += len(new_tokens)
            if self.ngram is not None:
                self.ngram.update(
                    (r.input_ids + r.output_ids)[
                        -(self.ngram.n + len(new_tokens) + 1):
                    ]
                )
            self.spec_accept_sum += len(new_tokens)
            self.spec_steps += 1
            if self.metrics.enabled and self.spec_steps % 64 == 0:
                self.metrics.spec_accept_length.set(
                    self.spec_accept_sum / self.spec_steps
                )
            jf = []
            if r.grammar is not None and not r.finished():
                jf = self._try_jump_forward(r)
            outputs.append(ReqOutput(r, new_tokens + jf))
            if r.finished():
                self._finish_req(r)
            elif jf:
                # forced tokens have no KV yet: re-extend through prefill
                self.waiting.appendleft(r)
            else:
                still_running.append(r)
        if self.eagle:
            # repair the draft KV over the verify window + commit the chain
            # start feature (runs on the pre-acceptance batch layout)
            rows = np.asarray(
                [r.row if r.row is not None else -1 for r in self.running],
                np.int32,
            )
            self.runner.eagle_commit_fixup(
                ids[:B], accepts, rows, fill_old, page_table
            )
        self.running = still_running
        return outputs

    def _run_decode_step_spec_tree(self) -> List[ReqOutput]:
        """EAGLE TREE decode step (reference eagle_worker.py topk>1 path).

        Draft: top-k candidates at the first step, each continued greedily
        -> k branches of depth-1 tokens.  Verify: one tree-masked forward
        over all 1 + k*(depth-1) nodes.  Accept: greedy walk — pick the
        branch whose root candidate matches the target's argmax, then
        chain-accept within it.  The accepted path's KV is relocated from
        its node slots onto the position-contiguous slots."""
        from sglang_awq_tpu.speculative.tree import (
            make_tree_mask, tree_node_offsets, tree_size)

        D = self.spec_width  # per-branch chain length incl. the root
        K = self.spec_topk
        QS = tree_size(K, D)
        self._ensure_decode_memory(grow=QS)
        if not self.running:
            return []
        ps = self.page_size
        B = len(self.running)
        if self._tree_mask is None:
            self._tree_mask = make_tree_mask(K, D)
        offsets = tree_node_offsets(K, D)

        fill_old = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in self.running)
        page_table = np.zeros((B, pmax), np.int32)
        for i, r in enumerate(self.running):
            page_table[i, : len(r.pages)] = r.pages
            fill_old[i] = r.fill_len
        rows = np.asarray(
            [r.row if r.row is not None else -1 for r in self.running],
            np.int32,
        )
        t0 = np.asarray([r.output_ids[-1] for r in self.running], np.int32)
        branches = self.runner.eagle_draft_tree(
            rows, t0, fill_old, page_table, K, D - 1
        )  # [B, K, D-1]

        tokens = np.zeros((B, QS), np.int32)
        positions = np.zeros((B, QS), np.int32)
        slots = np.zeros((B, QS), np.int32)
        for i, r in enumerate(self.running):
            tokens[i, 0] = t0[i]
            tokens[i, 1:] = branches[i].reshape(-1)
            positions[i] = r.fill_len + offsets
            # slot addresses are position-agnostic: node n stores at the
            # page-table slot of position fill+n (distinct per node)
            sp = r.fill_len + np.arange(QS)
            pages_np = np.asarray(r.pages, np.int32)
            slots[i] = pages_np[sp // ps] * ps + sp % ps

        any_sampled = any(
            not r.sampling_params.is_greedy for r in self.running)
        ids = self.runner.forward_spec_verify_tree(
            tokens, positions, slots, page_table, fill_old, self._tree_mask,
            sampling=(
                [r.sampling_row() for r in self.running]
                if any_sampled else None),
            sample_steps=(
                np.asarray([len(r.output_ids) for r in self.running],
                           np.int32)[:, None] + offsets[None, :]
                if any_sampled else None),
        )  # [B, QS] next-token per node (argmax, or a seeded draw)

        accepts = np.ones(B, np.int32)
        path_nodes = np.zeros((B, D), np.int32)
        path_ids = np.zeros((B, D), np.int32)
        src_rel, dst_rel = [], []
        outputs = []
        still_running = []
        for i, r in enumerate(self.running):
            root_next = int(ids[i, 0])
            nodes = [0]
            emit = [root_next]
            for b in range(K):
                if int(branches[i, b, 0]) != root_next:
                    continue
                for dj in range(D - 1):
                    node = 1 + b * (D - 1) + dj
                    nodes.append(node)
                    nxt = int(ids[i, node])
                    emit.append(nxt)
                    if dj + 1 >= D - 1 or int(branches[i, b, dj + 1]) != nxt:
                        break
                break  # top-k roots are distinct: at most one branch matches
            acc = len(emit)
            accepts[i] = acc
            path_nodes[i, :acc] = nodes
            path_ids[i, :acc] = emit
            # relocate accepted non-root nodes onto contiguous slots (branch
            # 0's nodes already live there — identity moves are skipped)
            for j in range(1, acc):
                if nodes[j] != j:
                    src_rel.append(int(slots[i, nodes[j]]))
                    dst_rel.append(int(slots[i, j]))

            new_tokens = []
            for tok in emit:
                r.output_ids.append(tok)
                new_tokens.append(tok)
                r.check_finished(tok)
                if r.finished():
                    break
            r.fill_len += len(new_tokens)
            self.spec_accept_sum += len(new_tokens)
            self.spec_steps += 1
            if self.metrics.enabled and self.spec_steps % 64 == 0:
                self.metrics.spec_accept_length.set(
                    self.spec_accept_sum / self.spec_steps
                )
            outputs.append(ReqOutput(r, new_tokens))
            if r.finished():
                self._finish_req(r)
            else:
                still_running.append(r)

        if src_rel:
            # pad to a stable shape (per-batch-bucket) to bound compiles
            from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT

            cap = B * (D - 1)
            m = 8
            while m < len(src_rel) and m < cap:
                m *= 2
            m = min(max(m, len(src_rel)), cap)
            src = np.zeros(m, np.int64)
            dst = np.full(m, PAD_SLOT, np.int64)
            src[: len(src_rel)] = src_rel
            dst[: len(dst_rel)] = dst_rel
            self.runner.kv_relocate(src, dst)

        self.runner.eagle_tree_fixup(
            path_nodes, path_ids, accepts, rows, fill_old, page_table
        )
        self.running = still_running
        return outputs

    def _run_decode_step_spec_tree_scored(self) -> List[ReqOutput]:
        """Score-driven EAGLE tree decode step (round 5).

        Reference role: `eagle_worker.py:566` + `eagle_utils.py:47
        build_tree_kernel_efficient` — the tree topology is chosen per
        request from cumulative draft logprobs within a static node
        budget.  Draft: one folded frontier forward per level
        (runner.eagle_draft_tree_scored).  Verify: one tree forward with
        the per-request topology mask as DEVICE DATA; sampled rows verify
        by draw-matching.  Accept: walk children by parent links."""
        from sglang_awq_tpu.speculative.tree import tree_size

        D = self.spec_width
        K = self.spec_topk
        QS = tree_size(K, D)  # same node budget as the static tree
        self._ensure_decode_memory(grow=QS)
        if not self.running:
            return []
        ps = self.page_size
        B = len(self.running)

        fill_old = np.zeros(B, np.int32)
        pmax = max(len(r.pages) for r in self.running)
        page_table = np.zeros((B, pmax), np.int32)
        for i, r in enumerate(self.running):
            page_table[i, : len(r.pages)] = r.pages
            fill_old[i] = r.fill_len
        rows = np.asarray(
            [r.row if r.row is not None else -1 for r in self.running],
            np.int32,
        )
        t0 = np.asarray([r.output_ids[-1] for r in self.running], np.int32)
        tokens, parents, depths = self.runner.eagle_draft_tree_scored(
            rows, t0, fill_old, page_table, K, D - 1, QS
        )

        # topology mask from parent links: anc(node) = anc(parent) + self
        mask = np.zeros((B, QS, QS), bool)
        mask[:, :, 0] = True
        mask[:, 0, 0] = True
        ar = np.arange(B)
        for n in range(1, QS):
            mask[:, n] = mask[ar, parents[:, n]]
            mask[:, n, n] = True

        positions = fill_old[:, None] + depths
        slots = np.zeros((B, QS), np.int32)
        for i, r in enumerate(self.running):
            sp = r.fill_len + np.arange(QS)
            pages_np = np.asarray(r.pages, np.int32)
            slots[i] = pages_np[sp // ps] * ps + sp % ps

        any_sampled = any(
            not r.sampling_params.is_greedy for r in self.running)
        ids = self.runner.forward_spec_verify_tree(
            tokens, positions, slots, page_table, fill_old, mask,
            sampling=(
                [r.sampling_row() for r in self.running]
                if any_sampled else None),
            sample_steps=(
                np.asarray([len(r.output_ids) for r in self.running],
                           np.int32)[:, None] + depths
                if any_sampled else None),
        )

        # children by parent link, ordered by draft score (= node index:
        # selection is score-sorted, so the first match is the best child)
        accepts = np.ones(B, np.int32)
        path_nodes = np.zeros((B, D), np.int32)
        path_ids = np.zeros((B, D), np.int32)
        src_rel, dst_rel = [], []
        outputs = []
        still_running = []
        for i, r in enumerate(self.running):
            children = [[] for _ in range(QS)]
            for n in range(1, QS):
                children[int(parents[i, n])].append(n)
            nodes = [0]
            emit = [int(ids[i, 0])]
            cur = 0
            while len(nodes) < D:
                nxt = None
                for cnd in children[cur]:
                    if int(tokens[i, cnd]) == emit[-1]:
                        nxt = cnd
                        break
                if nxt is None:
                    break
                nodes.append(nxt)
                emit.append(int(ids[i, nxt]))
                cur = nxt
            acc = len(emit)
            accepts[i] = acc
            path_nodes[i, :acc] = nodes
            path_ids[i, :acc] = emit
            for j in range(1, acc):
                if nodes[j] != j:
                    src_rel.append(int(slots[i, nodes[j]]))
                    dst_rel.append(int(slots[i, j]))

            new_tokens = []
            for tok in emit:
                r.output_ids.append(tok)
                new_tokens.append(tok)
                r.check_finished(tok)
                if r.finished():
                    break
            r.fill_len += len(new_tokens)
            self.spec_accept_sum += len(new_tokens)
            self.spec_steps += 1
            if self.metrics.enabled and self.spec_steps % 64 == 0:
                self.metrics.spec_accept_length.set(
                    self.spec_accept_sum / self.spec_steps
                )
            outputs.append(ReqOutput(r, new_tokens))
            if r.finished():
                self._finish_req(r)
            else:
                still_running.append(r)

        if src_rel:
            from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT

            cap = B * (QS - 1)
            m = 8
            while m < len(src_rel) and m < cap:
                m *= 2
            m = min(max(m, len(src_rel)), cap)
            src = np.zeros(m, np.int64)
            dst = np.full(m, PAD_SLOT, np.int64)
            src[: len(src_rel)] = src_rel
            dst[: len(dst_rel)] = dst_rel
            self.runner.kv_relocate(src, dst)

        self.runner.eagle_tree_fixup(
            path_nodes, path_ids, accepts, rows, fill_old, page_table
        )
        self.running = still_running
        return outputs

    def _retract_one(self):
        """Retract the req with most output / shortest prompt
        (reference retract policy, schedule_batch.py:1711-1760)."""
        victim = max(
            self.running, key=lambda r: (len(r.output_ids), -len(r.input_ids))
        )
        self.running.remove(victim)
        if victim.row is not None:
            self.runner.sampling_state.release_row(victim.row)
            victim.row = None
        self.allocator.free_pages(victim.owned_pages())
        if victim.last_node is not None:
            self.tree.dec_lock_ref(victim.last_node)
        victim.reset_for_retract()
        self.waiting.appendleft(victim)
        if self.metrics.enabled:
            self.metrics.num_retractions.inc()
        # raise the reservation estimate (reference new_estimate_ratio)
        total_max = sum(r.max_new_tokens for r in self.running) or 1
        decoded = sum(len(r.output_ids) for r in self.running)
        self.new_token_ratio = min(
            1.0,
            max(
                self.new_token_ratio,
                (decoded + RETRACT_DECODE_STEPS * max(len(self.running), 1))
                / total_max,
            ),
        )
        logger.info("retracted %s (new_token_ratio=%.3f)", victim.rid, self.new_token_ratio)

    # ------------------------------------------------------------------
    # finish / abort / release
    # ------------------------------------------------------------------

    def _finish_req(self, req: Req):
        ps = self.page_size
        if req.row is not None:
            self.runner.sampling_state.release_row(req.row)
            req.row = None
        if self.server_args.disable_radix_cache:
            self.allocator.free_pages(req.owned_pages())
        else:
            # overlap: a step dispatched after this req finished may have
            # bumped fill_len past the host-known tokens — clamp
            fill_tokens = min(req.fill_len, len(req.fill_ids))
            full_pages = fill_tokens // ps
            released = getattr(req, "swa_released", 0)
            dup_pos = self.tree.insert2(
                self._cache_ids(req)[: full_pages * ps],
                req.pages[:full_pages],
                dead_pages=released,
            )
            start = max(req.prefix_pages, released)
            # req's own live pages duplicating existing tree content
            self.allocator.free_pages(
                [req.pages[p] for p in dup_pos if p >= start]
            )
            # unfilled tail pages stay ours -> free
            self.allocator.free_pages(req.pages[full_pages:])
            if req.last_node is not None:
                self.tree.dec_lock_ref(req.last_node)
        req.pages = []
        req.prefix_pages = 0
        req.last_node = None
        self.metrics.observe_finish(req)
        if tracing_enabled():
            trace_req_finish(
                req.rid,
                prompt_tokens=len(req.input_ids),
                completion_tokens=len(req.output_ids),
                finish_reason=(
                    req.finish_info.to_finish_reason_str()
                    if req.finish_info else ""
                ),
                retractions=req.retractions,
            )

    def _process_aborts(self):
        if not self.abort_rids:
            return
        rids = self.abort_rids
        self.abort_rids = set()
        for req in list(self.waiting):
            if req.rid in rids:
                self.waiting.remove(req)
                req.finish_info = FinishInfo(FinishReason.ABORT)
        for req in list(self.running):
            if req.rid in rids:
                self.running.remove(req)
                req.finish_info = FinishInfo(FinishReason.ABORT)
                self._finish_req(req)
        if self.chunked_req is not None and self.chunked_req.rid in rids:
            req = self.chunked_req
            self.chunked_req = None
            req.finish_info = FinishInfo(FinishReason.ABORT)
            self._finish_req(req)

    def flush_cache(self) -> bool:
        """Drop the prefix cache (reference scheduler.py:2326): only when idle."""
        if self.running or self.waiting or self.chunked_req or self.pending:
            return False
        self.tree.reset()
        self.allocator.clear()
        self.runner.flush_cache()
        return True

    # ------------------------------------------------------------------
    # self checks (reference scheduler_runtime_checker_mixin.py:173,309)
    # ------------------------------------------------------------------

    def check_memory(self):
        held = sum(len(r.owned_pages()) for r in self.running)
        if self.chunked_req is not None:
            held += len(self.chunked_req.owned_pages())
        self.tree.check_invariant(request_held_pages=held)
