"""Request lifecycle state.

Role model: reference `Req` (`python/sglang/srt/managers/schedule_batch.py:456`
— token ids, prefix indices, sampling state, finish reasons `:100-156`).
Batch tensor assembly lives in the scheduler/ModelRunner; this module keeps
the per-request host state.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Any, Dict, List, Optional

from sglang_awq_tpu.model_executor.forward_batch import SamplingRow
from sglang_awq_tpu.sampling.sampling_params import SamplingParams
from sglang_awq_tpu.utils import cdiv


class FinishReason(enum.Enum):
    EOS = "stop"  # eos token (OpenAI finish_reason "stop")
    STOP_STR = "stop"
    STOP_TOKEN = "stop"
    LENGTH = "length"
    ABORT = "abort"


@dataclasses.dataclass
class FinishInfo:
    reason: FinishReason
    matched_token: Optional[int] = None
    matched_str: Optional[str] = None

    def to_finish_reason_str(self) -> str:
        return self.reason.value


class Req:
    def __init__(
        self,
        rid: str,
        input_ids: List[int],
        sampling_params: SamplingParams,
        stream: bool = False,
        eos_token_ids: Optional[set] = None,
        arrival_time: Optional[float] = None,
    ):
        self.rid = rid
        self.input_ids = list(input_ids)
        self.sampling_params = sampling_params
        self.stream = stream
        self.eos_token_ids = eos_token_ids or set()
        self.arrival_time = arrival_time or time.monotonic()

        self.output_ids: List[int] = []
        self.grammar = None  # Optional[GrammarMatcher]
        self.is_embedding = False
        self.embedding = None  # List[float] result for embedding reqs
        self.input_embeds = None  # np [T, H]: multimodal embedding injection
        self.output_token_logprobs: List[float] = []
        self.output_top_logprobs: List[Dict[int, float]] = []
        # (logprob, token_id) per scored prompt token (input logprobs)
        self.input_token_logprobs: List = []
        self.input_top_logprobs: List = []
        self.finish_info: Optional[FinishInfo] = None

        # --- KV state (pages granularity) ---
        self.pages: List[int] = []  # all pages covering fill_len tokens
        self.prefix_pages = 0  # leading pages shared with the radix tree (not owned)
        self.prefix_len = 0  # tokens reused from cache
        self.fill_len = 0  # tokens whose KV is materialized
        self.last_node = None  # radix tree lock handle

        # device sampling-state row (overlap scheduling): owned from
        # admission until finish/retract; the device-side last-token and
        # penalty-count tables index by it
        self.row: Optional[int] = None

        # --- scheduling metadata ---
        self.queued_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.retractions = 0

        # incremental detokenization state
        self.read_offset = 0
        self.surr_offset = 0
        self.decoded_text = ""

    # ------------------------------------------------------------------

    @property
    def seq_len(self) -> int:
        return len(self.input_ids) + len(self.output_ids)

    @property
    def fill_ids(self) -> List[int]:
        """Tokens whose KV must exist before the next decode step: the
        prompt plus all outputs except the newest (its KV is written during
        its own decode step).  After retraction this is what re-prefills
        (reference: retracted reqs re-extend prompt+generated)."""
        if self.output_ids:
            return self.input_ids + self.output_ids[:-1]
        return self.input_ids

    @property
    def extend_len(self) -> int:
        """fill tokens whose KV still needs computing."""
        return len(self.fill_ids) - self.fill_len

    @property
    def max_new_tokens(self) -> int:
        return self.sampling_params.max_new_tokens

    @property
    def wants_input_lp(self) -> bool:
        sp = self.sampling_params
        return sp.return_logprob and sp.logprob_start_len >= 0

    @property
    def remaining_new_tokens(self) -> int:
        return max(self.max_new_tokens - len(self.output_ids), 0)

    def finished(self) -> bool:
        return self.finish_info is not None

    def owned_pages(self) -> List[int]:
        # swa_released pages (a prefix of the list, freed while the request
        # ran past its sliding window) are already back in the allocator
        start = max(self.prefix_pages, getattr(self, "swa_released", 0))
        return self.pages[start:]

    def pages_needed(self, total_tokens: int, page_size: int) -> int:
        return cdiv(total_tokens, page_size)

    def sampling_row(self) -> SamplingRow:
        sp = self.sampling_params
        import random

        seed = sp.seed if sp.seed is not None else random.getrandbits(31)
        return SamplingRow(
            temperature=sp.temperature,
            top_p=sp.top_p,
            top_k=sp.top_k,
            min_p=sp.min_p,
            seed=seed,
            frequency_penalty=sp.frequency_penalty,
            presence_penalty=sp.presence_penalty,
            repetition_penalty=sp.repetition_penalty,
            min_new_tokens=sp.min_new_tokens,
        )

    def check_finished(self, new_token: int):
        """Finish checks after appending new_token (EOS / stop ids / length).

        Stop STRINGS are checked at the detokenizer layer
        (reference detokenizer_manager.py:121 trim_matched_stop).
        """
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finish_info = FinishInfo(FinishReason.LENGTH)
            return
        if not sp.ignore_eos and new_token in self.eos_token_ids:
            if len(self.output_ids) >= sp.min_new_tokens:
                self.finish_info = FinishInfo(FinishReason.EOS, matched_token=new_token)
                return
        if new_token in sp.stop_token_ids:
            if len(self.output_ids) >= sp.min_new_tokens:
                self.finish_info = FinishInfo(
                    FinishReason.STOP_TOKEN, matched_token=new_token
                )

    def reset_for_retract(self):
        """Return to waiting queue after decode retraction
        (reference retract_decode, schedule_batch.py:1711)."""
        self.pages = []
        self.prefix_pages = 0
        self.prefix_len = 0
        self.fill_len = 0
        self.last_node = None
        # stale swa_released would hide the refilled pages from
        # owned_pages() after re-prefill (page leak)
        self.swa_released = 0
        self.retractions += 1

    def __repr__(self):
        return f"Req({self.rid}, in={len(self.input_ids)}, out={len(self.output_ids)})"
