"""Host-side batch descriptions handed to the ModelRunner.

Role model: reference `ForwardBatch`/`ForwardMode`
(`python/sglang/srt/model_executor/forward_batch_info.py:70,227`).  The TPU
runner needs only the numpy arrays that become jit inputs; attention-backend
metadata is implicit in the kernels.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import numpy as np


class ForwardMode(enum.Enum):
    EXTEND = enum.auto()
    DECODE = enum.auto()
    IDLE = enum.auto()


@dataclasses.dataclass
class ExtendBatchInput:
    """Batched multi-request (chunked) prefill step (round 2).

    Token-major ragged layout: sequence b's q tokens occupy rows
    [qb_base[b]*BQ, qb_base[b]*BQ + q_lens[b]) of the flat arrays, with each
    region padded to a BQ (runner.block_q) multiple.  Reference role:
    the extend ModelWorkerBatch assembled by `get_new_batch_prefill`
    (`scheduler.py:1783`).
    """

    tokens: np.ndarray  # [TQ] int32 new tokens (token-major, padded regions)
    positions: np.ndarray  # [TQ] absolute positions
    slots: np.ndarray  # [TQ] flat KV slots (PAD_SLOT for padding rows)
    page_table: np.ndarray  # [B, pmax] page ids covering prefix + chunk
    kv_lens: np.ndarray  # [B] total kv length incl. this chunk
    q_lens: np.ndarray  # [B] live new tokens per sequence
    qb_base: np.ndarray  # [B] first q block per sequence
    # per-seq sampling for the bonus token (rows not finishing their prompt
    # may pass None)
    sampling: list = None  # List[Optional[SamplingRow]]
    sample_steps: np.ndarray = None  # [B]
    # device sampling-state row per sequence (overlap scheduling); None /
    # trash rows for sequences whose sampled id should not be published
    row_ids: np.ndarray = None  # [B] int32
    # EAGLE draft prefill (scheduler fills when --speculative-algorithm
    # eagle): SHIFTED tokens (t_{i+1} at draft position i) over the same
    # token-major regions, with per-seq draft q/kv lengths one shorter on
    # the final chunk (the first chain step covers the last position)
    draft_tokens: np.ndarray = None  # [TQ] int32
    draft_slots: np.ndarray = None  # [TQ] int32 (PAD_SLOT beyond draft q_len)
    draft_q_lens: np.ndarray = None  # [B]
    draft_kv_lens: np.ndarray = None  # [B]
    # per-token LoRA adapter slot (-1 = base model); only read when the
    # server was started with --lora-paths
    lora_idx: np.ndarray = None  # [TQ] int32
    # multimodal / embedding injection: [TQ, H] replaces the embedding
    # lookup for this (solo) batch
    input_embeds: np.ndarray = None
    # per-token image-span ids for the chunk (0 = text; Gemma3-mm
    # bidirectional spans); None for text-only batches
    spans: np.ndarray = None

    def sampling_padded(self, bs_pad: int) -> "SamplingBatch":
        rows = [r or SamplingRow() for r in (self.sampling or [])]
        return SamplingBatch.from_rows(rows, pad_to=bs_pad)

    def all_greedy(self) -> bool:
        return all(
            r is None or r.temperature < 1e-5 for r in (self.sampling or [])
        )


@dataclasses.dataclass
class DecodeInput:
    """Padded decode batch."""

    tokens: np.ndarray  # [B] int32 last sampled tokens
    positions: np.ndarray  # [B]
    slots: np.ndarray  # [B]
    page_table: np.ndarray  # [B, PMAX]
    lengths: np.ndarray  # [B] (0 = padded row)
    sample_steps: np.ndarray = None  # [B] per-req sample position (seed folding)
    sampling: list = None  # List[SamplingRow], len B
    # device sampling-state rows (overlap path: tokens come from last_ids)
    row_ids: np.ndarray = None  # [B] int32
    lora_idx: np.ndarray = None  # [B] int32 adapter slots (-1 = base)

    def sampling_padded(self, bs_pad: int) -> "SamplingBatch":
        return SamplingBatch.from_rows(self.sampling or [], pad_to=bs_pad)

    def all_greedy(self) -> bool:
        return all(r.temperature < 1e-5 for r in (self.sampling or []))


@dataclasses.dataclass
class SamplingRow:
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 1 << 30
    min_p: float = 0.0
    seed: int = 0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    min_new_tokens: int = 0


@dataclasses.dataclass
class SamplingBatch:
    temperatures: np.ndarray  # [B] f32
    top_ps: np.ndarray
    top_ks: np.ndarray
    min_ps: np.ndarray
    seeds: np.ndarray  # [B] u32
    frequency_penalties: np.ndarray
    presence_penalties: np.ndarray
    repetition_penalties: np.ndarray
    min_new_tokens: np.ndarray

    @classmethod
    def from_rows(cls, rows, pad_to: int) -> "SamplingBatch":
        n = len(rows)
        assert pad_to >= n

        def arr(get, dtype, pad):
            a = np.full(pad_to, pad, dtype)
            for i, r in enumerate(rows):
                a[i] = get(r)
            return a

        return cls(
            temperatures=arr(lambda r: r.temperature, np.float32, 0.0),
            top_ps=arr(lambda r: r.top_p, np.float32, 1.0),
            top_ks=arr(lambda r: r.top_k, np.int32, 1),
            min_ps=arr(lambda r: r.min_p, np.float32, 0.0),
            seeds=arr(lambda r: r.seed, np.uint32, 0),
            frequency_penalties=arr(lambda r: r.frequency_penalty, np.float32, 0.0),
            presence_penalties=arr(lambda r: r.presence_penalty, np.float32, 0.0),
            repetition_penalties=arr(lambda r: r.repetition_penalty, np.float32, 1.0),
            min_new_tokens=arr(lambda r: r.min_new_tokens, np.int32, 0),
        )
