"""Request sampling parameters.

Role model: reference `python/sglang/srt/sampling/sampling_params.py:26`
(the full public surface listed in SURVEY.md §A.7).  Validation semantics
match: temperature>=0, 0<top_p<=1, top_k -1 or >=1, etc.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Union

TOP_K_ALL = 1 << 30


@dataclasses.dataclass
class SamplingParams:
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    min_p: float = 0.0
    top_k: int = -1
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    seed: Optional[int] = None
    logit_bias: Optional[Dict[int, float]] = None
    # structured output (wired to the grammar backend)
    json_schema: Optional[str] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    # xgrammar-style structural tags: free text with trigger-forced
    # tagged structures (JSON string or dict; constrained/structural_tag.py)
    structural_tag: Optional[Any] = None
    # logprobs
    return_logprob: bool = False
    top_logprobs_num: int = 0
    # >= 0: also return input (prompt) token logprobs from this prompt
    # index on (reference logprob_start_len; OpenAI completions echo)
    logprob_start_len: int = -1
    # LoRA adapter name for this request (must be registered at the server)
    lora_path: Optional[str] = None
    n: int = 1

    def __post_init__(self):
        self.verify()
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        self.stop = self.stop or []
        self.stop_token_ids = set(self.stop_token_ids or [])
        if self.top_k == -1:
            self.top_k = TOP_K_ALL

    def verify(self):
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if self.top_k < -1 or self.top_k == 0:
            raise ValueError(f"top_k must be -1 (all) or >= 1, got {self.top_k}")
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")
        if not 0.0 < self.repetition_penalty <= 2.0:
            raise ValueError("repetition_penalty must be in (0, 2]")
        if self.n < 1:
            raise ValueError("n must be >= 1")

    @property
    def is_greedy(self) -> bool:
        return self.temperature < 1e-5

    @property
    def has_logit_bias(self) -> bool:
        return bool(self.logit_bias)

    @property
    def has_penalties(self) -> bool:
        return (
            self.frequency_penalty != 0.0
            or self.presence_penalty != 0.0
            or self.repetition_penalty != 1.0
        )

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SamplingParams":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields and v is not None})
