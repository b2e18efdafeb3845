"""Incremental detokenization with stop-string trimming.

Role model: reference `DetokenizerManager`
(`python/sglang/srt/managers/detokenizer_manager.py:59,113` — `DecodeStatus`
offsets + `trim_matched_stop:121`).  Runs in-process (no subprocess/ZMQ —
SURVEY.md §2.6 collapse).
"""

from __future__ import annotations

from typing import List, Optional, Tuple


class IncrementalDetokenizer:
    """Per-request streaming decode state (reference DecodeStatus)."""

    def __init__(self, tokenizer, skip_special_tokens: bool = True):
        self.tokenizer = tokenizer
        self.skip_special_tokens = skip_special_tokens
        self.ids: List[int] = []
        self.prefix_offset = 0  # start of the last fully-decoded window
        self.read_offset = 0  # end of text already emitted
        self.text = ""

    def append(self, new_ids: List[int]) -> str:
        """Feed tokens; returns newly-finalized text (may be '')."""
        if self.tokenizer is None:
            self.ids.extend(new_ids)
            return "".join(f"<{t}>" for t in new_ids)
        self.ids.extend(new_ids)
        prefix_text = self.tokenizer.decode(
            self.ids[self.prefix_offset : self.read_offset],
            skip_special_tokens=self.skip_special_tokens,
        )
        full_text = self.tokenizer.decode(
            self.ids[self.prefix_offset :],
            skip_special_tokens=self.skip_special_tokens,
        )
        if len(full_text) > len(prefix_text) and not full_text.endswith("�"):
            new_text = full_text[len(prefix_text) :]
            self.prefix_offset = self.read_offset
            self.read_offset = len(self.ids)
            self.text += new_text
            return new_text
        return ""

    def flush(self) -> str:
        """Finalize any held-back text (end of stream)."""
        if self.tokenizer is None or self.read_offset >= len(self.ids):
            return ""
        prefix_text = self.tokenizer.decode(
            self.ids[self.prefix_offset : self.read_offset],
            skip_special_tokens=self.skip_special_tokens,
        )
        full_text = self.tokenizer.decode(
            self.ids[self.prefix_offset :],
            skip_special_tokens=self.skip_special_tokens,
        )
        new_text = full_text[len(prefix_text) :].replace("�", "")
        self.read_offset = len(self.ids)
        self.text += new_text
        return new_text


def find_stop_string(text: str, stops: List[str]) -> Optional[Tuple[int, str]]:
    """Earliest stop-string hit -> (position, matched); None otherwise."""
    best = None
    for s in stops:
        if not s:
            continue
        pos = text.find(s)
        if pos != -1 and (best is None or pos < best[0]):
            best = (pos, s)
    return best


def partial_stop_suffix_len(text: str, stops: List[str]) -> int:
    """Length of a trailing substring that could grow into a stop string —
    held back from streaming (reference trim semantics)."""
    longest = 0
    for s in stops:
        for k in range(1, len(s)):
            if text.endswith(s[:k]):
                longest = max(longest, k)
    return longest
