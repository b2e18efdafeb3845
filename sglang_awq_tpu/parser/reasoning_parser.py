"""Reasoning-content separation (<think> ... </think>).

Role model: reference `python/sglang/srt/parser/reasoning_parser.py`
(BaseReasoningFormatDetector + per-model registry).  Splits a model's
output into `reasoning_content` and `content` for the chat API, one-shot
and streaming.

Model formats:
  deepseek-r1 : response starts INSIDE reasoning (template appends
                <think>); `</think>` closes it
  qwen3       : reasoning only when the model emits `<think>` itself
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

_FORMATS = {
    # name -> (start tag, end tag, force_reasoning_at_start)
    "deepseek-r1": ("<think>", "</think>", True),
    "qwen3": ("<think>", "</think>", False),
    "glm45": ("<think>", "</think>", False),
}


@dataclasses.dataclass
class ReasoningParser:
    fmt: str = "deepseek-r1"

    def __post_init__(self):
        if self.fmt not in _FORMATS:
            raise ValueError(
                f"unknown reasoning format {self.fmt!r}; known: {sorted(_FORMATS)}"
            )
        self.start_tag, self.end_tag, self.force = _FORMATS[self.fmt]
        # streaming state
        self._in_reasoning = self.force
        self._buffer = ""
        self._seen_start = False

    # ------------------------------------------------------------------

    def parse(self, text: str) -> Tuple[Optional[str], str]:
        """One-shot -> (reasoning_content | None, content)."""
        in_reasoning = self.force or self.start_tag in text
        if not in_reasoning:
            return None, text
        t = text.replace(self.start_tag, "")
        if self.end_tag not in t:
            return t.strip() or None, ""  # truncated before </think>
        reasoning, _, rest = t.partition(self.end_tag)
        return reasoning.strip() or None, rest.strip()

    def parse_stream_chunk(self, delta: str) -> Tuple[str, str]:
        """Incremental -> (reasoning_delta, content_delta).

        Tag fragments at the buffer tail are held back until resolved."""
        self._buffer += delta
        out_r, out_c = [], []
        while self._buffer:
            if self._in_reasoning:
                idx = self._buffer.find(self.end_tag)
                if idx >= 0:
                    out_r.append(self._buffer[:idx])
                    self._buffer = self._buffer[idx + len(self.end_tag):]
                    self._in_reasoning = False
                    continue
                hold = _partial_tag_suffix(self._buffer, self.end_tag)
                emit = len(self._buffer) - hold
                out_r.append(self._buffer[:emit])
                self._buffer = self._buffer[emit:]
                break
            if not self._seen_start and not self.force:
                idx = self._buffer.find(self.start_tag)
                if idx >= 0:
                    out_c.append(self._buffer[:idx])
                    self._buffer = self._buffer[idx + len(self.start_tag):]
                    self._in_reasoning = True
                    self._seen_start = True
                    continue
                hold = _partial_tag_suffix(self._buffer, self.start_tag)
                emit = len(self._buffer) - hold
                out_c.append(self._buffer[:emit])
                self._buffer = self._buffer[emit:]
                break
            # normal content after reasoning closed (strip a stray start tag)
            chunk = self._buffer.replace(self.start_tag, "")
            out_c.append(chunk)
            self._buffer = ""
        return "".join(out_r), "".join(out_c)


def _partial_tag_suffix(text: str, tag: str) -> int:
    """Length of the longest strict tag-prefix ending the text."""
    for k in range(min(len(tag) - 1, len(text)), 0, -1):
        if text.endswith(tag[:k]):
            return k
    return 0
