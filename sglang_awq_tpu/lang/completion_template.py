"""Code-completion (fill-in-middle) templates.

Role model: reference `srt/parser/code_completion_parser.py`
(CompletionTemplate registry + `generate_completion_prompt`) — the
`/v1/completions` `suffix` field builds a FIM prompt from the model's
published sentinel tokens; selected with `--completion-template`.

Two sentinel orders exist in the wild:
* "middle": begin + prompt + middle + suffix + end   (deepseek-coder)
* "end":    begin + prompt + end + suffix + middle   (starcoder, qwen)
"""

from __future__ import annotations

import dataclasses
from typing import Dict


@dataclasses.dataclass(frozen=True)
class CompletionTemplate:
    name: str
    fim_begin: str
    fim_middle: str
    fim_end: str
    middle_position: str = "middle"  # "middle" | "end"

    def render(self, prompt: str, suffix: str) -> str:
        if self.middle_position == "middle":
            return (f"{self.fim_begin}{prompt}{self.fim_middle}"
                    f"{suffix}{self.fim_end}")
        return (f"{self.fim_begin}{prompt}{self.fim_end}"
                f"{suffix}{self.fim_middle}")


completion_template_registry: Dict[str, CompletionTemplate] = {}


def register_completion_template(t: CompletionTemplate) -> None:
    completion_template_registry[t.name] = t


register_completion_template(CompletionTemplate(
    name="deepseek_coder",
    fim_begin="<｜fim▁begin｜>", fim_middle="<｜fim▁hole｜>",
    fim_end="<｜fim▁end｜>", middle_position="middle",
))
register_completion_template(CompletionTemplate(
    name="star_coder",
    fim_begin="<fim_prefix>", fim_middle="<fim_middle>",
    fim_end="<fim_suffix>", middle_position="end",
))
register_completion_template(CompletionTemplate(
    name="qwen_coder",
    fim_begin="<|fim_prefix|>", fim_middle="<|fim_middle|>",
    fim_end="<|fim_suffix|>", middle_position="end",
))
register_completion_template(CompletionTemplate(
    name="codellama",
    fim_begin="<PRE> ", fim_middle=" <MID>",
    fim_end=" <SUF>", middle_position="end",
))
