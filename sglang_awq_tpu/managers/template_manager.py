"""Chat-template resolution + rendering.

Role model: reference `srt/managers/template_manager.py` (resolution
order: explicit `--chat-template` > tokenizer's built-in Jinja template >
model-path guess) with the named-template registry from
`lang/chat_template.py` as the fallback layer.

An explicit template may be:
* a registered NAME (`--chat-template llama-3-instruct`),
* a `.jinja` file — rendered with jinja2 directly (works with any
  tokenizer, including test stubs without `apply_chat_template`),
* a `.json` file in the reference's role-pair schema.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional, Tuple

from sglang_awq_tpu.lang.chat_template import (
    ChatTemplate,
    chat_template_from_json,
    chat_template_registry,
    match_chat_template,
)

logger = logging.getLogger(__name__)


class TemplateManager:
    def __init__(self, chat_template_arg: Optional[str], tokenizer,
                 model_path: str):
        self.tokenizer = tokenizer
        self.chat_template: Optional[ChatTemplate] = None  # named/json
        self.jinja_source: Optional[str] = None  # explicit .jinja override
        self.use_hf_template = False  # tokenizer's built-in template
        self.chat_template_name: Optional[str] = None

        if chat_template_arg:
            self._load_explicit(chat_template_arg)
        elif tokenizer is not None and getattr(
                tokenizer, "chat_template", None):
            self.use_hf_template = True
            self.chat_template_name = "hf"
        else:
            self.chat_template = match_chat_template(model_path)
            self.chat_template_name = self.chat_template.name
            logger.info("chat template guessed from model path: %s",
                        self.chat_template.name)

    def _load_explicit(self, arg: str) -> None:
        if arg in chat_template_registry:
            self.chat_template = chat_template_registry[arg]
            self.chat_template_name = arg
            return
        if not os.path.exists(arg):
            raise ValueError(
                f"--chat-template {arg!r}: not a registered template name "
                f"and no such file")
        if arg.endswith(".jinja"):
            with open(arg) as f:
                self.jinja_source = f.read()
            self.chat_template_name = os.path.basename(arg)
            return
        with open(arg) as f:
            spec = json.load(f)
        self.chat_template = chat_template_from_json(spec)
        self.chat_template_name = self.chat_template.name

    # ------------------------------------------------------------------

    def stop_strs(self) -> Tuple[str, ...]:
        return self.chat_template.stop_str if self.chat_template else ()

    def render_ids(self, messages: List[dict], tools=None,
                   add_generation_prompt: bool = True):
        """-> (input_ids, stop_strs).  Uses the tokenizer's own
        apply_chat_template only for its BUILT-IN template; explicit
        overrides render locally and encode."""
        tok = self.tokenizer
        if self.use_hf_template:
            try:
                ids = tok.apply_chat_template(
                    messages, tokenize=True, add_generation_prompt=True,
                    tools=tools if tools else None,
                )
            except TypeError:  # template without tools support
                ids = tok.apply_chat_template(
                    messages, tokenize=True, add_generation_prompt=True,
                )
            return list(ids), ()
        text, stops = self.render_text(
            messages, add_generation_prompt=add_generation_prompt)
        return tok.encode(text), stops

    def render_text(self, messages: List[dict],
                    add_generation_prompt: bool = True):
        """-> (prompt_text, stop_strs)."""
        if self.jinja_source is not None:
            import jinja2

            env = jinja2.Environment(keep_trailing_newline=True)
            env.globals["raise_exception"] = _jinja_raise
            text = env.from_string(self.jinja_source).render(
                messages=messages,
                add_generation_prompt=add_generation_prompt,
                bos_token="", eos_token="",
            )
            return text, ()
        t = self.chat_template or chat_template_registry["default"]
        return t.render(messages, add_generation_prompt), t.stop_str


def _jinja_raise(msg):
    raise ValueError(msg)
