"""Constrained (structured-output) decoding.

Role model: reference `python/sglang/srt/constrained/` (xgrammar/outlines
backends computing vocab bitmasks — `xgrammar_backend.py:94-117`).  Neither
xgrammar nor outlines exists in this environment, so the engine is built
from scratch:

  regex_engine.py    regex subset -> NFA -> byte-level DFA
  json_schema.py     JSON schema subset -> regex (outlines-style)
  grammar_backend.py DFA x tokenizer -> per-state vocab masks (token trie)
"""

from sglang_awq_tpu.constrained.grammar_backend import (
    GrammarMatcher,
    compile_grammar,
)

__all__ = ["GrammarMatcher", "compile_grammar"]
