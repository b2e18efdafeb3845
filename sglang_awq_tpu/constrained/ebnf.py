"""EBNF (GBNF-style) grammar -> regex, for the from-scratch DFA engine.

Role model: reference `constrained/xgrammar_backend.py:94-138` (EBNF via
xgrammar).  TPU-engine adaptation: non-recursive grammars compile to a
regex consumed by the existing regex->DFA->token-trie pipeline
(constrained/regex_engine.py); recursive rules raise (a pushdown matcher
is the later upgrade — the reference needs xgrammar's stack machine for
those too).

Syntax (llama.cpp GBNF subset):
    root  ::= "yes" | "no" | maybe
    maybe ::= "maybe" ws digit+
    ws    ::= [ \\t]
    digit ::= [0-9]
Literals "..." (with \\n \\t \\\\ escapes), character classes [a-z0-9_-],
grouping (...), alternation |, postfix * + ? and {m,n}, rule references.
`::=` or `=` bind a rule; the start rule is `root`.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<assign>::=|=)
  | (?P<literal>"(?:[^"\\]|\\.)*")
  | (?P<cls>\[(?:[^\]\\]|\\.)*\])
  | (?P<rep>\{\d+(?:,\d*)?\})
  | (?P<op>[|()*+?])
  | (?P<name>[A-Za-z_][A-Za-z0-9_-]*)
    """,
    re.X,
)


def _tokenize(src: str) -> List[Tuple[str, str]]:
    out = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ValueError(f"EBNF syntax error at {src[i:i+20]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    return out


def _unescape_literal(lit: str) -> str:
    body = lit[1:-1]
    return (
        body.replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")
        .replace('\\"', '"').replace("\\\\", "\\")
    )


class _Parser:
    """Recursive-descent over one rule body -> regex with {ref} holes."""

    def __init__(self, toks: List[Tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    def alt(self) -> str:
        parts = [self.seq()]
        while self.peek() == ("op", "|"):
            self.take()
            parts.append(self.seq())
        return "(" + "|".join(parts) + ")" if len(parts) > 1 else parts[0]

    def seq(self) -> str:
        out = []
        while True:
            kind, val = self.peek()
            if kind is None or (kind == "op" and val in ("|", ")")):
                break
            out.append(self.atom())
        return "".join(out)

    def atom(self) -> str:
        kind, val = self.take()
        if kind == "literal":
            base = re.escape(_unescape_literal(val))
            base = f"(?:{base})"
        elif kind == "cls":
            base = val  # regex classes are EBNF classes
        elif kind == "name":
            base = "\x00" + val + "\x01"  # ref hole
        elif kind == "op" and val == "(":
            base = "(" + self.alt() + ")"
            k, v = self.take()
            if (k, v) != ("op", ")"):
                raise ValueError("unbalanced ( in EBNF")
        else:
            raise ValueError(f"unexpected {val!r} in EBNF")
        k, v = self.peek()
        if k == "op" and v in ("*", "+", "?"):
            self.take()
            base = base + v
        elif k == "rep":
            self.take()
            base = base + v
        return base


def ebnf_to_regex(src: str, start: str = "root", max_depth: int = 64) -> str:
    """Compile an EBNF grammar to one regex (raises on recursion)."""
    rules: Dict[str, str] = {}
    toks = _tokenize(src)
    # split token stream into rules at `name (::=|=)` boundaries
    i = 0
    while i < len(toks):
        if toks[i][0] != "name" or i + 1 >= len(toks) or toks[i + 1][0] != "assign":
            raise ValueError(f"expected `name ::=` near {toks[i][1]!r}")
        name = toks[i][1]
        j = i + 2
        while j < len(toks):
            if (
                toks[j][0] == "name"
                and j + 1 < len(toks)
                and toks[j + 1][0] == "assign"
            ):
                break
            j += 1
        body = _Parser(toks[i + 2 : j]).alt()
        rules[name] = body
        i = j
    if start not in rules:
        raise ValueError(f"EBNF grammar has no {start!r} rule")

    def expand(name: str, stack: Tuple[str, ...]) -> str:
        if name in stack:
            raise ValueError(
                f"recursive EBNF rule {name!r} (cycle {' -> '.join(stack)}) — "
                f"recursion needs a pushdown matcher; bound it with "
                f"explicit repetition instead"
            )
        if len(stack) > max_depth:
            raise ValueError("EBNF expansion too deep")
        body = rules.get(name)
        if body is None:
            raise ValueError(f"undefined EBNF rule {name!r}")

        def sub(m):
            return "(?:" + expand(m.group(1), stack + (name,)) + ")"

        return re.sub("\x00([^\x01]+)\x01", sub, body)

    return expand(start, ())
