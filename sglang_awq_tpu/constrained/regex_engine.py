"""Regex subset -> byte-level DFA (from scratch; no external grammar libs).

Supported syntax: literals, escapes (\\d \\w \\s \\n \\t \\r and escaped
metachars), `.`, character classes `[a-z0-9_]` / negated `[^...]`, groups
`(...)` (non-capturing), alternation `|`, quantifiers `* + ? {m} {m,} {m,n}`.
Non-ASCII literals are matched as their UTF-8 byte sequences.

Pipeline: parse -> AST -> Thompson NFA -> subset-construction DFA over byte
alphabet (transitions stored per state as a 256-entry table).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Set, Tuple

BYTE = 256


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


class Node:
    pass


class Lit(Node):  # byte set (single position)
    def __init__(self, bytes_set: Set[int]):
        self.bytes = bytes_set


class Seq(Node):
    def __init__(self, parts: List[Node]):
        self.parts = parts


class Alt(Node):
    def __init__(self, options: List[Node]):
        self.options = options


class Repeat(Node):
    def __init__(self, node: Node, lo: int, hi: Optional[int]):
        self.node = node
        self.lo = lo
        self.hi = hi  # None = unbounded


DIGITS = set(range(ord("0"), ord("9") + 1))
WORD = (
    DIGITS
    | set(range(ord("a"), ord("z") + 1))
    | set(range(ord("A"), ord("Z") + 1))
    | {ord("_")}
)
SPACE = {ord(" "), ord("\t"), ord("\n"), ord("\r"), 0x0B, 0x0C}
ANY = set(range(BYTE)) - {ord("\n")}

ESCAPES = {
    "d": DIGITS,
    "D": set(range(BYTE)) - DIGITS,
    "w": WORD,
    "W": set(range(BYTE)) - WORD,
    "s": SPACE,
    "S": set(range(BYTE)) - SPACE,
    "n": {ord("\n")},
    "t": {ord("\t")},
    "r": {ord("\r")},
}


class RegexParser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def error(self, msg):
        raise ValueError(f"regex error at {self.i} in {self.p!r}: {msg}")

    def peek(self) -> Optional[str]:
        return self.p[self.i] if self.i < len(self.p) else None

    def next(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self) -> Node:
        node = self.parse_alt()
        if self.i != len(self.p):
            self.error("unexpected trailing input")
        return node

    def parse_alt(self) -> Node:
        opts = [self.parse_seq()]
        while self.peek() == "|":
            self.next()
            opts.append(self.parse_seq())
        return opts[0] if len(opts) == 1 else Alt(opts)

    def parse_seq(self) -> Node:
        parts: List[Node] = []
        while self.peek() is not None and self.peek() not in "|)":
            parts.append(self.parse_repeat())
        return Seq(parts)

    def parse_repeat(self) -> Node:
        atom = self.parse_atom()
        while True:
            c = self.peek()
            if c == "*":
                self.next()
                atom = Repeat(atom, 0, None)
            elif c == "+":
                self.next()
                atom = Repeat(atom, 1, None)
            elif c == "?":
                self.next()
                atom = Repeat(atom, 0, 1)
            elif c == "{":
                save = self.i
                self.next()
                num = ""
                while self.peek() and self.peek().isdigit():
                    num += self.next()
                if not num:
                    self.i = save
                    break
                lo = int(num)
                hi: Optional[int] = lo
                if self.peek() == ",":
                    self.next()
                    num2 = ""
                    while self.peek() and self.peek().isdigit():
                        num2 += self.next()
                    hi = int(num2) if num2 else None
                if self.peek() != "}":
                    self.error("expected }")
                self.next()
                atom = Repeat(atom, lo, hi)
            else:
                break
        return atom

    def parse_atom(self) -> Node:
        c = self.peek()
        if c is None:
            self.error("unexpected end")
        if c == "(":
            self.next()
            if self.peek() == "?":  # (?: ...) non-capturing marker
                self.next()
                if self.peek() == ":":
                    self.next()
                else:
                    self.error("only (?: groups supported")
            inner = self.parse_alt()
            if self.peek() != ")":
                self.error("expected )")
            self.next()
            return inner
        if c == "[":
            return self.parse_class()
        if c == ".":
            self.next()
            return Lit(set(ANY))
        if c == "\\":
            self.next()
            e = self.next()
            if e in ESCAPES:
                return Lit(set(ESCAPES[e]))
            if e == "x":
                h = self.next() + self.next()
                return Lit({int(h, 16)})
            return self._lit_char(e)
        if c in "*+?{":
            self.error(f"dangling quantifier {c!r}")
        self.next()
        return self._lit_char(c)

    def _lit_char(self, ch: str) -> Node:
        bs = ch.encode("utf-8")
        if len(bs) == 1:
            return Lit({bs[0]})
        return Seq([Lit({b}) for b in bs])

    def parse_class(self) -> Node:
        assert self.next() == "["
        negate = False
        if self.peek() == "^":
            negate = True
            self.next()
        chars: Set[int] = set()
        first = True
        while True:
            c = self.peek()
            if c is None:
                self.error("unterminated class")
            if c == "]" and not first:
                self.next()
                break
            first = False
            if c == "\\":
                self.next()
                e = self.next()
                if e in ESCAPES:
                    chars |= ESCAPES[e]
                    continue
                if e == "x":
                    lo_b = int(self.next() + self.next(), 16)
                else:
                    lo_b = ord(e)
            else:
                lo_b = ord(self.next())
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.next()
                hi_ch = self.next()
                if hi_ch == "\\":
                    hi_ch = self.next()
                    if hi_ch == "x":
                        hi_b = int(self.next() + self.next(), 16)
                    else:
                        hi_b = ord(hi_ch)
                else:
                    hi_b = ord(hi_ch)
                chars |= set(range(lo_b, hi_b + 1))
            else:
                if lo_b > 255:
                    self.error("non-ascii in class unsupported")
                chars.add(lo_b)
        if negate:
            chars = set(range(BYTE)) - chars
        return Lit(chars)


# ---------------------------------------------------------------------------
# Thompson NFA
# ---------------------------------------------------------------------------


class NFA:
    def __init__(self):
        self.eps: List[List[int]] = []  # state -> eps targets
        self.trans: List[List[Tuple[FrozenSet[int], int]]] = []  # (byteset, target)

    def new_state(self) -> int:
        self.eps.append([])
        self.trans.append([])
        return len(self.eps) - 1


def build_nfa(node: Node) -> Tuple[NFA, int, int]:
    nfa = NFA()

    def build(n: Node) -> Tuple[int, int]:
        if isinstance(n, Lit):
            s, e = nfa.new_state(), nfa.new_state()
            nfa.trans[s].append((frozenset(n.bytes), e))
            return s, e
        if isinstance(n, Seq):
            if not n.parts:
                s = nfa.new_state()
                return s, s
            s, e = build(n.parts[0])
            for p in n.parts[1:]:
                s2, e2 = build(p)
                nfa.eps[e].append(s2)
                e = e2
            return s, e
        if isinstance(n, Alt):
            s, e = nfa.new_state(), nfa.new_state()
            for opt in n.options:
                so, eo = build(opt)
                nfa.eps[s].append(so)
                nfa.eps[eo].append(e)
            return s, e
        if isinstance(n, Repeat):
            lo, hi = n.lo, n.hi
            if hi == 1 and lo == 0:  # optional
                s, e = nfa.new_state(), nfa.new_state()
                si, ei = build(n.node)
                nfa.eps[s].extend([si, e])
                nfa.eps[ei].append(e)
                return s, e
            assert hi is None, "bounded repeats are rewritten before NFA build"
            # lo mandatory copies then a star
            s = e = None
            for _ in range(lo):
                s2, e2 = build(n.node)
                if s is None:
                    s, e = s2, e2
                else:
                    nfa.eps[e].append(s2)
                    e = e2
            ss, se = build(n.node)
            star_s, star_e = nfa.new_state(), nfa.new_state()
            nfa.eps[star_s].extend([ss, star_e])
            nfa.eps[se].extend([ss, star_e])
            if s is None:
                return star_s, star_e
            nfa.eps[e].append(star_s)
            return s, star_e
        raise TypeError(n)

    start, end = build(node)
    return nfa, start, end


# ---------------------------------------------------------------------------
# DFA
# ---------------------------------------------------------------------------


class DFA:
    """table[state] is a 256-long tuple of next-state ids (-1 = reject);
    accept[state] bool.  State 0 is the start."""

    def __init__(self, table: List[List[int]], accept: List[bool]):
        self.table = table
        self.accept = accept

    @property
    def num_states(self) -> int:
        return len(self.table)

    def step(self, state: int, byte: int) -> int:
        if state < 0:
            return -1
        return self.table[state][byte]

    def matches(self, data: bytes) -> bool:
        st = 0
        for b in data:
            st = self.step(st, b)
            if st < 0:
                return False
        return self.accept[st]


def compile_regex(pattern: str) -> DFA:
    node = RegexParser(pattern).parse()
    node = _rewrite_bounded(node)
    nfa, start, end = build_nfa(node)

    def eps_closure(states: Set[int]) -> FrozenSet[int]:
        stack = list(states)
        seen = set(states)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    start_set = eps_closure({start})
    dfa_ids: Dict[FrozenSet[int], int] = {start_set: 0}
    table: List[List[int]] = []
    accept: List[bool] = []
    work = [start_set]
    while work:
        cur = work.pop()
        sid = dfa_ids[cur]
        while len(table) <= sid:
            table.append([-1] * BYTE)
            accept.append(False)
        accept[sid] = end in cur
        # group outgoing transitions by byte
        per_byte: Dict[int, Set[int]] = {}
        for s in cur:
            for byteset, tgt in nfa.trans[s]:
                for b in byteset:
                    per_byte.setdefault(b, set()).add(tgt)
        for b, tgts in per_byte.items():
            nxt = eps_closure(tgts)
            nid = dfa_ids.get(nxt)
            if nid is None:
                nid = len(dfa_ids)
                dfa_ids[nxt] = nid
                work.append(nxt)
            table[sid][b] = nid
    return DFA(table, accept)


def _rewrite_bounded(node: Node) -> Node:
    """Expand {m,n} into sequence + nested optionals (keeps NFA builder simple)."""
    if isinstance(node, Lit):
        return node
    if isinstance(node, Seq):
        return Seq([_rewrite_bounded(p) for p in node.parts])
    if isinstance(node, Alt):
        return Alt([_rewrite_bounded(o) for o in node.options])
    if isinstance(node, Repeat):
        inner = _rewrite_bounded(node.node)
        lo, hi = node.lo, node.hi
        if hi is None:
            return Repeat(inner, lo, None)
        # a{lo,hi} = a^lo (a (a (...)?)?)?  with hi-lo optionals
        parts: List[Node] = [inner] * lo
        tail: Optional[Node] = None
        for _ in range(hi - lo):
            tail = Repeat(Seq([inner] + ([tail] if tail else [])), 0, 1)
        if tail:
            parts.append(tail)
        return Seq(parts)
    raise TypeError(node)
