"""Structural-tag constrained decoding.

Reference role: xgrammar structural tags
(`constrained/xgrammar_backend.py:94-138` compiles
`{"type": "structural_tag", "structures": [{begin, schema, end}, ...],
"triggers": [...]}` from `sampling_params.structural_tag`): generation is
FREE TEXT until one of the trigger strings appears; a completed trigger
forces one of the structures whose `begin` starts with it — the remainder
of `begin`, then schema-constrained JSON, then the `end` string — after
which generation returns to free text.  Used for model-native function
calling where tool calls are wrapped in tags.

Implementation: a lazily-determinized product automaton exposed through
the same `DFA` interface the grammar backend consumes (`step`,
`table[st]`, `accept[st]`), so `CompiledGrammar`/`GrammarMatcher`
(vocab-trie masks, jump-forward) work unchanged:

  NFA atoms:  F(ac)   free text at Aho-Corasick trigger-trie node `ac`
              B(i,j)  j bytes into structure i's begin (past its trigger)
              S(i,q)  inside structure i's schema DFA at state q
              E(i,k)  k bytes into structure i's end
  Subsets of atoms are determinized on demand and cached; free-text
  states accept (generation may stop outside a structure).
"""

from __future__ import annotations

import json
from typing import Dict, FrozenSet, List, Tuple

from sglang_awq_tpu.constrained.json_schema import schema_to_regex
from sglang_awq_tpu.constrained.regex_engine import DFA, compile_regex


class _AhoCorasick:
    """Trigger trie with failure links; δ(node, byte) total function."""

    def __init__(self, patterns: List[bytes]):
        self.goto: List[Dict[int, int]] = [{}]
        self.fail: List[int] = [0]
        self.out: List[List[int]] = [[]]  # pattern indices ending here
        for pi, pat in enumerate(patterns):
            node = 0
            for b in pat:
                nxt = self.goto[node].get(b)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][b] = nxt
                node = nxt
            self.out[node].append(pi)
        # BFS failure links
        from collections import deque

        q = deque()
        for b, n in self.goto[0].items():
            self.fail[n] = 0
            q.append(n)
        while q:
            r = q.popleft()
            for b, n in self.goto[r].items():
                q.append(n)
                f = self.fail[r]
                while f and b not in self.goto[f]:
                    f = self.fail[f]
                self.fail[n] = self.goto[f].get(b, 0) if self.goto[f].get(b, 0) != n else 0
                self.out[n] = self.out[n] + self.out[self.fail[n]]

    def step(self, node: int, b: int) -> int:
        while node and b not in self.goto[node]:
            node = self.fail[node]
        return self.goto[node].get(b, 0)


Atom = Tuple  # ("F", ac) | ("B", i, j) | ("S", i, q) | ("E", i, k)


class StructuralTagDFA:
    """Lazy deterministic product automaton with the regex DFA interface."""

    def __init__(self, spec: dict):
        structures = spec.get("structures") or []
        triggers = [t for t in (spec.get("triggers") or []) if t]
        if not structures:
            raise ValueError("structural_tag needs at least one structure")
        if not triggers:
            # default: each begin is its own trigger
            triggers = [s["begin"] for s in structures]
        self.begins: List[bytes] = []
        self.ends: List[bytes] = []
        self.schemas: List[DFA] = []
        for s in structures:
            self.begins.append(s["begin"].encode())
            self.ends.append((s.get("end") or "").encode())
            schema = s.get("schema")
            pattern = schema_to_regex(schema) if schema is not None else ".*"
            self.schemas.append(compile_regex(pattern))
        self.trigger_bytes = [t.encode() for t in triggers]
        # structures reachable from trigger t: begin startswith trigger
        self.by_trigger: List[List[int]] = []
        for t in self.trigger_bytes:
            cand = [i for i, b in enumerate(self.begins) if b.startswith(t)]
            self.by_trigger.append(cand)
        if not any(self.by_trigger):
            raise ValueError("no structure's begin starts with any trigger")
        self.ac = _AhoCorasick(self.trigger_bytes)

        self._ids: Dict[FrozenSet[Atom], int] = {}
        self._subsets: List[FrozenSet[Atom]] = []
        self._rows: Dict[int, List[int]] = {}
        start = self._close(frozenset({("F", 0)}))
        self._id_of(start)  # state 0

    # -- subset machinery ------------------------------------------------

    def _close(self, atoms: FrozenSet[Atom]) -> FrozenSet[Atom]:
        out = set()
        stack = list(atoms)
        while stack:
            a = stack.pop()
            if a in out:
                continue
            kind = a[0]
            if kind == "B" and a[2] == len(self.begins[a[1]]):
                stack.append(("S", a[1], 0))
                continue
            if kind == "S" and self.schemas[a[1]].accept[a[2]]:
                out.add(a)
                stack.append(("E", a[1], 0))
                continue
            if kind == "E" and a[2] == len(self.ends[a[1]]):
                stack.append(("F", 0))
                continue
            out.add(a)
        return frozenset(out)

    def _id_of(self, subset: FrozenSet[Atom]) -> int:
        sid = self._ids.get(subset)
        if sid is None:
            sid = len(self._subsets)
            self._ids[subset] = sid
            self._subsets.append(subset)
        return sid

    def _atom_step(self, a: Atom, b: int) -> List[Atom]:
        kind = a[0]
        if kind == "F":
            ac2 = self.ac.step(a[1], b)
            outs = self.ac.out[ac2]
            if outs:
                nxt: List[Atom] = []
                for pi in outs:
                    t = self.trigger_bytes[pi]
                    for i in self.by_trigger[pi]:
                        nxt.append(("B", i, len(t)))
                return nxt  # trigger completion forces a structure
            return [("F", ac2)]
        if kind == "B":
            i, j = a[1], a[2]
            return [("B", i, j + 1)] if self.begins[i][j] == b else []
        if kind == "S":
            i, q = a[1], a[2]
            q2 = self.schemas[i].step(q, b)
            return [("S", i, q2)] if q2 >= 0 else []
        i, k = a[1], a[2]
        return [("E", i, k + 1)] if self.ends[i][k] == b else []

    def _row(self, sid: int) -> List[int]:
        row = self._rows.get(sid)
        if row is not None:
            return row
        subset = self._subsets[sid]
        row = []
        for b in range(256):
            nxt = set()
            for a in subset:
                nxt.update(self._atom_step(a, b))
            if not nxt:
                row.append(-1)
            else:
                row.append(self._id_of(self._close(frozenset(nxt))))
        self._rows[sid] = row
        return row

    # -- DFA interface ---------------------------------------------------

    @property
    def table(self):
        return _RowView(self)

    @property
    def accept(self):
        return _AcceptView(self)

    def step(self, state: int, byte: int) -> int:
        if state < 0:
            return -1
        return self._row(state)[byte]

    def _accepts(self, sid: int) -> bool:
        return any(a[0] == "F" for a in self._subsets[sid])


class _RowView:
    def __init__(self, dfa: StructuralTagDFA):
        self._d = dfa

    def __getitem__(self, sid: int):
        return self._d._row(sid)


class _AcceptView:
    def __init__(self, dfa: StructuralTagDFA):
        self._d = dfa

    def __getitem__(self, sid: int) -> bool:
        return self._d._accepts(sid)


def compile_structural_tag(spec) -> StructuralTagDFA:
    if isinstance(spec, str):
        spec = json.loads(spec)
    if spec.get("type") not in (None, "structural_tag"):
        raise ValueError(f"unsupported structural_tag type {spec.get('type')!r}")
    return StructuralTagDFA(spec)
