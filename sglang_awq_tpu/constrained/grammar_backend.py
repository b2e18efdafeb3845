"""DFA x tokenizer -> per-state vocab masks.

Role model: reference `BaseGrammarObject` + xgrammar's
`fill_next_token_bitmask` (`constrained/xgrammar_backend.py:94-117`): each
decode step masks the vocab to tokens whose byte expansion keeps the DFA
alive; EOS is allowed iff the DFA is in an accepting state.

Mechanics: the tokenizer's vocab is indexed ONCE into a byte trie; per DFA
state the trie is walked (pruned at dead transitions) to produce a boolean
mask [V] plus token -> next-state transitions, cached per state.
"""

from __future__ import annotations

import logging
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_awq_tpu.constrained.json_schema import schema_to_regex
from sglang_awq_tpu.constrained.regex_engine import DFA, compile_regex

logger = logging.getLogger(__name__)


class TokenTrie:
    """Byte trie over the vocabulary (built once per tokenizer)."""

    def __init__(self, vocab_bytes: List[Optional[bytes]]):
        self.vocab_size = len(vocab_bytes)
        # nodes as dicts: byte -> child idx; token_ids ending at each node
        self.children: List[Dict[int, int]] = [{}]
        self.tokens_at: List[List[int]] = [[]]
        for tid, bs in enumerate(vocab_bytes):
            if not bs:
                continue
            node = 0
            for b in bs:
                nxt = self.children[node].get(b)
                if nxt is None:
                    nxt = len(self.children)
                    self.children[node][b] = nxt
                    self.children.append({})
                    self.tokens_at.append([])
                node = nxt
            self.tokens_at[node].append(tid)


_TRIE_CACHE: Dict[int, TokenTrie] = {}
_TRIE_LOCK = threading.Lock()


def _vocab_bytes(tokenizer, vocab_size: int) -> List[Optional[bytes]]:
    out: List[Optional[bytes]] = [None] * vocab_size
    # Fast path: HF fast tokenizers can decode each id; measure byte content
    # as the decoded text of [id] (approximation good enough for masks —
    # merges/specials yield None and stay maskable only via EOS).
    for tid in range(vocab_size):
        try:
            text = tokenizer.decode([tid], skip_special_tokens=False)
        except Exception:
            continue
        if text:
            out[tid] = text.encode("utf-8")
    return out


def token_trie_for(tokenizer, vocab_size: int) -> TokenTrie:
    key = id(tokenizer)
    with _TRIE_LOCK:
        t = _TRIE_CACHE.get(key)
        if t is None:
            t = TokenTrie(_vocab_bytes(tokenizer, vocab_size))
            _TRIE_CACHE[key] = t
    return t


class CompiledGrammar:
    """DFA + trie + per-state (mask, transitions) cache; shared across
    requests with the same grammar."""

    def __init__(self, dfa: DFA, trie: TokenTrie, eos_token_ids):
        self.dfa = dfa
        self.trie = trie
        self.eos_token_ids = list(eos_token_ids)
        self._cache: Dict[int, Tuple[np.ndarray, Dict[int, int]]] = {}
        self._lock = threading.Lock()

    def state_info(self, state: int) -> Tuple[np.ndarray, Dict[int, int]]:
        with self._lock:
            hit = self._cache.get(state)
        if hit is not None:
            return hit
        mask = np.zeros(self.trie.vocab_size, dtype=bool)
        trans: Dict[int, int] = {}
        # iterative DFS over (trie node, dfa state)
        stack = [(0, state)]
        while stack:
            node, st = stack.pop()
            for tid in self.trie.tokens_at[node]:
                mask[tid] = True
                trans[tid] = st
            for b, child in self.trie.children[node].items():
                nxt = self.dfa.step(st, b)
                if nxt >= 0:
                    stack.append((child, nxt))
        if self.dfa.accept[state]:
            for e in self.eos_token_ids:
                if e < len(mask):
                    mask[e] = True
        with self._lock:
            self._cache[state] = (mask, trans)
        return mask, trans


class GrammarMatcher:
    """Per-request grammar state (reference BaseGrammarObject role)."""

    def __init__(self, compiled: CompiledGrammar):
        self.compiled = compiled
        self.state = 0
        self.finished = False

    def vocab_mask(self) -> np.ndarray:
        mask, _ = self.compiled.state_info(self.state)
        return mask

    def accept_token(self, token_id: int) -> bool:
        if token_id in self.compiled.eos_token_ids:
            self.finished = True
            return self.compiled.dfa.accept[self.state]
        _, trans = self.compiled.state_info(self.state)
        nxt = trans.get(token_id)
        if nxt is None:
            return False
        self.state = nxt
        return True

    def is_terminated(self) -> bool:
        """No continuation possible except EOS."""
        mask, _ = self.compiled.state_info(self.state)
        non_eos = mask.copy()
        for e in self.compiled.eos_token_ids:
            if e < len(non_eos):
                non_eos[e] = False
        return not non_eos.any()

    def jump_forward_bytes(self, limit: int = 4096) -> bytes:
        """The FORCED continuation: bytes the grammar admits exactly one
        way (reference xgrammar find_jump_forward_string).  Stops at any
        accepting state (EOS becomes an option) or branching state."""
        dfa = self.compiled.dfa
        st = self.state
        out = bytearray()
        while len(out) < limit and not dfa.accept[st]:
            row = dfa.table[st]
            nxt = None
            for b in range(256):
                if row[b] >= 0:
                    if nxt is not None:
                        nxt = None
                        break
                    nxt = (b, row[b])
            if nxt is None:
                break
            out.append(nxt[0])
            st = nxt[1]
        return bytes(out)

    def jump_forward_tokens(self) -> list:
        """Greedy longest-match tokenization of the forced bytes over the
        vocab trie (any tokenization of the exact byte string stays on the
        forced DFA path, so each returned token is grammar-legal).  A tail
        that completes no token is left for normal masked decoding."""
        data = self.jump_forward_bytes()
        if not data:
            return []
        trie = self.compiled.trie
        toks = []
        i = 0
        while i < len(data):
            node = 0
            j = i
            last = None
            while j < len(data):
                node = trie.children[node].get(data[j])
                if node is None:
                    break
                j += 1
                if trie.tokens_at[node]:
                    last = (trie.tokens_at[node][0], j)
            if last is None:
                break
            toks.append(last[0])
            i = last[1]
        return toks


_GRAMMAR_CACHE: Dict[Tuple[int, str, str], CompiledGrammar] = {}
_GRAMMAR_LOCK = threading.Lock()


def compile_grammar(
    kind: str,  # "regex" | "json_schema" | "json"
    spec: str,
    tokenizer,
    vocab_size: int,
    eos_token_ids,
) -> CompiledGrammar:
    import json as _json

    if not isinstance(spec, str):
        spec = _json.dumps(spec, sort_keys=True)
    key = (id(tokenizer), kind, spec)
    with _GRAMMAR_LOCK:
        hit = _GRAMMAR_CACHE.get(key)
    if hit is not None:
        return hit
    if kind == "structural_tag":
        from sglang_awq_tpu.constrained.structural_tag import (
            compile_structural_tag,
        )

        dfa = compile_structural_tag(spec)
        trie = token_trie_for(tokenizer, vocab_size)
        compiled = CompiledGrammar(dfa, trie, eos_token_ids)
        with _GRAMMAR_LOCK:
            _GRAMMAR_CACHE[key] = compiled
        return compiled
    if kind == "regex":
        pattern = spec
    elif kind in ("json_schema", "json"):
        import json as _json

        schema = _json.loads(spec) if isinstance(spec, str) else spec
        pattern = schema_to_regex(schema)
    elif kind == "ebnf":
        from sglang_awq_tpu.constrained.ebnf import ebnf_to_regex

        pattern = ebnf_to_regex(spec)
    else:
        raise ValueError(f"unsupported grammar kind {kind!r}")
    dfa = compile_regex(pattern)
    trie = token_trie_for(tokenizer, vocab_size)
    compiled = CompiledGrammar(dfa, trie, eos_token_ids)
    with _GRAMMAR_LOCK:
        _GRAMMAR_CACHE[key] = compiled
    return compiled
