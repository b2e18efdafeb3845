"""Constrained decoding: regex + JSON-schema outputs must satisfy the
grammar (reference constrained/ backends, vocab-bitmask approach).
"""

import json
import re as _re

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.constrained.grammar_backend import GrammarMatcher, compile_grammar
from sglang_awq_tpu.constrained.json_schema import schema_to_regex
from sglang_awq_tpu.constrained.regex_engine import compile_regex
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, ByteTokenizer, tiny_hf_model_and_tensors


@pytest.mark.parametrize(
    "pattern,good,bad",
    [
        (r"abc", ["abc"], ["ab", "abcd"]),
        (r"a+b*", ["a", "aab", "abbb"], ["", "ba"]),
        (r"[0-9]{2,4}", ["12", "1234"], ["1", "12345"]),
        (r"(foo|bar)+", ["foo", "barfoo"], ["fo"]),
        (r"-?\d+(\.\d+)?", ["-3", "3.14"], ["3.", "-"]),
        (r"yes|no", ["yes", "no"], ["maybe"]),
    ],
)
def test_regex_engine(pattern, good, bad):
    dfa = compile_regex(pattern)
    for s in good:
        assert dfa.matches(s.encode()), (pattern, s)
    for s in bad:
        assert not dfa.matches(s.encode()), (pattern, s)


def test_schema_regex():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["name", "age", "tags"],
    }
    dfa = compile_regex(schema_to_regex(schema))
    assert dfa.matches(json.dumps({"name": "b", "age": 4, "tags": ["x", "y"]}).encode())
    assert not dfa.matches(b'{"name": "b"}')


def test_grammar_matcher_masks():
    tok = ByteTokenizer()
    compiled = compile_grammar("regex", r"ab+", tok, 512, {2})
    m = GrammarMatcher(compiled)
    mask = m.vocab_mask()
    a_id, b_id = ord("a") + 3, ord("b") + 3
    assert mask[a_id] and not mask[b_id]
    assert not mask[2]  # EOS not allowed before accept state
    assert m.accept_token(a_id)
    mask = m.vocab_mask()
    assert mask[b_id] and not mask[a_id]
    assert m.accept_token(b_id)
    assert m.vocab_mask()[2]  # accepting: EOS allowed


@pytest.fixture(scope="module")
def eng():
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=1024,
                    chunked_prefill_size=32)
    e = Engine(server_args=sa, model_config=mc, tensors=tensors,
               tokenizer=ByteTokenizer())
    yield e
    e.shutdown()


def test_engine_regex_constrained(eng):
    out = eng.generate(
        prompt="The answer is",
        sampling_params={
            "max_new_tokens": 12,
            "temperature": 0.0,
            "regex": r"(yes|no)!",
        },
    )
    assert out["text"] in ("yes!", "no!"), out["text"]
    assert out["meta_info"]["finish_reason"]["type"] == "stop"


def test_engine_json_constrained(eng):
    # finite value spaces: a random test model picks argmax tokens with no
    # preference for closing an unbounded integer before the budget runs out
    schema = json.dumps(
        {
            "type": "object",
            "properties": {
                "ok": {"type": "boolean"},
                "kind": {"enum": ["a", "b"]},
            },
            "required": ["ok", "kind"],
        }
    )
    out = eng.generate(
        prompt="give json",
        sampling_params={
            "max_new_tokens": 48,
            "temperature": 0.0,
            "json_schema": schema,
        },
    )
    doc = json.loads(out["text"])
    assert isinstance(doc["ok"], bool) and doc["kind"] in ("a", "b")


def test_engine_regex_with_sampling(eng):
    out = eng.generate(
        prompt="pick",
        sampling_params={
            "max_new_tokens": 8,
            "temperature": 1.0,
            "seed": 7,
            "regex": r"[abc]{3}",
        },
    )
    assert _re.fullmatch(r"[abc]{3}", out["text"]), out["text"]


# ---------------------------------------------------------------------------
# EBNF
# ---------------------------------------------------------------------------


def test_ebnf_to_regex_basics():
    from sglang_awq_tpu.constrained.ebnf import ebnf_to_regex

    g = '''
    root  ::= answer ("," ws answer){0,2}
    answer ::= "yes" | "no" | maybe
    maybe ::= "maybe" ws digit+
    ws    ::= [ \\t]
    digit ::= [0-9]
    '''
    rx = ebnf_to_regex(g)
    assert _re.fullmatch(rx, "yes")
    assert _re.fullmatch(rx, "maybe 42")
    assert _re.fullmatch(rx, "yes, no")
    assert not _re.fullmatch(rx, "dunno")


def test_ebnf_rejects_recursion():
    from sglang_awq_tpu.constrained.ebnf import ebnf_to_regex

    with pytest.raises(ValueError, match="recursive"):
        ebnf_to_regex('root ::= "a" root | "b"')


def test_engine_ebnf_constrained(eng):
    out = eng.generate(
        prompt="choose",
        sampling_params={
            "max_new_tokens": 16,
            "temperature": 0.0,
            "ebnf": 'root ::= "left" | "right" | "straight"',
        },
    )
    assert out["text"] in ("left", "right", "straight"), out["text"]


def test_jump_forward_matcher_unit():
    """Forced-continuation extraction + trie retokenization."""
    from sglang_awq_tpu.constrained.grammar_backend import (
        GrammarMatcher,
        compile_grammar,
    )
    from .utils import ByteTokenizer

    tok = ByteTokenizer()
    g = compile_grammar(
        "regex", r'\{"answer": (yes|no)\}', tok, 512, {2}
    )
    m = GrammarMatcher(g)
    forced = m.jump_forward_bytes()
    assert forced == b'{"answer": '
    toks = m.jump_forward_tokens()
    assert toks  # byte tokenizer: one token per byte
    for t in toks:
        assert m.accept_token(t)
    # after the fork point there is no forced continuation
    assert m.jump_forward_bytes() == b""


def test_engine_jump_forward_same_string_fewer_steps(eng):
    schema = json.dumps(
        {
            "type": "object",
            "properties": {
                "first_field_name": {"enum": ["aa", "bb"]},
                "second_field_name": {"type": "boolean"},
            },
            "required": ["first_field_name", "second_field_name"],
        }
    )
    sp = {"max_new_tokens": 80, "temperature": 0.0, "json_schema": schema}
    c0 = eng.runner.decode_steps_counter
    out_jf = eng.generate(prompt="emit json", sampling_params=dict(sp))
    steps_jf = eng.runner.decode_steps_counter - c0

    eng.server_args.disable_jump_forward = True
    try:
        c0 = eng.runner.decode_steps_counter
        out_plain = eng.generate(prompt="emit json v2",
                                 sampling_params=dict(sp))
        steps_plain = eng.runner.decode_steps_counter - c0
    finally:
        eng.server_args.disable_jump_forward = False

    doc = json.loads(out_jf["text"])
    assert doc["first_field_name"] in ("aa", "bb")
    assert isinstance(doc["second_field_name"], bool)
    # same grammar-forced skeleton -> same string shape; far fewer steps
    assert json.loads(out_plain["text"]).keys() == doc.keys()
    assert steps_jf < steps_plain * 0.7, (steps_jf, steps_plain)


# ---------------------------------------------------------------------------
# structural tags (reference xgrammar structural_tag,
# constrained/xgrammar_backend.py:94-138)
# ---------------------------------------------------------------------------


def test_structural_tag_dfa_semantics():
    from sglang_awq_tpu.constrained.structural_tag import compile_structural_tag

    spec = {
        "type": "structural_tag",
        "structures": [
            {
                "begin": "<f=a>",
                "schema": {"type": "object",
                           "properties": {"x": {"enum": ["1", "2"]}},
                           "required": ["x"]},
                "end": "</f>",
            }
        ],
        "triggers": ["<f="],
    }
    dfa = compile_structural_tag(spec)

    def matches(s: str) -> bool:
        st = 0
        for b in s.encode():
            st = dfa.step(st, b)
            if st < 0:
                return False
        return dfa.accept[st]

    assert matches("plain text, no tags at all")
    assert matches('hi <f=a>{"x": "1"}</f> bye')
    assert matches('<f=a>{"x": "2"}</f><f=a>{"x": "1"}</f>')
    # trigger forces the structure: cannot stop or diverge inside it
    assert not matches("oops <f=")
    assert not matches("oops <f=b>")
    assert not matches('<f=a>{"x": "3"}</f>')
    assert not matches('<f=a>{"x": "1"}')  # missing end


def test_structural_tag_matcher_forces_structure():
    tok = ByteTokenizer()
    spec = json.dumps({
        "type": "structural_tag",
        "structures": [{"begin": "<t>", "schema": {"enum": ["ok"]},
                        "end": "</t>"}],
        "triggers": ["<t>"],
    })
    compiled = compile_grammar("structural_tag", spec, tok, 512, {2})
    m = GrammarMatcher(compiled)
    mask = m.vocab_mask()
    assert mask[2]  # free text: EOS allowed immediately
    assert mask[ord("z") + 3]  # arbitrary text allowed
    # walk into the tag: "<t>" one byte-token at a time
    for ch in "<t>":
        assert m.accept_token(ord(ch) + 3), ch
    mask = m.vocab_mask()
    # inside the structure: only the schema continuation ("ok" -> '"'... no,
    # enum "ok" compiles to the literal string "ok" with quotes) is legal
    assert not mask[2]  # no EOS inside a structure
    legal = [i for i in range(512) if mask[i]]
    # every legal token must decode to the forced '"' (the ByteTokenizer
    # aliases ids mod 256, so several ids map to the same byte)
    assert legal and all((i - 3) % 256 == ord('"') for i in legal), legal
    # jump-forward completes the forced region deterministically
    forced = m.jump_forward_bytes()
    assert forced == b'"ok"</t>', forced


def test_engine_structural_tag(eng):
    spec = json.dumps({
        "type": "structural_tag",
        "structures": [{"begin": "<t>", "schema": {"enum": ["ok"]},
                        "end": "</t>"}],
        "triggers": ["<t>"],
    })
    out = eng.generate(
        prompt="The answer is",
        sampling_params={
            "max_new_tokens": 24,
            "temperature": 0.0,
            "structural_tag": spec,
        },
    )
    # free text is legal; if a tag opens it must be complete and valid
    text = out["text"]
    n_open = text.count("<t>")
    assert text.count('<t>"ok"</t>') == n_open, text


# ---------------------------------------------------------------------------
# overlap-compatible constrained decoding (two-phase dispatch)
# ---------------------------------------------------------------------------


def test_grammar_overlap_matches_sync(eng, monkeypatch):
    """The two-phase overlap path and the synchronous fallback must emit
    identical grammar-legal text (reference parity: overlap scheduler with
    xgrammar bitmask, srt/constrained/xgrammar_backend.py:94)."""
    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("SGLT_GRAMMAR_OVERLAP", mode)
        outs[mode] = eng.generate(
            prompt="The answer is",
            sampling_params={
                "max_new_tokens": 12,
                "temperature": 0.0,
                "regex": r"(yes|no)!",
            },
        )["text"]
    assert outs["0"] == outs["1"]


def test_grammar_overlap_mixed_batch(eng, monkeypatch):
    """One constrained request must not corrupt (or de-overlap) co-resident
    unconstrained requests: run both concurrently, compare the plain
    request's text with its solo run."""
    import threading

    monkeypatch.setenv("SGLT_GRAMMAR_OVERLAP", "1")
    plain_sp = {"max_new_tokens": 24, "temperature": 0.0}
    solo = eng.generate(prompt="tell me a story", sampling_params=plain_sp)

    results = {}

    def run(name, prompt, sp):
        results[name] = eng.generate(prompt=prompt, sampling_params=sp)

    ts = [
        threading.Thread(
            target=run,
            args=("grammar", "The answer is",
                  {"max_new_tokens": 12, "temperature": 0.0,
                   "regex": r"(yes|no)!"}),
        ),
        threading.Thread(
            target=run, args=("plain", "tell me a story", plain_sp)
        ),
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert results["grammar"]["text"] in ("yes!", "no!")
    assert results["plain"]["text"] == solo["text"]
