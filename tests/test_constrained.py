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
