"""Reasoning parser units (reference parser/reasoning_parser.py role)."""

import pytest

from sglang_awq_tpu.parser import ReasoningParser


def test_deepseek_r1_oneshot():
    p = ReasoningParser("deepseek-r1")
    r, c = p.parse("I think step by step.</think>The answer is 4.")
    assert r == "I think step by step."
    assert c == "The answer is 4."


def test_deepseek_r1_truncated():
    p = ReasoningParser("deepseek-r1")
    r, c = p.parse("endless pondering with no close tag")
    assert r == "endless pondering with no close tag"
    assert c == ""


def test_qwen3_without_think_is_plain():
    p = ReasoningParser("qwen3")
    r, c = p.parse("just an answer")
    assert r is None and c == "just an answer"
    p = ReasoningParser("qwen3")
    r, c = p.parse("<think>hmm</think>ok")
    assert r == "hmm" and c == "ok"


def test_streaming_split_across_chunks():
    p = ReasoningParser("deepseek-r1")
    chunks = ["step one", " step two</th", "ink>final", " answer"]
    rs, cs = "", ""
    for ch in chunks:
        r, c = p.parse_stream_chunk(ch)
        rs += r
        cs += c
    assert rs == "step one step two"
    assert cs == "final answer"


def test_streaming_qwen3_start_tag_split():
    p = ReasoningParser("qwen3")
    rs, cs = "", ""
    for ch in ["hello <th", "ink>why</think>", " done"]:
        r, c = p.parse_stream_chunk(ch)
        rs += r
        cs += c
    assert rs == "why"
    assert cs == "hello  done"


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        ReasoningParser("nope")
