"""Tool / function calling: parser units + grammar-forced e2e.

Reference role: `srt/function_call/` detectors + OpenAI tools surface.
"""

import numpy as np

from sglang_awq_tpu.function_call.parser import (
    FunctionCallParser,
    forced_call_schema,
    tools_system_text,
)

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get the weather",
            "parameters": {
                "type": "object",
                "properties": {
                    "city": {"type": "string"},
                    "unit": {"type": "string", "enum": ["C", "F"]},
                },
                "required": ["city"],
            },
        },
    },
    {
        "type": "function",
        "function": {
            "name": "add",
            "parameters": {
                "type": "object",
                "properties": {"a": {"type": "integer"},
                               "b": {"type": "integer"}},
                "required": ["a", "b"],
            },
        },
    },
]


def test_parse_llama3_json():
    p = FunctionCallParser(TOOLS, "llama3")
    calls, normal = p.parse(
        'Sure! {"name": "get_weather", "parameters": {"city": "Paris"}}'
    )
    assert len(calls) == 1
    assert calls[0].name == "get_weather"
    assert '"Paris"' in calls[0].arguments
    assert normal == "Sure!"


def test_parse_llama3_multiple_and_python_tag():
    p = FunctionCallParser(TOOLS, "llama3")
    calls, _ = p.parse(
        '<|python_tag|>{"name": "add", "parameters": {"a": 1, "b": 2}};'
        '{"name": "get_weather", "parameters": {"city": "Oslo"}}'
    )
    assert [c.name for c in calls] == ["add", "get_weather"]


def test_parse_qwen25_tags():
    p = FunctionCallParser(TOOLS, "qwen25")
    calls, normal = p.parse(
        'thinking...\n<tool_call>\n{"name": "add", "arguments": '
        '{"a": 3, "b": 4}}\n</tool_call>'
    )
    assert len(calls) == 1 and calls[0].name == "add"
    assert normal == "thinking..."


def test_parse_rejects_unknown_and_plain_text():
    p = FunctionCallParser(TOOLS, "auto")
    calls, normal = p.parse('{"name": "rm_rf", "parameters": {}} hello')
    assert calls == []
    calls, normal = p.parse("no tools here {not json}")
    assert calls == []


def test_forced_schema_shapes():
    import json

    s = json.loads(forced_call_schema(TOOLS, "required"))
    assert "anyOf" in s and len(s["anyOf"]) == 2
    s1 = json.loads(
        forced_call_schema(TOOLS, {"type": "function",
                                   "function": {"name": "add"}})
    )
    assert s1["properties"]["name"]["const"] == "add"
    assert forced_call_schema(TOOLS, "auto") is None
    assert forced_call_schema([], "required") is None
    assert "get_weather" in tools_system_text(TOOLS)


# ---------------------------------------------------------------------------
# round-4 family detectors (reference srt/function_call/*_detector.py)
# ---------------------------------------------------------------------------

import json as _json

import pytest

from sglang_awq_tpu.function_call.parser import StreamingToolParser

FAMILY_CASES = {
    "mistral": (
        'I will check. [TOOL_CALLS] [{"name": "get_weather", "arguments": '
        '{"city": "Paris", "unit": "C"}}, {"name": "add", "arguments": '
        '{"a": 1, "b": 2}}]',
        [("get_weather", {"city": "Paris", "unit": "C"}),
         ("add", {"a": 1, "b": 2})],
        "I will check.",
    ),
    "deepseekv3": (
        "Let me see.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
        "<｜tool▁sep｜>get_weather\n```json\n"
        '{"city": "Oslo"}\n```<｜tool▁call▁end｜><｜tool▁calls▁end｜>',
        [("get_weather", {"city": "Oslo"})],
        "Let me see.",
    ),
    "pythonic": (
        '[get_weather(city="Rome", unit="F"), add(a=2, b=3)]',
        [("get_weather", {"city": "Rome", "unit": "F"}),
         ("add", {"a": 2, "b": 3})],
        "",
    ),
    "gpt_oss": (
        "<|start|>assistant<|channel|>commentary "
        'to=functions.get_weather <|constrain|>json<|message|>'
        '{"city": "Lima"}<|call|>'
        "<|start|>assistant<|channel|>final<|message|>Sunny.<|end|>",
        [("get_weather", {"city": "Lima"})],
        "Sunny.",
    ),
    "glm4": (
        "ok\n<tool_call>get_weather\n"
        "<arg_key>city</arg_key>\n<arg_value>Kyiv</arg_value>\n"
        "</tool_call>"
        "<tool_call>add\n"
        "<arg_key>a</arg_key><arg_value>4</arg_value>\n"
        "<arg_key>b</arg_key><arg_value>5</arg_value>\n"
        "</tool_call>",
        [("get_weather", {"city": "Kyiv"}), ("add", {"a": 4, "b": 5})],
        "ok",
    ),
    "kimik2": (
        "done<|tool_calls_section_begin|><|tool_call_begin|>"
        "functions.get_weather:0<|tool_call_argument_begin|>"
        '{"city": "Doha"}<|tool_call_end|><|tool_calls_section_end|>',
        [("get_weather", {"city": "Doha"})],
        "done",
    ),
    "qwen3_coder": (
        "<tool_call>\n<function=get_weather>\n<parameter=city>\nTokyo\n"
        "</parameter>\n<parameter=unit>\nC\n</parameter>\n</function>\n"
        "</tool_call>",
        [("get_weather", {"city": "Tokyo", "unit": "C"})],
        "",
    ),
}


@pytest.mark.parametrize("fmt", sorted(FAMILY_CASES))
def test_family_detector_one_shot(fmt):
    text, want, want_normal = FAMILY_CASES[fmt]
    p = FunctionCallParser(TOOLS, fmt)
    calls, normal = p.parse(text)
    got = [(c.name, _json.loads(c.arguments)) for c in calls]
    assert got == want
    assert normal == want_normal


@pytest.mark.parametrize("fmt", sorted(FAMILY_CASES))
def test_family_detector_streaming(fmt):
    """Chunked feed == one-shot result; pre-call text streams early."""
    text, want, want_normal = FAMILY_CASES[fmt]
    sp = StreamingToolParser(TOOLS, fmt)
    normal_parts, calls = [], []
    for i in range(0, len(text), 3):
        out, new = sp.push(text[i : i + 3])
        normal_parts.append(out)
        calls.extend(new)
    out, new = sp.flush()
    normal_parts.append(out)
    calls.extend(new)
    got = [(c.name, _json.loads(c.arguments)) for c in calls]
    assert got == want
    joined = "".join(normal_parts).strip()
    assert joined == want_normal


def test_streaming_plain_text_passthrough():
    sp = StreamingToolParser(TOOLS, "qwen25")
    text = "The weather is nice today, nothing to call."
    outs = []
    for ch in text:
        out, new = sp.push(ch)
        assert new == []
        outs.append(out)
    out, new = sp.flush()
    outs.append(out)
    assert "".join(outs) == text
    # most text must have streamed BEFORE flush (no full-buffer hold)
    assert sum(len(o) for o in outs[:-1]) > len(text) * 0.8


def test_streaming_partial_marker_heldback():
    sp = StreamingToolParser(TOOLS, "qwen25")
    out1, _ = sp.push("hello <tool_")
    assert out1 == "hello "
    out2, new = sp.push('call>{"name": "add", "arguments": {"a": 1, '
                        '"b": 2}}</tool_call>')
    assert new and new[0].name == "add"
    tail, _ = sp.flush()
    assert tail.strip() == ""
