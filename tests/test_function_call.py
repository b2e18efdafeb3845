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
