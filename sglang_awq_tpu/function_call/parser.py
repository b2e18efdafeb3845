"""Tool / function-call output parsing.

Role model: reference `python/sglang/srt/function_call/` (4.7k LoC of
per-model detectors — `function_call_parser.py`, `llama32_detector.py`,
`qwen25_detector.py`).  This is the minimal TPU-engine equivalent: two
wire formats cover the llama-3.x and qwen-2.5 families, and the server can
FORCE the format through the grammar backend (json_schema) whenever
tool_choice is "required" or a named function — so calls parse even from
small models.

Formats:
  llama3: raw JSON object(s):  {"name": "f", "parameters": {...}}
          (also accepts "arguments" and a leading <|python_tag|>)
  qwen25: <tool_call>\n{"name": "f", "arguments": {...}}\n</tool_call>
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import List, Optional, Tuple


@dataclasses.dataclass
class ToolCallItem:
    name: str
    arguments: str  # JSON-encoded string (OpenAI wire format)
    tool_index: int = 0


def _scan_json_objects(text: str) -> List[Tuple[int, int, dict]]:
    """All top-level {...} spans that parse as JSON objects."""
    spans = []
    i = 0
    n = len(text)
    while i < n:
        if text[i] != "{":
            i += 1
            continue
        depth = 0
        in_str = False
        esc = False
        for j in range(i, n):
            ch = text[j]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    try:
                        spans.append((i, j + 1, json.loads(text[i : j + 1])))
                    except json.JSONDecodeError:
                        pass
                    i = j
                    break
        i += 1
    return spans


class FunctionCallParser:
    """Extract tool calls from generated text.

    format: "llama3" | "qwen25" | "auto" (tries qwen tags, then raw JSON).
    """

    def __init__(self, tools: List[dict], fmt: str = "auto"):
        self.fmt = fmt or "auto"
        fns = [t.get("function", t) for t in (tools or [])]
        self.names = {f["name"] for f in fns}
        self._tools_params = {
            f["name"]: f.get("parameters") or {} for f in fns
        }

    def _to_item(self, obj: dict, idx: int) -> Optional[ToolCallItem]:
        name = obj.get("name")
        if not isinstance(name, str):
            return None
        if self.names and name not in self.names:
            return None
        args = obj.get("parameters", obj.get("arguments", {}))
        if isinstance(args, str):
            args_s = args
        else:
            args_s = json.dumps(args, ensure_ascii=False)
        return ToolCallItem(name=name, arguments=args_s, tool_index=idx)

    def has_tool_call(self, text: str) -> bool:
        calls, _ = self.parse(text)
        return bool(calls)

    def parse(self, text: str) -> Tuple[List[ToolCallItem], str]:
        """-> (tool_calls, remaining normal text)."""
        calls: List[ToolCallItem] = []
        normal = text

        from sglang_awq_tpu.function_call.detectors import DETECTORS

        det = DETECTORS.get(self.fmt)
        if det is not None:
            params = dict(self._tools_params)
            raw, normal = det.parse(text, params)
            for name, args in raw:
                if self.names and name not in self.names:
                    continue
                calls.append(
                    ToolCallItem(name=name, arguments=args,
                                 tool_index=len(calls))
                )
            return calls, normal if calls else text

        if self.fmt in ("qwen25", "auto"):
            pat = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.S)
            found = pat.findall(text)
            if found:
                for body in found:
                    try:
                        obj = json.loads(body)
                    except json.JSONDecodeError:
                        continue
                    item = self._to_item(obj, len(calls))
                    if item:
                        calls.append(item)
                normal = pat.sub("", text).strip()
                if calls:
                    return calls, normal

        if self.fmt in ("llama3", "auto"):
            t = text.replace("<|python_tag|>", "")
            cut = []
            for start, end, obj in _scan_json_objects(t):
                item = self._to_item(obj, len(calls))
                if item:
                    calls.append(item)
                    cut.append((start, end))
            if calls:
                out = []
                last = 0
                for s, e in cut:
                    out.append(t[last:s])
                    last = e
                out.append(t[last:])
                # also strip the ';' separators llama3.1 emits between calls
                normal = "".join(out).replace(";", "", 1).strip()
        return calls, normal


class StreamingToolParser:
    """Incremental tool-call extraction for SSE streaming.

    Reference role: `BaseFormatDetector.parse_streaming_increment`
    (`srt/function_call/base_format_detector.py`).  Strategy: buffer the
    stream; emit normal text only up to the earliest possible begin-marker
    (including a partial marker at the buffer tail); whenever the one-shot
    parser finds newly COMPLETED calls in the buffered region, emit them.
    `flush()` drains whatever remains at end of stream.
    """

    def __init__(self, tools: List[dict], fmt: str = "auto"):
        self.parser = FunctionCallParser(tools, fmt)
        from sglang_awq_tpu.function_call.detectors import DETECTORS

        det = DETECTORS.get(self.parser.fmt)
        if det is not None:
            self.bots = tuple(det.bot_tokens)
        elif self.parser.fmt == "qwen25":
            self.bots = ("<tool_call>",)
        elif self.parser.fmt == "llama3":
            self.bots = ("{", "<|python_tag|>")
        else:  # auto
            self.bots = ("<tool_call>", "{", "<|python_tag|>")
        self._buf = ""
        self._emitted_calls = 0

    def _hold_from(self) -> int:
        """Index from which text must be withheld (possible call region)."""
        n = len(self._buf)
        first = min(
            (self._buf.find(t) for t in self.bots if t in self._buf),
            default=n,
        )
        # a partial marker at the tail also holds
        tail = n
        for t in self.bots:
            for k in range(min(len(t) - 1, n), 0, -1):
                if t.startswith(self._buf[n - k:]):
                    tail = min(tail, n - k)
                    break
        return min(first, tail)

    def push(self, delta: str) -> Tuple[str, List[ToolCallItem]]:
        """-> (normal_text_delta, newly completed calls)."""
        self._buf += delta
        calls, _ = self.parser.parse(self._buf)
        new = calls[self._emitted_calls:]
        self._emitted_calls = len(calls)
        if new or self._emitted_calls:
            # once calls exist in the buffer, surrounding normal text is
            # reconstructed at flush (the buffer must stay intact so the
            # one-shot parse keeps seeing every call)
            return "", new
        hold = self._hold_from()
        out = self._buf[:hold]
        self._buf = self._buf[hold:]
        return out, []

    def flush(self) -> Tuple[str, List[ToolCallItem]]:
        calls, normal = self.parser.parse(self._buf)
        new = calls[self._emitted_calls:]
        self._emitted_calls = len(calls)
        out = normal if calls else self._buf
        self._buf = ""
        return out, new


def forced_call_schema(tools: List[dict], tool_choice) -> Optional[str]:
    """JSON schema that FORCES a valid call (grammar backend input) when
    tool_choice is 'required' or a specific function; None otherwise."""
    if not tools:
        return None
    fns = [t.get("function", t) for t in tools]
    if isinstance(tool_choice, dict):
        want = tool_choice.get("function", {}).get("name")
        fns = [f for f in fns if f.get("name") == want]
        if not fns:
            return None
    elif tool_choice != "required":
        return None

    variants = []
    for f in fns:
        variants.append(
            {
                "type": "object",
                "properties": {
                    "name": {"const": f["name"]},
                    "parameters": f.get("parameters", {"type": "object"}),
                },
                "required": ["name", "parameters"],
            }
        )
    schema = variants[0] if len(variants) == 1 else {"anyOf": variants}
    return json.dumps(schema)


def tools_system_text(tools: List[dict]) -> str:
    """Prompt injection describing the tools (used when the tokenizer's
    chat template has no native tools support)."""
    fns = [t.get("function", t) for t in tools]
    lines = [
        "You have access to the following functions. To call a function, "
        'respond ONLY with a JSON object of the form '
        '{"name": "<function-name>", "parameters": {...}}.',
        "",
    ]
    for f in fns:
        lines.append(json.dumps(
            {"name": f.get("name"), "description": f.get("description", ""),
             "parameters": f.get("parameters", {})},
            ensure_ascii=False,
        ))
    return "\n".join(lines)
