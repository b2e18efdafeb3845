"""Per-model-family tool-call wire-format detectors.

Reference role: `python/sglang/srt/function_call/*_detector.py` (one
detector per family, selected by --tool-call-parser).  Each detector here
parses COMPLETE calls only (end markers required), which makes the shared
streaming wrapper sound: text is held back from the first possible
begin-marker, and a call is emitted exactly once when its end marker lands.

Formats (reference file for each):
  mistral      [TOOL_CALLS] [{"name": ..., "arguments": {...}}, ...]
               (mistral_detector.py)
  deepseekv3   <|tool_calls_begin|><|tool_call_begin|>fn<|tool_sep|>NAME
               \n```json\n{...}\n```<|tool_call_end|>... (deepseekv3_detector.py;
               the real markers use fullwidth bars, see BOT below)
  pythonic     [fn1(a=1, b="x"), fn2()]  (pythonic_detector.py, llama4)
  gpt_oss      <|channel|>commentary to=functions.NAME <|constrain|>json
               <|message|>{...}<|call|>  (gpt_oss_detector.py, harmony)
  glm4         <tool_call>NAME\n<arg_key>K</arg_key><arg_value>V</arg_value>
               ...</tool_call>  (glm4_moe_detector.py)
  kimik2       <|tool_calls_section_begin|><|tool_call_begin|>functions.NAME:0
               <|tool_call_argument_begin|>{...}<|tool_call_end|>...
               (kimik2_detector.py)
  qwen3_coder  <tool_call><function=NAME><parameter=K>V</parameter>...
               </function></tool_call>  (qwen3_coder_detector.py)
"""

from __future__ import annotations

import ast
import json
import re
from typing import Any, Dict, List, Optional, Tuple

Call = Tuple[str, str]  # (name, json-encoded arguments)


def _coerce(value: str, ptype: Optional[str]):
    """String arg value -> schema-typed python value (glm4/qwen3_coder)."""
    v = value.strip()
    if ptype in ("integer", "number"):
        try:
            return int(v) if ptype == "integer" else float(v)
        except ValueError:
            pass
    if ptype == "boolean":
        if v.lower() in ("true", "false"):
            return v.lower() == "true"
    if ptype in ("object", "array") or (
        ptype is None and v[:1] in ("{", "[")
    ):
        try:
            return json.loads(v)
        except json.JSONDecodeError:
            pass
    if ptype is None:
        try:
            return json.loads(v)
        except (json.JSONDecodeError, ValueError):
            pass
    return value


def _param_types(tools_params: Dict[str, dict], name: str) -> Dict[str, str]:
    props = (tools_params.get(name) or {}).get("properties") or {}
    return {k: p.get("type") for k, p in props.items() if isinstance(p, dict)}


class Detector:
    """One wire format.  `bot_tokens` gate streaming hold-back."""

    bot_tokens: Tuple[str, ...] = ()

    def parse(self, text: str, tools_params: Dict[str, dict]) -> Tuple[List[Call], str]:
        raise NotImplementedError


class MistralDetector(Detector):
    bot_tokens = ("[TOOL_CALLS]",)

    def parse(self, text, tools_params):
        idx = text.find("[TOOL_CALLS]")
        if idx < 0:
            return [], text
        rest = text[idx + len("[TOOL_CALLS]"):]
        a = rest.find("[")
        if a < 0:
            return [], text
        depth, in_str, esc = 0, False, False
        end = -1
        for j, ch in enumerate(rest[a:], start=a):
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
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    end = j + 1
                    break
        if end < 0:
            return [], text
        try:
            arr = json.loads(rest[a:end])
        except json.JSONDecodeError:
            return [], text
        calls = []
        for obj in arr if isinstance(arr, list) else []:
            name = obj.get("name")
            if isinstance(name, str):
                args = obj.get("arguments", obj.get("parameters", {}))
                calls.append(
                    (name, args if isinstance(args, str)
                     else json.dumps(args, ensure_ascii=False))
                )
        normal = (text[:idx] + rest[end:]).strip()
        return calls, normal


class DeepSeekV3Detector(Detector):
    BOT = "<｜tool▁calls▁begin｜>"
    EOT = "<｜tool▁calls▁end｜>"
    CALL_B = "<｜tool▁call▁begin｜>"
    CALL_E = "<｜tool▁call▁end｜>"
    SEP = "<｜tool▁sep｜>"
    bot_tokens = (BOT, CALL_B)

    _one = re.compile(
        re.escape(CALL_B) + r"(?:.*?)" + re.escape(SEP)
        + r"(.*?)\n```json\n(.*?)\n```" + re.escape(CALL_E),
        re.DOTALL,
    )

    def parse(self, text, tools_params):
        calls = []
        for m in self._one.finditer(text):
            name = m.group(1).strip()
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append((name, json.dumps(args, ensure_ascii=False)))
        if not calls:
            return [], text
        idx = text.find(self.BOT)
        if idx < 0:
            idx = text.find(self.CALL_B)
        normal = text[:idx].strip()
        tail = text.rsplit(self.EOT, 1)
        if len(tail) == 2 and tail[1].strip():
            normal = (normal + " " + tail[1].strip()).strip()
        return calls, normal


class PythonicDetector(Detector):
    bot_tokens = ("[",)

    _rx = re.compile(
        r"\[\s*[a-zA-Z_]\w*\s*\(.*?\)\s*(?:,\s*[a-zA-Z_]\w*\s*\(.*?\)\s*)*\]",
        re.DOTALL,
    )

    def parse(self, text, tools_params):
        t = text.replace("<|python_start|>", "").replace("<|python_end|>", "")
        m = self._rx.search(t)
        if not m:
            return [], text
        try:
            module = ast.parse(m.group(0).strip(), mode="eval")
            elts = module.body.elts  # type: ignore[attr-defined]
        except (SyntaxError, AttributeError):
            return [], text
        calls = []
        for node in elts:
            if not isinstance(node, ast.Call) or not isinstance(
                node.func, ast.Name
            ):
                return [], text
            try:
                args = {
                    kw.arg: ast.literal_eval(kw.value) for kw in node.keywords
                }
            except (ValueError, SyntaxError):
                return [], text
            calls.append(
                (node.func.id, json.dumps(args, ensure_ascii=False))
            )
        normal = (t[: m.start()] + t[m.end():]).strip()
        return calls, normal


class GptOssDetector(Detector):
    bot_tokens = ("<|start|>assistant<|channel|>commentary",
                  "<|channel|>commentary")

    _call = re.compile(
        r"<\|channel\|>commentary to=(?:functions\.)?([\w.-]+)\s*"
        r"<\|constrain\|>json<\|message\|>(.*?)<\|call\|>",
        re.DOTALL,
    )
    _final = re.compile(
        r"<\|channel\|>final<\|message\|>(.*?)(?:<\|end\|>|<\|return\|>|$)",
        re.DOTALL,
    )

    def parse(self, text, tools_params):
        calls = []
        for m in self._call.finditer(text):
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append((m.group(1), json.dumps(args, ensure_ascii=False)))
        if not calls:
            return [], text
        finals = self._final.findall(text)
        if finals:
            normal = " ".join(f.strip() for f in finals).strip()
        else:
            normal = self._call.sub("", text)
            normal = re.sub(r"<\|[a-z_]+\|>(?:assistant)?", "", normal).strip()
        return calls, normal


class Glm4Detector(Detector):
    bot_tokens = ("<tool_call>",)

    _block = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    _detail = re.compile(r"^(.*?)(?:\\n|\n)(.*)$", re.DOTALL)
    _arg = re.compile(
        r"<arg_key>(.*?)</arg_key>(?:\\n|\s)*<arg_value>(.*?)</arg_value>",
        re.DOTALL,
    )

    def parse(self, text, tools_params):
        calls = []
        for body in self._block.findall(text):
            d = self._detail.search(body.strip())
            if not d:
                name, rest = body.strip(), ""
            else:
                name, rest = d.group(1).strip(), d.group(2)
            types = _param_types(tools_params, name)
            args = {
                k.strip(): _coerce(v, types.get(k.strip()))
                for k, v in self._arg.findall(rest)
            }
            calls.append((name, json.dumps(args, ensure_ascii=False)))
        if not calls:
            return [], text
        idx = text.find("<tool_call>")
        return calls, text[:idx].strip()


class KimiK2Detector(Detector):
    bot_tokens = ("<|tool_calls_section_begin|>", "<|tool_call_begin|>")

    _one = re.compile(
        r"<\|tool_call_begin\|>\s*(?:functions\.)?([\w.]+):\d+\s*"
        r"<\|tool_call_argument_begin\|>\s*(\{.*?\})\s*<\|tool_call_end\|>",
        re.DOTALL,
    )

    def parse(self, text, tools_params):
        calls = []
        for m in self._one.finditer(text):
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append((m.group(1), json.dumps(args, ensure_ascii=False)))
        if not calls:
            return [], text
        idx = min(
            (text.find(t) for t in self.bot_tokens if t in text),
            default=0,
        )
        tail = text.rsplit("<|tool_calls_section_end|>", 1)
        normal = text[:idx].strip()
        if len(tail) == 2 and tail[1].strip():
            normal = (normal + " " + tail[1].strip()).strip()
        return calls, normal


class Qwen3CoderDetector(Detector):
    bot_tokens = ("<tool_call>",)

    _block = re.compile(r"<tool_call>(.*?)</tool_call>", re.DOTALL)
    _fn = re.compile(r"<function=(.*?)>(.*?)</function>", re.DOTALL)
    _param = re.compile(r"<parameter=(.*?)>(.*?)</parameter>", re.DOTALL)

    def parse(self, text, tools_params):
        calls = []
        for body in self._block.findall(text):
            for fm in self._fn.finditer(body):
                name = fm.group(1).strip()
                types = _param_types(tools_params, name)
                args: Dict[str, Any] = {}
                for pm in self._param.finditer(fm.group(2)):
                    k = pm.group(1).strip()
                    v = pm.group(2)
                    # one newline each side is formatting, not content
                    v = v[1:] if v.startswith("\n") else v
                    v = v[:-1] if v.endswith("\n") else v
                    args[k] = _coerce(v, types.get(k))
                calls.append((name, json.dumps(args, ensure_ascii=False)))
        if not calls:
            return [], text
        idx = text.find("<tool_call>")
        return calls, text[:idx].strip()


DETECTORS: Dict[str, Detector] = {
    "mistral": MistralDetector(),
    "deepseekv3": DeepSeekV3Detector(),
    "pythonic": PythonicDetector(),
    "gpt_oss": GptOssDetector(),
    "glm4": Glm4Detector(),
    "glm4_moe": Glm4Detector(),
    "kimik2": KimiK2Detector(),
    "qwen3_coder": Qwen3CoderDetector(),
}
