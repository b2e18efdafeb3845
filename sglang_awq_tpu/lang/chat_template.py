"""Named chat-template registry.

Role model: reference `python/sglang/lang/chat_template.py` (ChatTemplate
+ registry + model-path matching functions, ~40 named templates) — the
fallback layer used when a checkpoint ships no tokenizer-side Jinja
template, and the target of the `--chat-template <name>` override.

The template strings themselves are the models' public wire formats
(special-token framing published with each checkpoint), re-declared here.
Rendering is prefix/suffix concatenation per role; `llama2_wrap` handles
the Llama-2 quirk of folding the system block into the first user turn.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple


@dataclasses.dataclass
class ChatTemplate:
    name: str
    roles: Dict[str, Tuple[str, str]]  # role -> (prefix, suffix)
    default_system_prompt: Optional[str] = None
    stop_str: Tuple[str, ...] = ()
    image_token: str = ""
    llama2_wrap: bool = False  # system folds INSIDE the first [INST]

    def render(self, messages: List[dict],
               add_generation_prompt: bool = True) -> str:
        msgs = list(messages)
        if self.default_system_prompt and (
            not msgs or msgs[0].get("role") != "system"
        ):
            msgs = [{"role": "system",
                     "content": self.default_system_prompt}] + msgs
        out = []
        for i, m in enumerate(msgs):
            role = m["role"]
            content = m.get("content") or ""
            prefix, suffix = self.roles.get(role, ("", ""))
            if self.llama2_wrap:
                if role == "system":
                    up, _ = self.roles.get("user", ("", ""))
                    prefix = up + prefix
                elif role == "user" and i == 1 and msgs[0]["role"] == "system":
                    prefix = ""  # already opened by the system block
            out.append(f"{prefix}{content}{suffix}")
        if add_generation_prompt:
            out.append(self.roles.get("assistant", ("", ""))[0])
        return "".join(out)


chat_template_registry: Dict[str, ChatTemplate] = {}
_matchers: List[Callable[[str], Optional[str]]] = []


def register_chat_template(t: ChatTemplate) -> None:
    chat_template_registry[t.name] = t


def register_matcher(fn: Callable[[str], Optional[str]]) -> None:
    _matchers.append(fn)


def get_chat_template(name: str) -> ChatTemplate:
    return chat_template_registry[name]


def match_chat_template(model_path: str) -> ChatTemplate:
    low = (model_path or "").lower()
    for fn in _matchers:
        name = fn(low)
        if name is not None:
            return chat_template_registry[name]
    return chat_template_registry["default"]


def chat_template_from_json(spec: dict) -> ChatTemplate:
    """Reference `--chat-template file.json` schema: role keys map to
    [prefix, suffix] pairs; optional name/system prompt/stop."""
    roles = {
        r: tuple(spec[r]) for r in ("system", "user", "assistant")
        if r in spec
    }
    return ChatTemplate(
        name=spec.get("name", "custom"),
        roles=roles,
        default_system_prompt=spec.get("default_system_prompt"),
        stop_str=tuple(spec.get("stop_str", ())),
    )


register_chat_template(ChatTemplate(
    name="default",
    roles={"system": ("SYSTEM:", "\n"), "user": ("USER:", "\n"),
           "assistant": ("ASSISTANT:", "\n")},
))

register_chat_template(ChatTemplate(
    name="chatml",
    roles={"system": ("<|im_start|>system\n", "<|im_end|>\n"),
           "user": ("<|im_start|>user\n", "<|im_end|>\n"),
           "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n")},
    stop_str=("<|im_end|>",),
))

register_chat_template(ChatTemplate(
    name="qwen",
    roles={"system": ("<|im_start|>system\n", "<|im_end|>\n"),
           "user": ("<|im_start|>user\n", "<|im_end|>\n"),
           "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n")},
    default_system_prompt="You are a helpful assistant.",
    stop_str=("<|im_end|>",),
))

register_chat_template(ChatTemplate(
    name="qwen2-vl",
    roles={"system": ("<|im_start|>system\n", "<|im_end|>\n"),
           "user": ("<|im_start|>user\n", "<|im_end|>\n"),
           "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n")},
    default_system_prompt="You are a helpful assistant.",
    stop_str=("<|im_end|>",),
    image_token="<|vision_start|><|image_pad|><|vision_end|>",
))

register_chat_template(ChatTemplate(
    name="llama-2-chat",
    roles={"system": ("<<SYS>>\n", "\n<</SYS>>\n\n"),
           "user": ("[INST] ", " [/INST]"),
           "assistant": (" ", " </s><s>")},
    llama2_wrap=True,
))

register_chat_template(ChatTemplate(
    name="llama-3-instruct",
    roles={
        "system": ("<|start_header_id|>system<|end_header_id|>\n\n",
                   "<|eot_id|>"),
        "user": ("<|start_header_id|>user<|end_header_id|>\n\n",
                 "<|eot_id|>"),
        "assistant": ("<|start_header_id|>assistant<|end_header_id|>\n\n",
                      "<|eot_id|>"),
    },
    stop_str=("<|eot_id|>",),
))

register_chat_template(ChatTemplate(
    name="llama-4",
    roles={
        "system": ("<|header_start|>system<|header_end|>\n\n", "<|eot|>"),
        "user": ("<|header_start|>user<|header_end|>\n\n", "<|eot|>"),
        "assistant": ("<|header_start|>assistant<|header_end|>\n\n",
                      "<|eot|>"),
    },
    stop_str=("<|eot|>",),
    image_token="<|image|>",
))

register_chat_template(ChatTemplate(
    name="mistral",
    roles={"system": ("<<SYS>>\n", "\n<</SYS>>\n\n"),
           "user": ("[INST] ", " [/INST]"),
           "assistant": ("", " </s><s>")},
    llama2_wrap=True,
))

register_chat_template(ChatTemplate(
    name="vicuna_v1.1",
    roles={"system": ("", " "), "user": ("USER: ", " "),
           "assistant": ("ASSISTANT: ", "</s>")},
    default_system_prompt=(
        "A chat between a curious human and an artificial intelligence "
        "assistant. The assistant gives helpful, detailed, and polite "
        "answers to the human's questions."),
))

register_chat_template(ChatTemplate(
    name="gemma-it",
    roles={"user": ("<start_of_turn>user\n", "<end_of_turn>\n"),
           "assistant": ("<start_of_turn>model\n", "<end_of_turn>\n"),
           # gemma has no system role: fold as a user preamble
           "system": ("<start_of_turn>user\n", "<end_of_turn>\n")},
    stop_str=("<end_of_turn>",),
    image_token="<start_of_image>",
))

register_chat_template(ChatTemplate(
    name="deepseek",
    roles={"system": ("", "\n\n"), "user": ("User: ", "\n\n"),
           "assistant": ("Assistant: ", "<｜end▁of▁sentence｜>")},
    stop_str=("<｜end▁of▁sentence｜>",),
))

register_chat_template(ChatTemplate(
    name="deepseek-v3",
    roles={"system": ("", ""),
           "user": ("<｜User｜>", ""),
           "assistant": ("<｜Assistant｜>", "<｜end▁of▁sentence｜>")},
    stop_str=("<｜end▁of▁sentence｜>",),
))

register_chat_template(ChatTemplate(
    name="phi-3",
    roles={"system": ("<|system|>\n", "<|end|>\n"),
           "user": ("<|user|>\n", "<|end|>\n"),
           "assistant": ("<|assistant|>\n", "<|end|>\n")},
    stop_str=("<|end|>",),
))

register_chat_template(ChatTemplate(
    name="glm-4",
    roles={"system": ("<|system|>\n", ""), "user": ("<|user|>\n", ""),
           "assistant": ("<|assistant|>\n", "")},
    stop_str=("<|user|>",),
))

register_chat_template(ChatTemplate(
    name="yi-1.5",
    roles={"system": ("", ""), "user": ("<|im_start|>user\n", "<|im_end|>\n"),
           "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n")},
    stop_str=("<|im_end|>",),
))

register_chat_template(ChatTemplate(
    name="granite-3-instruct",
    roles={
        "system": ("<|start_of_role|>system<|end_of_role|>",
                   "<|end_of_text|>\n"),
        "user": ("<|start_of_role|>user<|end_of_role|>", "<|end_of_text|>\n"),
        "assistant": ("<|start_of_role|>assistant<|end_of_role|>",
                      "<|end_of_text|>\n"),
    },
    stop_str=("<|end_of_text|>",),
))

register_chat_template(ChatTemplate(
    name="dbrx-instruct",
    roles={"system": ("<|im_start|>system\n", "<|im_end|>\n"),
           "user": ("<|im_start|>user\n", "<|im_end|>\n"),
           "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n")},
    default_system_prompt="You are DBRX, created by Databricks.",
    stop_str=("<|im_end|>",),
))

register_chat_template(ChatTemplate(
    name="c4ai-command-r",
    roles={
        "system": ("<|START_OF_TURN_TOKEN|><|SYSTEM_TOKEN|>",
                   "<|END_OF_TURN_TOKEN|>"),
        "user": ("<|START_OF_TURN_TOKEN|><|USER_TOKEN|>",
                 "<|END_OF_TURN_TOKEN|>"),
        "assistant": ("<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>",
                      "<|END_OF_TURN_TOKEN|>"),
    },
    stop_str=("<|END_OF_TURN_TOKEN|>",),
))

register_chat_template(ChatTemplate(
    name="internlm2-chat",
    roles={"system": ("<|im_start|>system\n", "<|im_end|>\n"),
           "user": ("<|im_start|>user\n", "<|im_end|>\n"),
           "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n")},
    stop_str=("<|im_end|>", "<|action_end|>"),
))

register_chat_template(ChatTemplate(
    name="falcon-instruct",
    roles={"system": ("", "\n"), "user": ("User: ", "\n"),
           "assistant": ("Falcon: ", "\n")},
    stop_str=("\nUser",),
))

register_chat_template(ChatTemplate(
    name="baichuan2-chat",
    roles={"system": ("", ""), "user": ("<reserved_106>", ""),
           "assistant": ("<reserved_107>", "")},
))

register_chat_template(ChatTemplate(
    name="exaone3-instruct",
    roles={"system": ("[|system|]", "[|endofturn|]\n"),
           "user": ("[|user|]", "\n"),
           "assistant": ("[|assistant|]", "[|endofturn|]\n")},
    stop_str=("[|endofturn|]",),
))

register_chat_template(ChatTemplate(
    name="kimi",
    roles={"system": ("<|im_system|>system<|im_middle|>", "<|im_end|>"),
           "user": ("<|im_user|>user<|im_middle|>", "<|im_end|>"),
           "assistant": ("<|im_assistant|>assistant<|im_middle|>",
                         "<|im_end|>")},
    stop_str=("<|im_end|>",),
))


def _m(low: str) -> Optional[str]:
    table = [
        (("llama-4", "llama4"), "llama-4"),
        (("llama-3", "llama3"), "llama-3-instruct"),
        (("llama-2", "llama2"), "llama-2-chat"),
        (("qwen2-vl", "qwen2.5-vl", "qwen2_5_vl"), "qwen2-vl"),
        (("qwen",), "qwen"),
        (("smollm", "olmoe", "olmo"), "chatml"),
        (("mistral", "mixtral"), "mistral"),
        (("vicuna",), "vicuna_v1.1"),
        (("gemma",), "gemma-it"),
        (("deepseek-v3", "deepseek-r1", "deepseek_v3"), "deepseek-v3"),
        (("deepseek",), "deepseek"),
        (("phi-3", "phi3", "phi-4"), "phi-3"),
        (("glm-4", "glm4", "chatglm"), "glm-4"),
        (("yi-1.5", "yi-34b-chat", "yi-6b-chat"), "yi-1.5"),
        (("granite",), "granite-3-instruct"),
        (("dbrx",), "dbrx-instruct"),
        (("command-r", "c4ai"), "c4ai-command-r"),
        (("internlm",), "internlm2-chat"),
        (("falcon",), "falcon-instruct"),
        (("baichuan2", "baichuan"), "baichuan2-chat"),
        (("exaone",), "exaone3-instruct"),
        (("kimi",), "kimi"),
        (("hunyuan", "ernie", "starcoder2", "dots"), "chatml"),
    ]
    # instruct/chat variants only: base models keep raw completion
    for keys, name in table:
        if any(k in low for k in keys):
            return name
    return None


register_matcher(_m)
