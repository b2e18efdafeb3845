"""OpenAI-compatible API schema.

Role model: reference `python/sglang/srt/entrypoints/openai/protocol.py`
(pydantic request/response models).  Subset covering /v1/completions,
/v1/chat/completions, /v1/models with the sampling surface of SURVEY.md §A.7.
"""

from __future__ import annotations

import time
import uuid
from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, Field


class CompletionRequest(BaseModel):
    model: str = ""
    prompt: Union[str, List[str], List[int], List[List[int]]] = ""
    suffix: Optional[str] = None  # fill-in-middle (--completion-template)
    max_tokens: Optional[int] = 16
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stream: bool = False
    logprobs: Optional[int] = None
    echo: bool = False
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    top_k: int = -1
    min_p: float = 0.0
    min_tokens: int = 0
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    stop_token_ids: Optional[List[int]] = None
    user: Optional[str] = None
    logit_bias: Optional[Dict[str, float]] = None

    def to_sampling_params(self) -> Dict[str, Any]:
        sp = dict(
            max_new_tokens=self.max_tokens,
            min_new_tokens=self.min_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            frequency_penalty=self.frequency_penalty,
            presence_penalty=self.presence_penalty,
            repetition_penalty=self.repetition_penalty,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            seed=self.seed,
            n=self.n,
        )
        if self.logit_bias:
            sp["logit_bias"] = {int(k): v for k, v in self.logit_bias.items()}
        if self.logprobs is not None:
            sp["return_logprob"] = True
            sp["top_logprobs_num"] = int(self.logprobs)
            if self.echo:  # prompt tokens need logprobs too
                sp["logprob_start_len"] = 0
        return sp


class ChatMessage(BaseModel):
    role: str
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    name: Optional[str] = None

    def text(self) -> str:
        if isinstance(self.content, str):
            return self.content
        if isinstance(self.content, list):
            return "".join(
                p.get("text", "") for p in self.content if p.get("type") == "text"
            )
        return ""


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: List[ChatMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stream: bool = False
    stream_options: Optional[Dict[str, Any]] = None
    stop: Optional[Union[str, List[str]]] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    seed: Optional[int] = None
    top_k: int = -1
    min_p: float = 0.0
    min_tokens: int = 0
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    stop_token_ids: Optional[List[int]] = None
    logprobs: bool = False
    top_logprobs: Optional[int] = None
    user: Optional[str] = None
    logit_bias: Optional[Dict[str, float]] = None
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Union[str, Dict[str, Any], None] = "auto"
    # structured outputs (OpenAI response_format json_schema subset)
    response_format: Optional[Dict[str, Any]] = None

    def to_sampling_params(self) -> Dict[str, Any]:
        sp = dict(
            max_new_tokens=self.max_completion_tokens or self.max_tokens or 128,
            min_new_tokens=self.min_tokens,
            temperature=self.temperature,
            top_p=self.top_p,
            top_k=self.top_k,
            min_p=self.min_p,
            frequency_penalty=self.frequency_penalty,
            presence_penalty=self.presence_penalty,
            repetition_penalty=self.repetition_penalty,
            stop=self.stop,
            stop_token_ids=self.stop_token_ids,
            ignore_eos=self.ignore_eos,
            skip_special_tokens=self.skip_special_tokens,
            seed=self.seed,
            n=self.n,
        )
        if self.logit_bias:
            sp["logit_bias"] = {int(k): v for k, v in self.logit_bias.items()}
        return sp


def completion_response(rid, model, text, finish_reason, usage, echo_prompt=""):
    return {
        "id": f"cmpl-{rid}",
        "object": "text_completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": 0,
                "text": echo_prompt + text,
                "logprobs": None,
                "finish_reason": finish_reason,
            }
        ],
        "usage": usage,
    }


class ResponsesRequest(BaseModel):
    """OpenAI Responses API subset (reference /v1/responses,
    http_server.py:1329).  `input` is a string or a list of message items;
    `instructions` maps to a system message."""

    model: str = ""
    input: Union[str, List[Dict[str, Any]]] = ""
    instructions: Optional[str] = None
    max_output_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    stream: bool = False
    store: bool = True  # accepted; responses are not persisted
    metadata: Optional[Dict[str, Any]] = None
    previous_response_id: Optional[str] = None  # not supported (rejected)
    tools: Optional[List[Dict[str, Any]]] = None
    tool_choice: Union[str, Dict[str, Any], None] = "auto"

    def to_messages(self) -> List[ChatMessage]:
        msgs: List[ChatMessage] = []
        if self.instructions:
            msgs.append(ChatMessage(role="system", content=self.instructions))
        if isinstance(self.input, str):
            msgs.append(ChatMessage(role="user", content=self.input))
        else:
            for item in self.input:
                if item.get("type") not in (None, "message"):
                    continue  # function_call_output etc.: unsupported items
                content = item.get("content")
                if isinstance(content, list):
                    content = "".join(
                        p.get("text", "") for p in content
                        if p.get("type") in ("input_text", "output_text",
                                             "text")
                    )
                msgs.append(ChatMessage(
                    role=item.get("role", "user"), content=content or ""))
        return msgs


def responses_response(rid, model, text, status, usage):
    return {
        "id": f"resp_{rid}",
        "object": "response",
        "created_at": int(time.time()),
        "model": model,
        "status": status,
        "output": [
            {
                "id": f"msg_{rid}",
                "type": "message",
                "role": "assistant",
                "status": "completed",
                "content": [
                    {"type": "output_text", "text": text, "annotations": []}
                ],
            }
        ],
        "output_text": text,
        "usage": {
            "input_tokens": usage["prompt_tokens"],
            "output_tokens": usage["completion_tokens"],
            "total_tokens": usage["total_tokens"],
        },
        "metadata": {},
    }


def chat_response(rid, model, text, finish_reason, usage):
    return {
        "id": f"chatcmpl-{rid}",
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [
            {
                "index": 0,
                "message": {"role": "assistant", "content": text},
                "logprobs": None,
                "finish_reason": finish_reason,
            }
        ],
        "usage": usage,
    }


def usage_dict(prompt_tokens, completion_tokens):
    return {
        "prompt_tokens": prompt_tokens,
        "completion_tokens": completion_tokens,
        "total_tokens": prompt_tokens + completion_tokens,
    }
