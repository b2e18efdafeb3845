"""DSL IR nodes (reference `python/sglang/lang/ir.py`).

A program body appends expressions to the state with `s += expr`; constant
text appends directly, `gen`/`select` execute against the backend at append
time (sequential semantics — later expressions see earlier generations)."""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Union


@dataclasses.dataclass
class SglGen:
    name: Optional[str] = None
    max_tokens: int = 128
    temperature: float = 0.0
    top_p: float = 1.0
    stop: Union[str, List[str], None] = None
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ebnf: Optional[str] = None

    def sampling_params(self) -> dict:
        sp = {
            "max_new_tokens": self.max_tokens,
            "temperature": self.temperature,
            "top_p": self.top_p,
        }
        if self.stop:
            sp["stop"] = self.stop
        if self.regex:
            sp["regex"] = self.regex
        if self.json_schema:
            sp["json_schema"] = self.json_schema
        if self.ebnf:
            sp["ebnf"] = self.ebnf
        return sp


@dataclasses.dataclass
class SglSelect:
    name: Optional[str]
    choices: List[str]


@dataclasses.dataclass
class SglRole:
    role: str  # system | user | assistant
    parts: tuple  # strings and/or SglGen/SglSelect


def gen(name: Optional[str] = None, max_tokens: int = 128,
        temperature: float = 0.0, top_p: float = 1.0,
        stop=None, regex=None, json_schema=None, ebnf=None) -> SglGen:
    return SglGen(name, max_tokens, temperature, top_p, stop, regex,
                  json_schema, ebnf)


def select(name: Optional[str] = None, choices: List[str] = ()) -> SglSelect:
    return SglSelect(name, list(choices))


def system(*parts) -> SglRole:
    return SglRole("system", parts)


def user(*parts) -> SglRole:
    return SglRole("user", parts)


def assistant(*parts) -> SglRole:
    return SglRole("assistant", parts)
