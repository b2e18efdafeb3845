"""Typed environment-variable registry.

Role model: the reference's `python/sglang/srt/environ.py:138` (`Envs`, 144
entries).  We keep the same idea — one typed, discoverable registry instead of
scattered `os.environ` reads — with only the entries the TPU engine uses.
"""

from __future__ import annotations

import os
from typing import Any, Callable


class EnvField:
    def __init__(self, name: str, default: Any, parse: Callable[[str], Any]):
        self.name = name
        self.default = default
        self.parse = parse

    def get(self) -> Any:
        raw = os.environ.get(self.name)
        if raw is None:
            return self.default
        return self.parse(raw)

    # Allow `envs.X.value` and plain truthiness checks.
    @property
    def value(self) -> Any:
        return self.get()

    def is_set(self) -> bool:
        return self.name in os.environ


def _bool(raw: str) -> bool:
    return raw.lower() in ("1", "true", "yes", "on")


def env_bool(name: str, default: bool = False) -> EnvField:
    return EnvField(name, default, _bool)


def env_int(name: str, default: int) -> EnvField:
    return EnvField(name, default, int)


def env_float(name: str, default: float) -> EnvField:
    return EnvField(name, default, float)


def env_str(name: str, default: str = "") -> EnvField:
    return EnvField(name, default, str)


class Envs:
    # --- debugging / testing ---
    SGLT_TEST_MODE = env_bool("SGLT_TEST_MODE")  # force CPU-friendly paths
    SGLT_PALLAS_INTERPRET = env_bool("SGLT_PALLAS_INTERPRET")
    SGLT_DEBUG_MEMORY_POOL = env_bool("SGLT_DEBUG_MEMORY_POOL")
    SGLT_STRICT_MEM_CHECK = env_bool("SGLT_ENABLE_STRICT_MEM_CHECK_DURING_BUSY")
    SGLT_LOG_LEVEL = env_str("SGLT_LOG_LEVEL", "INFO")
    # --- scheduler ---
    SGLT_CLIP_MAX_NEW_TOKENS_ESTIMATION = env_int(
        "SGLT_CLIP_MAX_NEW_TOKENS_ESTIMATION", 4096
    )
    SGLT_RETRACT_DECODE_STEPS = env_int("SGLT_RETRACT_DECODE_STEPS", 20)
    SGLT_TEST_RETRACT = env_bool("SGLT_TEST_RETRACT")  # force retraction in tests
    # --- compile / buckets ---
    SGLT_DISABLE_JIT_CACHE = env_bool("SGLT_DISABLE_JIT_CACHE")
    SGLT_COMPILE_VERBOSE = env_bool("SGLT_COMPILE_VERBOSE")
    # --- sampling ---
    SGLT_RETURN_ORIGINAL_LOGPROB = env_bool("SGLT_RETURN_ORIGINAL_LOGPROB")
    # --- watchdog ---
    SGLT_WATCHDOG_TIMEOUT = env_float("SGLT_WATCHDOG_TIMEOUT", 300.0)


envs = Envs()
