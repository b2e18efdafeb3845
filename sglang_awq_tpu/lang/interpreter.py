"""DSL interpreter + backends (reference `python/sglang/lang/interpreter.py`
+ `lang/backend/runtime_endpoint.py`).

Sequential execution: `s += expr` runs generations immediately, so later
program text can reference earlier captures through normal Python.  fork(n)
clones the state and runs continuations in parallel threads (the engine's
radix cache dedups the shared prefix KV).  select() picks the choice with
the highest total prompt logprob of its tokens given the current context —
the reference RuntimeEndpoint.select strategy."""

from __future__ import annotations

import concurrent.futures
import threading
from typing import Any, Callable, Dict, List, Optional

from sglang_awq_tpu.lang.ir import SglGen, SglRole, SglSelect

_DEFAULT_BACKEND = None


def set_default_backend(backend) -> None:
    global _DEFAULT_BACKEND
    _DEFAULT_BACKEND = backend


# ---------------------------------------------------------------------------
# backends
# ---------------------------------------------------------------------------


class EngineBackend:
    """In-process Engine."""

    def __init__(self, engine):
        self.engine = engine

    def generate(self, prompt: str, sampling_params: dict) -> str:
        out = self.engine.generate(
            prompt=prompt, sampling_params=dict(sampling_params)
        )
        return out["text"]

    def score_continuations(self, prompt: str, choices: List[str]) -> List[float]:
        tok = self.engine.tokenizer_manager.tokenizer
        if tok is None:
            raise ValueError("select() requires a tokenizer")
        base = tok.encode(prompt)
        scores = []
        for c in choices:
            ids = base + tok.encode(c)
            out = self.engine.generate(
                input_ids=ids,
                sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                                 "ignore_eos": True,
                                 "return_logprob": True,
                                 "logprob_start_len": len(base) - 1},
            )
            lps = out["meta_info"]["input_token_logprobs"] or []
            scores.append(sum(v for v, _ in lps))
        return scores


class RuntimeEndpoint:
    """HTTP backend against a running server (reference
    lang/backend/runtime_endpoint.py)."""

    def __init__(self, base_url: str, timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def generate(self, prompt: str, sampling_params: dict) -> str:
        import httpx

        r = httpx.post(
            self.base_url + "/generate",
            json={"text": prompt, "sampling_params": dict(sampling_params)},
            timeout=self.timeout,
        )
        r.raise_for_status()
        return r.json()["text"]

    def score_continuations(self, prompt: str, choices: List[str]) -> List[float]:
        import httpx

        scores = []
        for c in choices:
            r = httpx.post(
                self.base_url + "/generate",
                json={
                    "text": prompt + c,
                    "sampling_params": {"max_new_tokens": 1,
                                        "temperature": 0.0,
                                        "ignore_eos": True},
                    "return_logprob": True,
                    # server re-tokenizes; score the continuation region
                    # conservatively from the prompt boundary
                    "logprob_start_len": max(len(prompt) // 8, 0),
                },
                timeout=self.timeout,
            )
            r.raise_for_status()
            lps = r.json()["meta_info"]["input_token_logprobs"] or []
            # take the tail covering the choice (approximation over the
            # token boundary; exact with input_ids-based EngineBackend)
            scores.append(sum(v for v, _ in lps[-max(len(c) // 2, 1):]))
        return scores


class OpenAIBackend:
    """OpenAI-compatible backend: completions (+ optional chat) against
    ANY base_url speaking the OpenAI API — including this repo's own
    server.  Reference role: `lang/backend/openai.py` (the multi-backend
    interpreter's second family; select scores ride the standard
    echo+logprobs completions trick)."""

    def __init__(self, base_url: str, model: str = "default",
                 api_key: str = "", chat: bool = False,
                 timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.chat = chat
        self.timeout = timeout

    def _post(self, path: str, payload: dict) -> dict:
        import httpx

        headers = (
            {"Authorization": f"Bearer {self.api_key}"} if self.api_key
            else {}
        )
        r = httpx.post(self.base_url + path, json=payload, headers=headers,
                       timeout=self.timeout)
        r.raise_for_status()
        return r.json()

    def _params(self, sampling_params: dict) -> dict:
        sp = dict(sampling_params)
        out = {
            "model": self.model,
            "max_tokens": sp.pop("max_new_tokens", 16),
            "temperature": sp.pop("temperature", 0.0),
        }
        if sp.get("stop"):
            out["stop"] = sp["stop"]
        if sp.get("top_p") is not None and "top_p" in sp:
            out["top_p"] = sp["top_p"]
        return out

    def generate(self, prompt: str, sampling_params: dict) -> str:
        payload = self._params(sampling_params)
        if self.chat:
            payload["messages"] = [{"role": "user", "content": prompt}]
            out = self._post("/v1/chat/completions", payload)
            return out["choices"][0]["message"]["content"] or ""
        payload["prompt"] = prompt
        out = self._post("/v1/completions", payload)
        return out["choices"][0]["text"]

    def score_continuations(self, prompt: str,
                            choices: List[str]) -> List[float]:
        scores = []
        for c in choices:
            out = self._post("/v1/completions", {
                "model": self.model,
                "prompt": prompt + c,
                "max_tokens": 1,
                "temperature": 0.0,
                "echo": True,
                "logprobs": 1,
            })
            lp = out["choices"][0].get("logprobs") or {}
            toks = lp.get("tokens") or []
            vals = lp.get("token_logprobs") or []
            # echo lists prompt tokens then the generated ones — drop the
            # generated tail, we score the prompt's choice region only
            n_gen = (out.get("usage") or {}).get("completion_tokens", 1)
            if n_gen:
                toks, vals = toks[:-n_gen], vals[:-n_gen]
            # walk back until the decoded tail covers the choice text —
            # exact up to the single token straddling the boundary
            covered, score = 0, 0.0
            for t, v in zip(reversed(toks), reversed(vals)):
                if covered >= len(c):
                    break
                covered += len(t)
                if v is not None:
                    score += v
            scores.append(score)
        return scores


# ---------------------------------------------------------------------------
# program state
# ---------------------------------------------------------------------------


class ProgramState:
    def __init__(self, backend):
        self.backend = backend
        self.text = ""
        self.vars: Dict[str, Any] = {}
        self._lock = threading.Lock()

    # `s += expr`
    def __iadd__(self, other):
        self._append(other)
        return self

    def _append(self, other):
        if isinstance(other, str):
            self.text += other
        elif isinstance(other, SglGen):
            self._run_gen(other)
        elif isinstance(other, SglSelect):
            self._run_select(other)
        elif isinstance(other, SglRole):
            self.text += f"{other.role}: "
            for part in other.parts:
                self._append(part)
            self.text += "\n"
        else:
            raise TypeError(f"cannot append {type(other)} to program state")

    def _run_gen(self, g: SglGen):
        out = self.backend.generate(self.text, g.sampling_params())
        if g.name:
            self.vars[g.name] = out
        self.text += out

    def _run_select(self, sel: SglSelect):
        scores = self.backend.score_continuations(self.text, sel.choices)
        best = max(range(len(sel.choices)), key=lambda i: scores[i])
        choice = sel.choices[best]
        if sel.name:
            self.vars[sel.name] = choice
        self.text += choice

    def fork(self, n: int) -> List["ProgramState"]:
        out = []
        for _ in range(n):
            c = ProgramState(self.backend)
            c.text = self.text
            c.vars = dict(self.vars)
            out.append(c)
        return out

    def __getitem__(self, name: str):
        return self.vars[name]

    def __contains__(self, name: str) -> bool:
        return name in self.vars


# ---------------------------------------------------------------------------
# @sgl.function
# ---------------------------------------------------------------------------


class SglFunction:
    def __init__(self, fn: Callable):
        self.fn = fn

    def run(self, *args, backend=None, **kwargs) -> ProgramState:
        backend = backend or _DEFAULT_BACKEND
        if backend is None:
            raise ValueError("no backend: pass backend= or set_default_backend")
        s = ProgramState(backend)
        self.fn(s, *args, **kwargs)
        return s

    def run_batch(self, batch: List[dict], backend=None,
                  max_workers: int = 8) -> List[ProgramState]:
        """Run kwargs-dicts in parallel (the engine batches them; shared
        prefixes dedup through the radix cache)."""
        backend = backend or _DEFAULT_BACKEND
        with concurrent.futures.ThreadPoolExecutor(max_workers) as ex:
            futs = [ex.submit(self.run, backend=backend, **kw) for kw in batch]
            return [f.result() for f in futs]

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


def function(fn: Callable) -> SglFunction:
    return SglFunction(fn)
