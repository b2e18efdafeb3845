"""Tokenizer manager: request intake, tokenization, response assembly.

Role model: reference `TokenizerManager`
(`python/sglang/srt/managers/tokenizer_manager.py:414` generate_request,
`ReqState:123` per-request futures).  In-process variant: requests flow to
the scheduler thread via a queue; token outputs come back through per-rid
subscriber queues; this class tokenizes, detokenizes incrementally, applies
stop strings, and assembles the reference's meta_info schema.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
import uuid
from typing import Any, Dict, List, Optional

from sglang_awq_tpu.managers.detokenizer import (
    IncrementalDetokenizer,
    find_stop_string,
    partial_stop_suffix_len,
)
from sglang_awq_tpu.managers.schedule_batch import Req
from sglang_awq_tpu.sampling.sampling_params import SamplingParams


@dataclasses.dataclass
class GenerateReqInput:
    """Reference io_struct.GenerateReqInput:158 subset (text OR input_ids)."""

    text: Optional[str] = None
    input_ids: Optional[List[int]] = None
    sampling_params: Optional[Dict[str, Any]] = None
    rid: Optional[str] = None
    stream: bool = False
    return_logprob: bool = False
    logprob_start_len: int = -1  # >= 0: also score prompt tokens from here
    session_params: Optional[Dict[str, Any]] = None  # {"id": session_id}
    is_embedding: bool = False
    # multimodal: [T, H] float embeddings replacing token lookup (reference
    # GenerateReqInput.input_embeds); prompt tokens become placeholders
    input_embeds: Optional[Any] = None
    # multimodal images (VLM models): list of PIL images / [H, W, 3] uint8 /
    # pre-processed [3, S, S] float arrays.  The engine's mm hook encodes
    # them and splices the features over the prompt's image-token runs.
    images: Optional[list] = None

    def normalize(self):
        if self.rid is None:
            self.rid = uuid.uuid4().hex
        if self.sampling_params is None:
            self.sampling_params = {}


class ReqState:
    """Per-request in-flight state + output queue."""

    def __init__(self, req: Req, detok: IncrementalDetokenizer):
        self.req = req
        self.detok = detok
        self.out_queue: "queue.Queue[Optional[dict]]" = queue.Queue()
        self.created_time = time.monotonic()
        self.finished = False
        self.text = ""
        self.held_text = ""  # possible partial stop-string suffix
        self.token_logprobs = []  # accumulated (logprob, token_id, text)
        self.top_logprobs = []


class ReqStateGroup:
    """n > 1 parallel samples: one group of independent child requests (the
    prefix cache dedups their prompt KV).  Reference n>1 handling role."""

    def __init__(self, children):
        self.children = children


class TokenizerManager:
    def __init__(
        self,
        tokenizer,
        eos_token_ids: set,
        scheduler_submit,
        scheduler_abort,
        vocab_size: int = 0,
        mm_embed=None,  # callable(images, input_ids) -> [T, H] f32 embeds
    ):
        from sglang_awq_tpu.managers.session_controller import SessionController

        self.sessions = SessionController()
        self.vocab_size = vocab_size
        self.tokenizer = tokenizer
        self.mm_embed = mm_embed
        self.eos_token_ids = set(eos_token_ids)
        if tokenizer is not None and tokenizer.eos_token_id is not None:
            self.eos_token_ids.add(tokenizer.eos_token_id)
        self._submit = scheduler_submit  # callable(Req)
        self._abort = scheduler_abort  # callable(rid)
        self.states: Dict[str, ReqState] = {}
        self.lock = threading.Lock()

    # ------------------------------------------------------------------

    def create_request(self, gin: GenerateReqInput, submit: bool = True):
        gin.normalize()
        n = int((gin.sampling_params or {}).get("n", 1) or 1)
        if n > 1:
            children = []
            for i in range(n):
                child_sp = dict(gin.sampling_params)
                child_sp["n"] = 1
                if child_sp.get("seed") is not None:
                    child_sp["seed"] = int(child_sp["seed"]) + i
                child = GenerateReqInput(
                    text=gin.text,
                    input_ids=gin.input_ids,
                    sampling_params=child_sp,
                    rid=f"{gin.rid}-{i}",
                    stream=gin.stream,
                    return_logprob=gin.return_logprob,
                    session_params=gin.session_params if i == 0 else None,
                    is_embedding=gin.is_embedding,
                )
                children.append(self.create_request(child))
            return ReqStateGroup(children)
        from sglang_awq_tpu.tracing import (
            trace_req_start,
            trace_slice_end,
            trace_slice_start,
            tracing_enabled,
        )

        if tracing_enabled():
            trace_req_start(gin.rid, stream=bool(gin.stream))
            trace_slice_start(gin.rid, "tokenize")
        sp = SamplingParams.from_dict(gin.sampling_params)
        # the top-level flag mirrors the reference API; the scheduler reads
        # it from sampling_params, so fold it in here
        if gin.return_logprob:
            sp.return_logprob = True
        if gin.logprob_start_len >= 0:
            sp.return_logprob = True
            sp.logprob_start_len = gin.logprob_start_len
        if gin.images:
            if self.mm_embed is None:
                raise ValueError("model does not support image inputs")
            if gin.input_ids is None:
                if self.tokenizer is None:
                    raise ValueError("no tokenizer loaded; pass input_ids")
                gin.input_ids = self.tokenizer.encode(gin.text)
            res = self.mm_embed(gin.images, list(gin.input_ids))
            if isinstance(res, tuple):
                gin.input_embeds, gin._mm_extras = res
            else:
                gin.input_embeds = res
            gin.input_ids = None
        if gin.input_embeds is not None:
            import numpy as _np

            emb = _np.asarray(gin.input_embeds, _np.float32)
            if emb.ndim != 2:
                raise ValueError("input_embeds must be [T, hidden_size]")
            ids = [0] * emb.shape[0]
        elif gin.input_ids is not None:
            ids = list(gin.input_ids)
        else:
            if self.tokenizer is None:
                raise ValueError("no tokenizer loaded; pass input_ids")
            ids = self.tokenizer.encode(gin.text)
        if len(ids) == 0:
            raise ValueError("empty prompt")
        if self.vocab_size and (min(ids) < 0 or max(ids) >= self.vocab_size):
            raise ValueError(
                f"input_ids out of range [0, {self.vocab_size}): "
                f"min={min(ids)} max={max(ids)}"
            )
        session_id = (gin.session_params or {}).get("id")
        session_ctx_len = 0
        if session_id:
            ctx = self.sessions.get_context(session_id)
            session_ctx_len = len(ctx)
            ids = ctx + ids
        req = Req(
            rid=gin.rid,
            input_ids=ids,
            sampling_params=sp,
            stream=gin.stream,
            eos_token_ids=self.eos_token_ids,
        )
        if sp.regex or sp.json_schema or sp.ebnf or sp.structural_tag:
            if self.tokenizer is None:
                raise ValueError("structured output requires a tokenizer")
            from sglang_awq_tpu.constrained import GrammarMatcher, compile_grammar

            if sp.regex:
                kind, spec_src = "regex", sp.regex
            elif sp.json_schema:
                kind, spec_src = "json_schema", sp.json_schema
            elif sp.structural_tag:
                kind, spec_src = "structural_tag", sp.structural_tag
            else:
                kind, spec_src = "ebnf", sp.ebnf
            compiled = compile_grammar(
                kind, spec_src, self.tokenizer, self.vocab_size, self.eos_token_ids
            )
            req.grammar = GrammarMatcher(compiled)
        else:
            req.grammar = None
        detok = IncrementalDetokenizer(
            self.tokenizer, skip_special_tokens=sp.skip_special_tokens
        )
        req.is_embedding = gin.is_embedding
        if gin.input_embeds is not None:
            import numpy as _np

            req.input_embeds = _np.asarray(gin.input_embeds, _np.float32)
            extras = getattr(gin, "_mm_extras", None)
            if extras and "mrope_positions" in extras:
                # mrope (Qwen2-VL family): [3, T] prompt position streams +
                # the decode offset delta
                req.mrope_positions = _np.asarray(
                    extras["mrope_positions"], _np.int32)
                req.mrope_delta = int(extras["mrope_delta"])
            if extras and "mm_spans" in extras:
                # Gemma3-mm bidirectional image spans [(start, end), ...]
                req.mm_spans = list(extras["mm_spans"])
        state = ReqState(req, detok)
        state.session_id = session_id
        state.session_ctx_len = session_ctx_len
        with self.lock:
            self.states[gin.rid] = state
        if tracing_enabled():
            trace_slice_end(gin.rid, "tokenize", prompt_tokens=len(ids))
        if submit:
            if tracing_enabled():
                trace_slice_start(gin.rid, "queue")
            self._submit(req)
        return state

    def abort_request(self, rid: str):
        self._abort(rid)

    # called from the scheduler thread with each ReqOutput
    def on_output(self, out) -> None:
        with self.lock:
            state = self.states.get(out.rid)
        if state is None or state.finished:
            return
        if out.new_logprobs:
            state.token_logprobs.extend(
                (lp, tok, None) for lp, tok in zip(out.new_logprobs, out.new_tokens)
            )
            state.top_logprobs.extend(out.new_top_logprobs)
        new_text = state.detok.append(out.new_tokens)
        if out.finished:
            new_text += state.detok.flush()
        sp = state.req.sampling_params
        emit_finish = out.finished
        finish_reason = out.finish_reason
        matched_stop = None

        if new_text and sp.stop:
            candidate = state.held_text + new_text
            hit = find_stop_string(state.text + candidate, sp.stop)
            if hit is not None:
                pos, matched = hit
                full = (state.text + candidate)[:pos]
                new_text = full[len(state.text) :]
                state.held_text = ""
                emit_finish = True
                finish_reason = "stop"
                matched_stop = matched
                self._abort(out.rid)
            else:
                hold = partial_stop_suffix_len(candidate, sp.stop)
                if hold and not emit_finish:
                    state.held_text = candidate[len(candidate) - hold :]
                    new_text = candidate[: len(candidate) - hold]
                else:
                    state.held_text = ""
                    new_text = candidate
        elif state.held_text:
            new_text = state.held_text + new_text
            state.held_text = ""

        state.text += new_text
        chunk = {
            "rid": out.rid,
            "embedding": getattr(out, "embedding", None),
            "text": state.text,
            "delta": new_text,
            "output_ids": list(state.detok.ids),
            "meta_info": {
                "prompt_tokens": out.prompt_len,
                "completion_tokens": out.output_len,
                "cached_tokens": out.cached_tokens,
                "output_token_logprobs": list(state.token_logprobs) or None,
                "output_top_logprobs": list(state.top_logprobs) or None,
                "input_token_logprobs": getattr(
                    out, "input_token_logprobs", None
                ),
                "input_top_logprobs": getattr(out, "input_top_logprobs", None),
                "finish_reason": (
                    {"type": finish_reason, "matched": matched_stop}
                    if emit_finish
                    else None
                ),
            },
            "finished": emit_finish,
        }
        state.out_queue.put(chunk)
        if emit_finish:
            sid = getattr(state, "session_id", None)
            if sid:
                # session history gains this turn's new input + the output
                new_in = state.req.input_ids[getattr(state, "session_ctx_len", 0):]
                self.sessions.append(sid, list(new_in) + list(state.req.output_ids))
            state.finished = True
            state.out_queue.put(None)  # sentinel

    # ------------------------------------------------------------------

    def wait_response(self, state, timeout: float = 3600.0) -> dict:
        """Blocking collect (non-stream path)."""
        if isinstance(state, ReqStateGroup):
            return {"__multi__": [self.wait_response(c, timeout) for c in state.children]}
        last = None
        while True:
            item = state.out_queue.get(timeout=timeout)
            if item is None:
                break
            last = item
        self._drop(state)
        assert last is not None, "request produced no output"
        return last

    def stream_responses(self, state: ReqState, timeout: float = 3600.0):
        while True:
            item = state.out_queue.get(timeout=timeout)
            if item is None:
                break
            yield item
        self._drop(state)

    def _drop(self, state: ReqState):
        with self.lock:
            self.states.pop(state.req.rid, None)
