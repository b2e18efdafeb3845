"""HTTP server (aiohttp).

Role model: reference `python/sglang/srt/entrypoints/http_server.py` (FastAPI
app, SURVEY.md §2.1 endpoint list and §A.7 parity checklist).  Built on
aiohttp (async-native; FastAPI/uvicorn are not in the image).

Native endpoints: /generate, /health, /health_generate, /get_server_info,
/flush_cache, /abort_request, /get_model_info
OpenAI endpoints: /v1/completions, /v1/chat/completions, /v1/models
(streaming via SSE with usage chunks).
"""

from __future__ import annotations

import asyncio
import json
import logging
import uuid
from typing import Any, Dict, Optional

from aiohttp import web

from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest,
    CompletionRequest,
    ResponsesRequest,
    chat_response,
    completion_response,
    responses_response,
    usage_dict,
)
from sglang_awq_tpu.managers.tokenizer_manager import GenerateReqInput
from sglang_awq_tpu.server_args import ServerArgs

logger = logging.getLogger(__name__)


class HttpServer:
    def __init__(self, engine: Engine):
        self.engine = engine
        middlewares = []
        api_key = engine.server_args.api_key
        if api_key:

            @web.middleware
            async def auth(request, handler):
                if request.path in ("/health", "/metrics"):
                    return await handler(request)
                tok = request.headers.get("Authorization", "")
                if tok != f"Bearer {api_key}":
                    return web.json_response(
                        {"error": {"message": "invalid api key",
                                   "type": "authentication_error"}},
                        status=401,
                    )
                return await handler(request)

            middlewares.append(auth)
        self.app = web.Application(
            client_max_size=64 * 1024 * 1024, middlewares=middlewares
        )
        # SSE pump pool: every in-flight streaming request parks one thread
        # on its output queue.  asyncio's DEFAULT executor caps at
        # ~cpu_count+4 threads, which silently serializes concurrent
        # streams (measured: 128-way saturation ran ~12 requests at a time,
        # ITL p99 in seconds).  Blocked queue.get threads are cheap — size
        # the pool for full concurrency.
        import concurrent.futures

        self._pump = concurrent.futures.ThreadPoolExecutor(
            max_workers=1024, thread_name_prefix="sse-pump"
        )
        self._add_routes()

    def _add_routes(self):
        r = self.app.router
        r.add_get("/health", self.health)
        r.add_get("/health_generate", self.health_generate)
        r.add_get("/get_server_info", self.get_server_info)
        r.add_get("/get_model_info", self.get_model_info)
        r.add_post("/generate", self.generate)
        r.add_post("/flush_cache", self.flush_cache)
        r.add_post("/abort_request", self.abort_request)
        r.add_post("/update_weights_from_disk", self.update_weights_from_disk)
        r.add_post("/open_session", self.open_session)
        r.add_post("/close_session", self.close_session)
        r.add_post("/v1/completions", self.v1_completions)
        r.add_post("/v1/chat/completions", self.v1_chat_completions)
        r.add_get("/v1/models", self.v1_models)
        r.add_post("/v1/embeddings", self.v1_embeddings)
        r.add_post("/encode", self.encode)
        r.add_get("/metrics", self.metrics)
        r.add_get("/get_trace", self.get_trace)
        r.add_post("/start_profile", self.start_profile)
        r.add_post("/stop_profile", self.stop_profile)
        r.add_post("/save_weights_snapshot", self.save_weights_snapshot)
        r.add_post("/v1/responses", self.v1_responses)
        r.add_post("/v1/score", self.v1_score)
        r.add_post("/v1/rerank", self.v1_rerank)
        r.add_post("/tokenize", self.tokenize)
        r.add_post("/detokenize", self.detokenize)
        # Ollama compatibility (reference entrypoints/ollama_compat role)
        r.add_post("/api/generate", self.ollama_generate)
        r.add_post("/api/chat", self.ollama_chat)
        r.add_get("/api/tags", self.ollama_tags)
        # PD disaggregation (reference srt/disaggregation role)
        r.add_post("/pd/prefill", self.pd_prefill)
        r.add_post("/pd/receive", self.pd_receive)
        # EPLB (reference srt/eplb/ expert-distribution endpoints)
        r.add_post("/start_expert_distribution_record",
                   self.start_expert_distribution_record)
        r.add_post("/stop_expert_distribution_record",
                   self.stop_expert_distribution_record)
        r.add_post("/dump_expert_distribution", self.dump_expert_distribution)
        r.add_post("/rebalance_experts", self.rebalance_experts)

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------

    async def _collect(self, state) -> dict:
        from sglang_awq_tpu.managers.tokenizer_manager import ReqStateGroup

        if isinstance(state, ReqStateGroup):
            outs = [await self._collect(c) for c in state.children]
            return {"__multi__": outs}
        loop = asyncio.get_running_loop()
        last = None
        while True:
            item = await loop.run_in_executor(self._pump, state.out_queue.get)
            if item is None:
                break
            last = item
        self.engine.tokenizer_manager._drop(state)
        if last is None:
            raise web.HTTPInternalServerError(text="request produced no output")
        return last

    async def _iter_chunks(self, state):
        loop = asyncio.get_running_loop()
        while True:
            item = await loop.run_in_executor(self._pump, state.out_queue.get)
            if item is None:
                break
            yield item
        self.engine.tokenizer_manager._drop(state)

    def _submit(self, gin: GenerateReqInput):
        try:
            return self.engine.tokenizer_manager.create_request(gin)
        except ValueError as e:
            raise web.HTTPBadRequest(
                text=json.dumps({"error": {"message": str(e), "type": "invalid_request_error"}}),
                content_type="application/json",
            )

    # ------------------------------------------------------------------
    # native endpoints
    # ------------------------------------------------------------------

    async def health(self, request: web.Request) -> web.Response:
        return web.Response(text="OK")

    async def metrics(self, request: web.Request) -> web.Response:
        return web.Response(
            body=self.engine.scheduler.metrics.render(),
            content_type="text/plain",
        )

    async def get_trace(self, request: web.Request) -> web.Response:
        """Recent finished request traces (requires --enable-trace)."""
        from sglang_awq_tpu.tracing import tracing_enabled
        from sglang_awq_tpu.tracing.trace import trace_recent

        if not tracing_enabled():
            return web.json_response(
                {"error": "tracing disabled (--enable-trace)"}, status=400
            )
        n = int(request.query.get("n", "32"))
        return web.json_response({"traces": trace_recent(n)})

    async def health_generate(self, request: web.Request) -> web.Response:
        """Schedules a REAL 1-token generation (reference http_server.py:442)."""
        gin = GenerateReqInput(
            input_ids=[1],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True},
        )
        state = self._submit(gin)
        try:
            await asyncio.wait_for(self._collect(state), timeout=60)
        except asyncio.TimeoutError:
            return web.Response(status=503, text="generation timed out")
        return web.Response(text="OK")

    async def get_server_info(self, request: web.Request) -> web.Response:
        return web.json_response(self.engine.get_server_info())

    async def get_model_info(self, request: web.Request) -> web.Response:
        mc = self.engine.runner.model_config
        return web.json_response(
            {
                "model_path": mc.model_path,
                "tokenizer_path": self.engine.server_args.tokenizer_path,
                "is_generation": True,
                "context_length": mc.context_length,
            }
        )

    async def generate(self, request: web.Request) -> web.StreamResponse:
        body = await request.json()
        gin = GenerateReqInput(
            text=body.get("text"),
            input_ids=body.get("input_ids"),
            input_embeds=body.get("input_embeds"),
            images=_decode_images(body.get("image_data")),
            sampling_params=body.get("sampling_params"),
            rid=body.get("rid"),
            stream=bool(body.get("stream", False)),
            return_logprob=bool(body.get("return_logprob", False)),
            logprob_start_len=int(body.get("logprob_start_len", -1)),
            session_params=body.get("session_params"),
        )
        state = self._submit(gin)
        if not gin.stream:
            out = await self._collect(state)
            return web.json_response(self._native_payload(out))
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        async for chunk in self._iter_chunks(state):
            payload = json.dumps(self._native_payload(chunk))
            await resp.write(f"data: {payload}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _native_payload(self, out: dict) -> dict:
        return {
            "text": out["text"],
            "output_ids": out["output_ids"],
            "meta_info": {**out["meta_info"], "id": out["rid"]},
        }

    def _encode(self, x):
        if isinstance(x, list) and (not x or isinstance(x[0], int)):
            return list(x)
        tok = self.engine.tokenizer_manager.tokenizer
        if tok is None:
            raise ValueError("text scoring requires a tokenizer")
        return tok.encode(x)

    async def _score_one(self, ids, start_len):
        """Input logprobs of ids[start_len+1:] -> list[(lp, token)]."""
        gin = GenerateReqInput(
            input_ids=ids,
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                             "ignore_eos": True},
            return_logprob=True,
            logprob_start_len=start_len,
        )
        out = await self._collect(self._submit(gin))
        return out["meta_info"]["input_token_logprobs"] or []

    async def v1_score(self, request: web.Request) -> web.Response:
        """Probability of label tokens following (query + item) pairs
        (reference score_request, tokenizer_manager_multiitem_mixin.py:155 —
        single-item mode).  Scored through the prompt-logprob machinery:
        each label is appended and its logprob read at the last position;
        the shared (query + item) prefix rides the radix cache."""
        import math

        try:
            body = await request.json()
            labels = body["label_token_ids"]
            q = self._encode(body.get("query") or [])
            items = body.get("items")
            if isinstance(items, str):
                items = [items]
            items_ids = [self._encode(it) for it in (items or [])]
            item_first = bool(body.get("item_first", False))
        except Exception as e:  # noqa: BLE001
            return self._openai_error(str(e))
        vocab = self.engine.runner.model_config.vocab_size
        if any(not (0 <= t < vocab) for t in labels):
            return self._openai_error("label token id out of vocabulary")

        scores = []
        for it in items_ids:
            base = (it + q) if item_first else (q + it)
            lps = []
            for lab in labels:
                got = await self._score_one(base + [lab], len(base) - 1)
                # last scored token is the label
                lps.append(got[-1][0] if got else float("-inf"))
            if body.get("apply_softmax"):
                m = max(lps)
                exps = [math.exp(v - m) for v in lps]
                z = sum(exps) or 1.0
                scores.append([e / z for e in exps])
            else:
                scores.append([math.exp(v) for v in lps])
        return web.json_response({"scores": scores, "object": "scoring"})

    async def v1_rerank(self, request: web.Request) -> web.Response:
        """Rank documents by generative likelihood: mean per-token prompt
        logprob of the document given the query (reference /v1/rerank role;
        cross-encoder checkpoints are out of scope — this is the
        LM-likelihood variant, which the same API shape serves)."""
        try:
            body = await request.json()
            q = self._encode(body["query"])
            docs = body["documents"]
        except Exception as e:  # noqa: BLE001
            return self._openai_error(str(e))
        results = []
        for i, d in enumerate(docs):
            ids = q + self._encode(d)
            got = await self._score_one(ids, len(q) - 1)
            lp = sum(v for v, _ in got) / max(len(got), 1)
            results.append({"score": lp, "document": d, "index": i})
        results.sort(key=lambda r: -r["score"])
        return web.json_response(results)

    async def save_weights_snapshot(self, request: web.Request) -> web.Response:
        """Write a sharded native checkpoint (reloadable through
        /update_weights_from_disk) — reference sharded-save role."""
        try:
            body = await request.json()
            path = body["path"]
        except Exception as e:  # noqa: BLE001
            return self._openai_error(str(e))
        loop = asyncio.get_running_loop()
        ok, msg = await loop.run_in_executor(
            None, self.engine.save_weights_snapshot, path
        )
        return web.json_response({"success": ok, "message": msg},
                                 status=200 if ok else 500)

    async def start_profile(self, request: web.Request) -> web.Response:
        """Start a jax.profiler trace (reference /start_profile ->
        torch.profiler; serves TensorBoard-compatible traces)."""
        try:
            body = await request.json()
        except Exception:
            body = {}
        out_dir = body.get("output_dir") or "/tmp/sglt_profile"
        if getattr(self, "_profiling", False):
            return web.json_response(
                {"success": False, "message": "already profiling"}, status=409
            )
        import jax

        jax.profiler.start_trace(out_dir)
        self._profiling = True
        self._profile_dir = out_dir
        return web.json_response({"success": True, "output_dir": out_dir})

    async def stop_profile(self, request: web.Request) -> web.Response:
        if not getattr(self, "_profiling", False):
            return web.json_response(
                {"success": False, "message": "not profiling"}, status=409
            )
        import jax

        jax.profiler.stop_trace()
        self._profiling = False
        return web.json_response(
            {"success": True, "output_dir": self._profile_dir}
        )

    async def flush_cache(self, request: web.Request) -> web.Response:
        ok = self.engine.flush_cache()
        return web.Response(
            status=200 if ok else 503,
            text="Cache flushed.\n" if ok else "Cache not flushed (requests in flight).\n",
        )

    async def open_session(self, request: web.Request) -> web.Response:
        body = await request.json() if request.can_read_body else {}
        try:
            sid = self.engine.tokenizer_manager.sessions.open_session(
                (body or {}).get("session_id")
            )
        except ValueError as e:
            return web.json_response({"error": str(e)}, status=400)
        return web.json_response(sid)

    async def close_session(self, request: web.Request) -> web.Response:
        body = await request.json()
        self.engine.tokenizer_manager.sessions.close_session(body.get("session_id"))
        return web.Response(text="OK")

    async def update_weights_from_disk(self, request: web.Request) -> web.Response:
        body = await request.json()
        path = body.get("model_path")
        if not path:
            return web.json_response(
                {"success": False, "message": "model_path required"}, status=400
            )
        loop = asyncio.get_running_loop()
        ok, msg = await loop.run_in_executor(
            None, self.engine.update_weights_from_disk, path
        )
        return web.json_response(
            {"success": ok, "message": msg}, status=200 if ok else 400
        )

    # -- EPLB (eplb/expert_distribution.py; toggles run on the scheduler
    # thread because they clear the runner's jit cache) -----------------

    def _eplb_call(self, fn):
        out = {}

        def do():
            try:
                out["result"] = fn()
            except Exception as e:  # noqa: BLE001
                out["error"] = str(e)

        self.engine.run_on_scheduler(do)
        return out

    async def start_expert_distribution_record(self, request) -> web.Response:
        loop = asyncio.get_running_loop()
        out = await loop.run_in_executor(
            None, self._eplb_call,
            self.engine.runner.start_expert_distribution_record,
        )
        if "error" in out:
            return web.json_response({"error": out["error"]}, status=400)
        return web.Response(text="OK")

    async def stop_expert_distribution_record(self, request) -> web.Response:
        loop = asyncio.get_running_loop()
        await loop.run_in_executor(
            None, self._eplb_call,
            self.engine.runner.stop_expert_distribution_record,
        )
        return web.Response(text="OK")

    async def dump_expert_distribution(self, request) -> web.Response:
        return web.json_response(self.engine.runner.dump_expert_distribution())

    async def rebalance_experts(self, request) -> web.Response:
        loop = asyncio.get_running_loop()
        out = await loop.run_in_executor(
            None, self._eplb_call, self.engine.runner.rebalance_experts
        )
        if "error" in out:
            return web.json_response({"error": out["error"]}, status=400)
        return web.json_response({"permutation": list(out["result"])})

    async def abort_request(self, request: web.Request) -> web.Response:
        body = await request.json()
        rid = body.get("rid")
        if rid:
            self.engine.abort_request(rid)
        return web.Response(text="OK")

    # ------------------------------------------------------------------
    # OpenAI endpoints
    # ------------------------------------------------------------------

    async def encode(self, request: web.Request) -> web.Response:
        """Native embedding endpoint (reference http_server.py /encode)."""
        body = await request.json()
        gin = GenerateReqInput(
            text=body.get("text"),
            input_ids=body.get("input_ids"),
            sampling_params={"max_new_tokens": 0},
            is_embedding=True,
        )
        state = self._submit(gin)
        out = await self._collect(state)
        return web.json_response(
            {"embedding": out["embedding"], "meta_info": out["meta_info"]}
        )

    async def v1_embeddings(self, request: web.Request) -> web.Response:
        body = await request.json()
        inputs = body.get("input")
        if isinstance(inputs, str):
            inputs = [inputs]
        elif inputs and isinstance(inputs[0], int):
            inputs = [inputs]
        model = body.get("model") or self.engine.server_args.served_model_name
        data = []
        total_tokens = 0
        for i, item in enumerate(inputs or []):
            gin = GenerateReqInput(
                text=item if isinstance(item, str) else None,
                input_ids=item if isinstance(item, list) else None,
                sampling_params={"max_new_tokens": 0},
                is_embedding=True,
            )
            state = self._submit(gin)
            out = await self._collect(state)
            total_tokens += out["meta_info"]["prompt_tokens"]
            data.append(
                {"object": "embedding", "index": i, "embedding": out["embedding"]}
            )
        return web.json_response(
            {
                "object": "list",
                "data": data,
                "model": model,
                "usage": {"prompt_tokens": total_tokens, "total_tokens": total_tokens},
            }
        )

    async def v1_models(self, request: web.Request) -> web.Response:
        sa = self.engine.server_args
        return web.json_response(
            {
                "object": "list",
                "data": [
                    {
                        "id": sa.served_model_name,
                        "object": "model",
                        "created": 0,
                        "owned_by": "sglang_awq_tpu",
                        "max_model_len": self.engine.runner.model_config.context_length,
                    }
                ],
            }
        )

    async def pd_prefill(self, request: web.Request) -> web.Response:
        """PREFILL role: compute the prompt KV + first token, export the
        page-aligned KV for a decode server (disaggregation/pd.py)."""
        body = await request.json()
        sp = dict(body.get("sampling_params") or {})
        full_sp = dict(sp)
        sp["max_new_tokens"] = 1
        gin = GenerateReqInput(
            text=body.get("text"), input_ids=body.get("input_ids"),
            sampling_params=sp,
        )
        state = self._submit(gin)
        out = await self._collect(state)
        prompt_ids = list(state.req.input_ids)
        finished_here = (
            (out["meta_info"]["finish_reason"] or {}).get("type") != "length"
            or int(full_sp.get("max_new_tokens", 128)) <= 1
        )
        transfer = None
        if not finished_here:
            from sglang_awq_tpu.disaggregation.pd import export_prefilled_kv

            loop = asyncio.get_running_loop()
            transfer = await loop.run_in_executor(
                None, export_prefilled_kv, self.engine, prompt_ids
            )
        resp_obj = {
            "prompt_ids": prompt_ids,
            "first_token": out["output_ids"][0] if out["output_ids"] else None,
            "finished": finished_here,
            "finish_payload": self._native_payload(out) if finished_here else None,
            "transfer": None,
        }
        if body.get("binary"):
            from sglang_awq_tpu.disaggregation.pd import frame_encode

            kv = b""
            if transfer is not None:
                resp_obj["transfer"] = {
                    k: v for k, v in transfer.items() if k != "kv_bytes"
                }
                kv = transfer["kv_bytes"]
            return web.Response(
                body=frame_encode(resp_obj, kv),
                content_type="application/octet-stream",
            )
        from sglang_awq_tpu.disaggregation.pd import transfer_to_json

        resp_obj["transfer"] = transfer_to_json(transfer)
        return web.json_response(resp_obj)

    async def pd_receive(self, request: web.Request) -> web.StreamResponse:
        """DECODE role: adopt a prefilled request (restore KV, emit the
        prefill-sampled token, continue decoding; stream SSE).  Accepts
        the binary PD frame (octet-stream) or legacy JSON+base64."""
        if request.content_type == "application/octet-stream":
            from sglang_awq_tpu.disaggregation.pd import frame_decode

            body, kv = frame_decode(await request.read())
            if body.get("transfer") is not None:
                body["transfer"]["kv_bytes"] = kv
        else:
            body = await request.json()
        gin = GenerateReqInput(
            input_ids=body["prompt_ids"],
            sampling_params=body.get("sampling_params"),
            stream=True,
        )
        tm = self.engine.tokenizer_manager
        state = tm.create_request(gin, submit=False)
        req = state.req
        first = int(body["first_token"])
        req.output_ids.append(first)
        req.check_finished(first)
        if req.grammar is not None:
            req.grammar.accept_token(first)

        from sglang_awq_tpu.disaggregation.pd import adopt_prefilled
        from sglang_awq_tpu.managers.scheduler import ReqOutput

        # surface the prefill-sampled token to the client stream
        tm.on_output(ReqOutput(req, [first]))
        if not req.finished():
            loop = asyncio.get_running_loop()
            adopted = False
            if body.get("transfer"):
                adopted = await loop.run_in_executor(
                    None, adopt_prefilled, self.engine, body["transfer"], req
                )
            if not adopted:
                # no transfer / no room: recompute the prompt locally
                self.engine._submit(req)
        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        async for chunk in self._iter_chunks(state):
            await resp.write(
                f"data: {json.dumps(self._native_payload(chunk))}\n\n".encode()
            )
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def tokenize(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            text = body["text"]
        except Exception as e:  # noqa: BLE001
            return self._openai_error(str(e))
        tok = self.engine.tokenizer_manager.tokenizer
        if tok is None:
            return self._openai_error("no tokenizer loaded", status=503)
        ids = tok.encode(text)
        return web.json_response({"tokens": ids, "count": len(ids)})

    async def detokenize(self, request: web.Request) -> web.Response:
        try:
            body = await request.json()
            ids = body["tokens"]
        except Exception as e:  # noqa: BLE001
            return self._openai_error(str(e))
        tok = self.engine.tokenizer_manager.tokenizer
        if tok is None:
            return self._openai_error("no tokenizer loaded", status=503)
        return web.json_response({"text": tok.decode(ids)})

    # ------------------------------------------------------------------
    # Ollama compatibility
    # ------------------------------------------------------------------

    def _ollama_opts(self, body: dict) -> dict:
        o = body.get("options") or {}
        return {
            "max_new_tokens": int(o.get("num_predict", 128)),
            "temperature": float(o.get("temperature", 0.8)),
            "top_p": float(o.get("top_p", 0.9)),
            "top_k": int(o.get("top_k", -1) or -1),
            "stop": o.get("stop"),
            "seed": o.get("seed"),
        }

    async def ollama_generate(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
        except Exception as e:  # noqa: BLE001
            return self._openai_error(str(e))
        gin = GenerateReqInput(
            text=body.get("prompt", ""),
            sampling_params=self._ollama_opts(body),
            stream=bool(body.get("stream", True)),
        )
        state = self._submit(gin)
        model = body.get("model") or self.engine.server_args.served_model_name
        if not gin.stream:
            out = await self._collect(state)
            return web.json_response({
                "model": model, "response": out["text"], "done": True,
                "done_reason": (out["meta_info"]["finish_reason"] or {}).get(
                    "type", "stop"),
                "prompt_eval_count": out["meta_info"]["prompt_tokens"],
                "eval_count": out["meta_info"]["completion_tokens"],
            })
        resp = web.StreamResponse(
            headers={"Content-Type": "application/x-ndjson"})
        await resp.prepare(request)
        async for chunk in self._iter_chunks(state):
            line = {"model": model, "response": chunk["delta"],
                    "done": chunk["finished"]}
            if chunk["finished"]:
                line["prompt_eval_count"] = chunk["meta_info"]["prompt_tokens"]
                line["eval_count"] = chunk["meta_info"]["completion_tokens"]
            await resp.write((json.dumps(line) + "\n").encode())
        await resp.write_eof()
        return resp

    async def ollama_chat(self, request: web.Request) -> web.StreamResponse:
        try:
            body = await request.json()
            messages = body["messages"]
        except Exception as e:  # noqa: BLE001
            return self._openai_error(str(e))
        text = "".join(
            f"{m.get('role', 'user')}: {m.get('content', '')}\n"
            for m in messages
        ) + "assistant:"
        gin = GenerateReqInput(
            text=text, sampling_params=self._ollama_opts(body),
            stream=bool(body.get("stream", True)),
        )
        state = self._submit(gin)
        model = body.get("model") or self.engine.server_args.served_model_name
        if not gin.stream:
            out = await self._collect(state)
            return web.json_response({
                "model": model,
                "message": {"role": "assistant", "content": out["text"]},
                "done": True,
            })
        resp = web.StreamResponse(
            headers={"Content-Type": "application/x-ndjson"})
        await resp.prepare(request)
        async for chunk in self._iter_chunks(state):
            line = {
                "model": model,
                "message": {"role": "assistant", "content": chunk["delta"]},
                "done": chunk["finished"],
            }
            await resp.write((json.dumps(line) + "\n").encode())
        await resp.write_eof()
        return resp

    async def ollama_tags(self, request: web.Request) -> web.Response:
        sa = self.engine.server_args
        return web.json_response({
            "models": [{
                "name": sa.served_model_name,
                "model": sa.served_model_name,
                "details": {"family": self.engine.runner.model_config.architecture},
            }]
        })

    def _completion_logprobs(self, o: dict, req, first_token=None) -> Optional[dict]:
        """OpenAI completions `logprobs` block: output tokens (+ prompt
        tokens when echo) with per-token logprob and top alternatives."""
        if req.logprobs is None:
            return None
        mi = o["meta_info"]
        tok = self.engine.tokenizer_manager.tokenizer
        dec = (lambda t: tok.decode([t])) if tok is not None else str
        tokens, token_logprobs, top_logprobs = [], [], []
        if req.echo and mi.get("input_token_logprobs") is not None:
            # first prompt token has no prefix -> null logprob
            tokens.append(dec(first_token) if first_token is not None else "")
            token_logprobs.append(None)
            top_logprobs.append(None)
            in_tops = mi.get("input_top_logprobs") or []
            for j, (lp, t) in enumerate(mi["input_token_logprobs"]):
                tokens.append(dec(t))
                token_logprobs.append(lp)
                top_logprobs.append(
                    {dec(k): v for k, v in in_tops[j].items()}
                    if j < len(in_tops) else None
                )
        for j, (lp, t, _) in enumerate(mi.get("output_token_logprobs") or []):
            tokens.append(dec(t))
            token_logprobs.append(lp)
            tops = (mi.get("output_top_logprobs") or [])
            top_logprobs.append(
                {dec(k): v for k, v in tops[j].items()} if j < len(tops) else None
            )
        return {
            "tokens": tokens,
            "token_logprobs": token_logprobs,
            "top_logprobs": top_logprobs,
            "text_offset": [0] * len(tokens),
        }

    async def v1_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            req = CompletionRequest(**await request.json())
        except Exception as e:
            return self._openai_error(str(e))
        prompt = req.prompt
        if req.suffix and isinstance(prompt, str):
            # fill-in-middle (reference code_completion_parser.py role):
            # the model's FIM sentinels frame prompt/suffix
            name = self.engine.server_args.completion_template
            if not name:
                return self._openai_error(
                    "suffix requires --completion-template "
                    "(deepseek_coder | star_coder | qwen_coder | codellama)")
            from sglang_awq_tpu.lang.completion_template import (
                completion_template_registry,
            )

            if name not in completion_template_registry:
                return self._openai_error(
                    f"unknown completion template {name!r}")
            prompt = completion_template_registry[name].render(
                prompt, req.suffix)
        gin_kwargs: Dict[str, Any] = {}
        if isinstance(prompt, str):
            gin_kwargs["text"] = prompt
        elif isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
            gin_kwargs["input_ids"] = prompt
        elif isinstance(prompt, list) and prompt and isinstance(prompt[0], str):
            gin_kwargs["text"] = prompt[0]  # batch-of-1 supported for now
        elif isinstance(prompt, list) and prompt and isinstance(prompt[0], list):
            gin_kwargs["input_ids"] = prompt[0]
        else:
            return self._openai_error("empty prompt")
        if req.stream and req.n > 1:
            return self._openai_error("streaming with n > 1 is not supported yet")
        gin = GenerateReqInput(
            sampling_params=req.to_sampling_params(), stream=req.stream, **gin_kwargs
        )
        state = self._submit(gin)
        model = req.model or self.engine.server_args.served_model_name

        if not req.stream:
            out = await self._collect(state)
            outs = out["__multi__"] if "__multi__" in out else [out]
            usage = usage_dict(
                outs[0]["meta_info"]["prompt_tokens"],
                sum(o["meta_info"]["completion_tokens"] for o in outs),
            )
            first_tok = None
            if req.echo and req.logprobs is not None:
                ids0 = gin_kwargs.get("input_ids")
                tok = self.engine.tokenizer_manager.tokenizer
                if ids0 is None and tok is not None:
                    ids0 = tok.encode(gin_kwargs.get("text", ""))
                first_tok = ids0[0] if ids0 else None
            echo = prompt if (req.echo and isinstance(prompt, str)) else ""
            resp = completion_response(
                outs[0]["rid"], model, outs[0]["text"],
                (outs[0]["meta_info"]["finish_reason"] or {}).get("type", "stop"),
                usage, echo,
            )
            resp["choices"] = [
                {
                    "index": i,
                    "text": echo + o["text"],
                    "logprobs": self._completion_logprobs(o, req, first_tok),
                    "finish_reason": (o["meta_info"]["finish_reason"] or {}).get("type", "stop"),
                }
                for i, o in enumerate(outs)
            ]
            return web.json_response(resp)

        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        rid = uuid.uuid4().hex
        async for chunk in self._iter_chunks(state):
            fr = (chunk["meta_info"]["finish_reason"] or {}).get("type") if chunk[
                "finished"
            ] else None
            data = {
                "id": f"cmpl-{rid}",
                "object": "text_completion",
                "created": 0,
                "model": model,
                "choices": [
                    {"index": 0, "text": chunk["delta"], "logprobs": None, "finish_reason": fr}
                ],
            }
            if chunk["finished"]:
                data["usage"] = usage_dict(
                    chunk["meta_info"]["prompt_tokens"],
                    chunk["meta_info"]["completion_tokens"],
                )
            await resp.write(f"data: {json.dumps(data)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    async def v1_responses(self, request: web.Request) -> web.StreamResponse:
        """OpenAI Responses API subset (reference http_server.py:1329):
        string/message-list input, instructions, max_output_tokens,
        streaming via response.output_text.delta events."""
        try:
            req = ResponsesRequest(**await request.json())
        except Exception as e:
            return self._openai_error(str(e))
        if req.previous_response_id:
            return self._openai_error(
                "previous_response_id is not supported (responses are "
                "not persisted)"
            )
        chat = ChatCompletionRequest(
            model=req.model,
            messages=req.to_messages(),
            max_tokens=req.max_output_tokens,
            temperature=req.temperature,
            top_p=req.top_p,
            stream=req.stream,
            tools=req.tools,
            tool_choice=req.tool_choice,
        )
        gin = self._chat_to_gin(chat)
        state = self._submit(gin)
        model = req.model or self.engine.server_args.served_model_name
        rid = uuid.uuid4().hex

        if not req.stream:
            out = await self._collect(state)
            usage = usage_dict(
                out["meta_info"]["prompt_tokens"],
                out["meta_info"]["completion_tokens"],
            )
            return web.json_response(
                responses_response(rid, model, out["text"], "completed", usage)
            )

        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream",
                     "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)

        async def emit(event: str, data: dict):
            await resp.write(
                f"event: {event}\ndata: {json.dumps(data)}\n\n".encode()
            )

        await emit("response.created",
                   {"type": "response.created",
                    "response": {"id": f"resp_{rid}", "status": "in_progress"}})
        text = ""
        usage = usage_dict(0, 0)
        async for chunk in self._iter_chunks(state):
            if chunk["delta"]:
                text += chunk["delta"]
                await emit(
                    "response.output_text.delta",
                    {"type": "response.output_text.delta",
                     "item_id": f"msg_{rid}", "output_index": 0,
                     "content_index": 0, "delta": chunk["delta"]},
                )
            if chunk["finished"]:
                usage = usage_dict(
                    chunk["meta_info"]["prompt_tokens"],
                    chunk["meta_info"]["completion_tokens"],
                )
        await emit(
            "response.completed",
            {"type": "response.completed",
             "response": responses_response(rid, model, text, "completed",
                                            usage)},
        )
        await resp.write_eof()
        return resp

    async def v1_chat_completions(self, request: web.Request) -> web.StreamResponse:
        try:
            req = ChatCompletionRequest(**await request.json())
        except Exception as e:
            return self._openai_error(str(e))
        gin = self._chat_to_gin(req)
        state = self._submit(gin)
        model = req.model or self.engine.server_args.served_model_name

        if not req.stream:
            out = await self._collect(state)
            outs = out["__multi__"] if "__multi__" in out else [out]
            usage = usage_dict(
                outs[0]["meta_info"]["prompt_tokens"],
                sum(o["meta_info"]["completion_tokens"] for o in outs),
            )
            resp = chat_response(
                outs[0]["rid"], model, outs[0]["text"],
                (outs[0]["meta_info"]["finish_reason"] or {}).get("type", "stop"),
                usage,
            )
            resp["choices"] = [
                self._chat_choice(i, o, req) for i, o in enumerate(outs)
            ]
            return web.json_response(resp)

        resp = web.StreamResponse(
            headers={"Content-Type": "text/event-stream", "Cache-Control": "no-cache"}
        )
        await resp.prepare(request)
        rid = uuid.uuid4().hex
        first = True
        rparser = None
        if self.engine.server_args.reasoning_parser:
            from sglang_awq_tpu.parser import ReasoningParser

            rparser = ReasoningParser(self.engine.server_args.reasoning_parser)
        tparser = None
        if req.tools and req.tool_choice != "none":
            from sglang_awq_tpu.function_call.parser import StreamingToolParser

            tparser = StreamingToolParser(
                req.tools, self.engine.server_args.tool_call_parser
            )
        sent_tool_calls = 0

        def tool_call_deltas(new_calls):
            nonlocal sent_tool_calls
            out = []
            for c in new_calls:
                out.append({
                    "index": sent_tool_calls,
                    "id": f"call_{uuid.uuid4().hex[:12]}",
                    "type": "function",
                    "function": {"name": c.name, "arguments": c.arguments},
                })
                sent_tool_calls += 1
            return out

        async for chunk in self._iter_chunks(state):
            delta: Dict[str, Any] = {"content": chunk["delta"]}
            if rparser is not None:
                r_delta, c_delta = rparser.parse_stream_chunk(chunk["delta"])
                delta = {}
                if r_delta:
                    delta["reasoning_content"] = r_delta
                if c_delta or not r_delta:
                    delta["content"] = c_delta
            if tparser is not None:
                # tool-call extraction rides the CONTENT stream (reasoning
                # text never carries calls, matching the reference order)
                text, new_calls = tparser.push(delta.pop("content", "") or "")
                if chunk["finished"]:
                    tail, more = tparser.flush()
                    text += tail
                    new_calls = list(new_calls) + list(more)
                if text:
                    delta["content"] = text
                tc = tool_call_deltas(new_calls)
                if tc:
                    delta["tool_calls"] = tc
            if first:
                delta["role"] = "assistant"
                first = False
            fr = (chunk["meta_info"]["finish_reason"] or {}).get("type") if chunk[
                "finished"
            ] else None
            if fr and sent_tool_calls:
                fr = "tool_calls"
            data = {
                "id": f"chatcmpl-{rid}",
                "object": "chat.completion.chunk",
                "created": 0,
                "model": model,
                "choices": [{"index": 0, "delta": delta, "finish_reason": fr}],
            }
            if chunk["finished"] and (req.stream_options or {}).get("include_usage"):
                data["usage"] = usage_dict(
                    chunk["meta_info"]["prompt_tokens"],
                    chunk["meta_info"]["completion_tokens"],
                )
            await resp.write(f"data: {json.dumps(data)}\n\n".encode())
        await resp.write(b"data: [DONE]\n\n")
        await resp.write_eof()
        return resp

    def _chat_choice(self, i: int, o: dict, req) -> dict:
        """One chat.completion choice; extracts tool calls when requested
        (reference srt/function_call detectors role)."""
        text = o["text"]
        fr = (o["meta_info"]["finish_reason"] or {}).get("type", "stop")
        message: Dict[str, Any] = {"role": "assistant", "content": text}
        if self.engine.server_args.reasoning_parser:
            from sglang_awq_tpu.parser import ReasoningParser

            rp = ReasoningParser(self.engine.server_args.reasoning_parser)
            reasoning, content = rp.parse(text)
            message["content"] = content
            if reasoning is not None:
                message["reasoning_content"] = reasoning
            text = content
        if req.tools and req.tool_choice != "none":
            from sglang_awq_tpu.function_call.parser import FunctionCallParser

            parser = FunctionCallParser(
                req.tools, self.engine.server_args.tool_call_parser
            )
            calls, normal = parser.parse(text)
            if calls:
                message["content"] = normal or None
                message["tool_calls"] = [
                    {
                        "id": f"call_{uuid.uuid4().hex[:12]}",
                        "type": "function",
                        "function": {"name": c.name, "arguments": c.arguments},
                    }
                    for c in calls
                ]
                fr = "tool_calls"
        return {
            "index": i,
            "message": message,
            "logprobs": None,
            "finish_reason": fr,
        }

    def _chat_to_gin(self, req: ChatCompletionRequest) -> GenerateReqInput:
        tok = self.engine.tokenizer_manager.tokenizer
        images = []

        def content_of(m):
            # multimodal content parts: image_url -> collected image + one
            # "<image>" placeholder (expanded to tokens_per_image by the
            # engine's mm hook)
            if isinstance(m.content, list):
                parts = []
                for p in m.content:
                    if p.get("type") == "text":
                        parts.append(p.get("text", ""))
                    elif p.get("type") == "image_url":
                        url = (p.get("image_url") or {}).get("url", "")
                        images.extend(_decode_images([url]) or [])
                        parts.append("<image>")
                return "".join(parts)
            return m.text()

        messages = [
            {"role": m.role, "content": content_of(m)} for m in req.messages
        ]
        sp = req.to_sampling_params()

        # --- tools: prompt injection + (optionally) grammar-forced calls ---
        if req.tools:
            from sglang_awq_tpu.function_call.parser import (
                forced_call_schema,
                tools_system_text,
            )

            forced = forced_call_schema(req.tools, req.tool_choice)
            if forced is not None:
                sp["json_schema"] = forced
            if req.tool_choice != "none":
                messages = [
                    {"role": "system", "content": tools_system_text(req.tools)}
                ] + messages

        # --- response_format (OpenAI structured outputs) ---
        rf = req.response_format or {}
        if rf.get("type") == "json_schema":
            import json as _json

            schema = (rf.get("json_schema") or {}).get("schema")
            if schema is not None:
                sp["json_schema"] = _json.dumps(schema)
        elif rf.get("type") == "json_object":
            sp.setdefault(
                "json_schema", '{"type": "object", "properties": {}}'
            )
        elif rf.get("type") == "structural_tag":
            import json as _json

            sp["structural_tag"] = _json.dumps(rf)

        tm = self._template_manager()
        if tok is not None:
            ids, stops = tm.render_ids(messages, tools=req.tools)
            if stops:
                cur = sp.get("stop") or []
                if isinstance(cur, str):
                    cur = [cur]
                sp["stop"] = list(cur) + [
                    s for s in stops if s not in cur]
            return GenerateReqInput(
                input_ids=list(ids), sampling_params=sp, stream=req.stream,
                images=images or None,
            )
        # no tokenizer at all (input_ids-only test engines): plain text
        text, stops = tm.render_text(messages)
        if stops:
            sp.setdefault("stop", list(stops))
        return GenerateReqInput(
            text=text, sampling_params=sp, stream=req.stream,
            images=images or None,
        )

    def _template_manager(self):
        tm = getattr(self, "_tm", None)
        if tm is None:
            from sglang_awq_tpu.managers.template_manager import (
                TemplateManager,
            )

            tm = self._tm = TemplateManager(
                self.engine.server_args.chat_template,
                self.engine.tokenizer_manager.tokenizer,
                self.engine.server_args.model_path,
            )
        return tm

    def _openai_error(self, message: str, status: int = 400) -> web.Response:
        return web.json_response(
            {"error": {"message": message, "type": "invalid_request_error"}},
            status=status,
        )


def _decode_images(image_data):
    """Reference /generate `image_data` field: base64 (or data-URL) encoded
    images, a single string or a list.  Nested float lists pass through as
    pre-processed pixel arrays (tests / numeric clients)."""
    if not image_data:
        return None
    import base64
    import io

    import numpy as np

    if not isinstance(image_data, list):
        image_data = [image_data]
    out = []
    for item in image_data:
        if isinstance(item, str):
            if item.startswith("data:"):
                item = item.split(",", 1)[1]
            from PIL import Image

            out.append(Image.open(io.BytesIO(base64.b64decode(item))))
        else:
            out.append(np.asarray(item, np.float32))
    return out


def build_app(engine: Engine) -> web.Application:
    return HttpServer(engine).app


def _warmup(engine: Engine):
    """Pre-compile the first-touch buckets so request #1 is not a multi-minute
    compile (reference entrypoints/warmup.py role).  Beyond the default
    greedy executables, also warms the common flag variants — logprobs and
    stochastic sampling with penalties — because executables key on those
    static flags and a mid-serving toggle would otherwise stall on a fresh
    remote compile."""
    variants = [
        {"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True},
        {"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True,
         "return_logprob": True},
        {"max_new_tokens": 2, "temperature": 0.8, "top_p": 0.9,
         "frequency_penalty": 0.1, "ignore_eos": True},
    ]
    if engine.tokenizer_manager.tokenizer is not None:
        # grammar path: compiles the two-phase constrained-overlap pair
        # (_decode_logits_fn + _sample_masked_fn); needs a tokenizer for
        # the token-trie masks
        variants.append(
            {"max_new_tokens": 2, "temperature": 0.0, "regex": r"[ab]+"}
        )
    for sp in variants:
        try:
            engine.generate(input_ids=[1, 2, 3], sampling_params=sp)
        except Exception:
            logger.exception("warmup variant %s failed (continuing)", sp)

    # --- bucket sweep: compile EVERY serving executable up front ---
    # Executables key on (token bucket | batch-size bucket, flags); a cold
    # bucket mid-serving stalls the whole loop on a fresh compile (measured
    # 2.5-15 s through the remote-compile path, dominating low-rate TTFT).
    # Reference discipline: cuda_graph_runner.py:189-216 captures all
    # bucket variants at startup.
    import threading
    import time as _time

    runner = engine.runner
    t0 = _time.time()
    sa = engine.server_args
    max_bs = sa.max_running_requests or max(runner.decode_bs_buckets)
    sweep_sp = {"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True}
    # extend token buckets (bs=1)
    for tq in runner.prefill_token_buckets:
        if tq < 8 or tq > (sa.chunked_prefill_size or 1 << 30):
            continue
        try:
            engine.generate(input_ids=[3] * (tq - 4),
                            sampling_params=dict(sweep_sp))
        except Exception:
            logger.exception("warmup extend tq=%d failed (continuing)", tq)
    # decode batch-size buckets: run bs concurrent short requests so the
    # decode (overlap + multi-step) executables for that bucket compile
    for bs in runner.decode_bs_buckets:
        if bs > max_bs:
            break
        errs = []

        def one():
            try:
                engine.generate(input_ids=[5, 6, 7, 8],
                                sampling_params=dict(sweep_sp))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=one) for _ in range(bs)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=600)
        if errs:
            logger.error("warmup decode bs=%d: %s", bs, errs[0])
    logger.info(
        "warmup complete (%d variants + bucket sweep, %.0fs)",
        len(variants), _time.time() - t0,
    )


def launch_server(server_args: ServerArgs, engine: Optional[Engine] = None):
    """Blocking server start (reference http_server.py:1677 launch_server)."""
    if engine is None:
        engine = Engine(server_args=server_args)
    if not server_args.skip_server_warmup:
        _warmup(engine)
    if server_args.grpc_port:
        from sglang_awq_tpu.entrypoints.grpc_server import GrpcEngineServer

        grpc_srv = GrpcEngineServer(engine, server_args.grpc_port)
        grpc_srv.start()
    app = build_app(engine)
    logger.info(
        "serving %s on http://%s:%d",
        server_args.served_model_name,
        server_args.host,
        server_args.port,
    )
    web.run_app(
        app, host=server_args.host, port=server_args.port, print=None, access_log=None
    )
