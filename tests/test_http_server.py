"""HTTP server integration tests (reference strategy: launch a real server,
hit endpoints — test/srt/test_srt_endpoint.py, openai_server/basic).
"""

import asyncio
import json
import socket
import threading
import time

import httpx
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.entrypoints.http_server import build_app
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, ByteTokenizer, tiny_hf_model_and_tensors


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server_url():
    from aiohttp import web

    _, tensors = tiny_hf_model_and_tensors()
    # context 1024 > max_position_embeddings: roomy enough for tool-schema
    # system prompts under the byte tokenizer (1 char = 1 token)
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG),
                     context_length=1024)
    sa = ServerArgs(
        model_path="tiny",
        page_size=8,
        max_total_tokens=2048,
        chunked_prefill_size=32,
        max_running_requests=8,
    )
    engine = Engine(
        server_args=sa, model_config=mc, tensors=tensors, tokenizer=ByteTokenizer()
    )
    app = build_app(engine)
    port = _free_port()
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            runner = web.AppRunner(app)
            await runner.setup()
            site = web.TCPSite(runner, "127.0.0.1", port)
            await site.start()
            started.set()
            while True:
                await asyncio.sleep(3600)

        loop.run_until_complete(main())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=30)
    yield f"http://127.0.0.1:{port}"
    engine.shutdown()
    loop.call_soon_threadsafe(loop.stop)


def test_health(server_url):
    r = httpx.get(f"{server_url}/health", timeout=30)
    assert r.status_code == 200


def test_health_generate(server_url):
    r = httpx.get(f"{server_url}/health_generate", timeout=120)
    assert r.status_code == 200


def test_get_server_info(server_url):
    r = httpx.get(f"{server_url}/get_server_info", timeout=30)
    info = r.json()
    assert info["architecture"] == "LlamaForCausalLM"
    assert info["max_total_tokens"] == 2048


def test_generate_native(server_url):
    r = httpx.post(
        f"{server_url}/generate",
        json={
            "text": "hello world",
            "sampling_params": {
                "max_new_tokens": 8,
                "temperature": 0.0,
                "ignore_eos": True,
            },
        },
        timeout=120,
    )
    assert r.status_code == 200
    out = r.json()
    assert out["meta_info"]["completion_tokens"] == 8
    assert len(out["output_ids"]) == 8
    assert isinstance(out["text"], str)


def test_generate_input_ids(server_url):
    r = httpx.post(
        f"{server_url}/generate",
        json={
            "input_ids": [5, 6, 7, 8, 9],
            "sampling_params": {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True},
        },
        timeout=120,
    )
    assert r.json()["meta_info"]["completion_tokens"] == 4


def test_generate_stream(server_url):
    with httpx.stream(
        "POST",
        f"{server_url}/generate",
        json={
            "text": "abc",
            "stream": True,
            "sampling_params": {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True},
        },
        timeout=120,
    ) as r:
        events = []
        saw_done = False
        for line in r.iter_lines():
            if line == "data: [DONE]":
                saw_done = True
            elif line.startswith("data: "):
                events.append(json.loads(line[6:]))
        assert saw_done
    assert events[-1]["meta_info"]["completion_tokens"] == 5


def test_v1_completions(server_url):
    r = httpx.post(
        f"{server_url}/v1/completions",
        json={
            "model": "tiny",
            "prompt": "The quick brown",
            "max_tokens": 6,
            "temperature": 0.0,
            "ignore_eos": True,
        },
        timeout=120,
    )
    out = r.json()
    assert out["object"] == "text_completion"
    assert out["choices"][0]["finish_reason"] == "length"
    assert out["usage"]["completion_tokens"] == 6


def test_v1_chat_completions(server_url):
    r = httpx.post(
        f"{server_url}/v1/chat/completions",
        json={
            "model": "tiny",
            "messages": [
                {"role": "system", "content": "You are helpful."},
                {"role": "user", "content": "Hi"},
            ],
            "max_tokens": 5,
            "temperature": 0.0,
            "ignore_eos": True,
        },
        timeout=120,
    )
    out = r.json()
    assert out["object"] == "chat.completion"
    assert out["choices"][0]["message"]["role"] == "assistant"


def test_v1_chat_stream(server_url):
    with httpx.stream(
        "POST",
        f"{server_url}/v1/chat/completions",
        json={
            "model": "tiny",
            "messages": [{"role": "user", "content": "count"}],
            "max_tokens": 4,
            "temperature": 0.0,
            "stream": True,
            "stream_options": {"include_usage": True},
            "ignore_eos": True,
        },
        timeout=120,
    ) as r:
        chunks = []
        for line in r.iter_lines():
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"
    assert chunks[-1]["usage"]["completion_tokens"] == 4


def test_v1_models(server_url):
    r = httpx.get(f"{server_url}/v1/models", timeout=30)
    assert r.json()["data"][0]["id"] == "tiny"


def test_openai_bad_request(server_url):
    r = httpx.post(
        f"{server_url}/v1/completions",
        json={"model": "tiny", "prompt": "x", "temperature": -2},
        timeout=30,
    )
    assert r.status_code == 400
    assert "error" in r.json()


def test_bench_serving_harness(server_url):
    """Smoke the online bench harness against the live server."""
    import asyncio

    from sglang_awq_tpu.bench_serving import run_bench

    class A:
        base_url = server_url
        num_prompts = 4
        request_rate = 0.0
        input_len = 16
        output_len = 4
        random_range = 0.0
        seed = 0
        timeout = 300
        max_token_id = 500  # token ids must stay under the tiny vocab
        ttft_breakdown = False

    report = asyncio.run(run_bench(A))
    assert report["completed"] == 4 and report["failed"] == 0
    assert report["total_output_tokens"] == 16
    assert report["ttft_ms"]["p50"] > 0


def test_stop_string(server_url):
    # byte tokenizer: generation is deterministic; use a stop string drawn
    # from the actual greedy output
    r1 = httpx.post(
        f"{server_url}/generate",
        json={
            "text": "xyz",
            "sampling_params": {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True},
        },
        timeout=120,
    ).json()
    full = r1["text"]
    if len(full) >= 3:
        stop = full[1:3]
        r2 = httpx.post(
            f"{server_url}/generate",
            json={
                "text": "xyz",
                "sampling_params": {
                    "max_new_tokens": 10,
                    "temperature": 0.0,
                    "ignore_eos": True,
                    "stop": [stop],
                },
            },
            timeout=120,
        ).json()
        assert stop not in r2["text"]
        assert r2["meta_info"]["finish_reason"]["type"] == "stop"


def test_sessions(server_url):
    sid = httpx.post(f"{server_url}/open_session", json={}, timeout=30).json()
    r1 = httpx.post(
        f"{server_url}/generate",
        json={
            "input_ids": [10, 11, 12, 13],
            "session_params": {"id": sid},
            "sampling_params": {"max_new_tokens": 3, "temperature": 0.0, "ignore_eos": True},
        },
        timeout=120,
    ).json()
    # second turn continues the session; prompt_tokens includes the history
    r2 = httpx.post(
        f"{server_url}/generate",
        json={
            "input_ids": [20, 21],
            "session_params": {"id": sid},
            "sampling_params": {"max_new_tokens": 3, "temperature": 0.0, "ignore_eos": True},
        },
        timeout=120,
    ).json()
    assert r2["meta_info"]["prompt_tokens"] == 4 + 3 + 2
    # prefix cache should cover the replayed history
    assert r2["meta_info"]["cached_tokens"] >= 0
    httpx.post(f"{server_url}/close_session", json={"session_id": sid}, timeout=30)
    # unknown session -> 400
    r3 = httpx.post(
        f"{server_url}/generate",
        json={"input_ids": [1, 2], "session_params": {"id": sid},
              "sampling_params": {"max_new_tokens": 2}},
        timeout=30,
    )
    assert r3.status_code == 400


def test_v1_embeddings(server_url):
    r = httpx.post(
        f"{server_url}/v1/embeddings",
        json={"model": "tiny", "input": ["hello world", "goodbye"]},
        timeout=120,
    )
    out = r.json()
    assert out["object"] == "list" and len(out["data"]) == 2
    emb = out["data"][0]["embedding"]
    assert len(emb) == 256  # hidden size
    # same input -> same embedding (deterministic); different input differs
    r2 = httpx.post(
        f"{server_url}/v1/embeddings",
        json={"model": "tiny", "input": "hello world"},
        timeout=120,
    ).json()
    assert r2["data"][0]["embedding"] == emb
    assert out["data"][1]["embedding"] != emb


def test_n_greater_than_one(server_url):
    r = httpx.post(
        f"{server_url}/v1/completions",
        json={
            "model": "tiny",
            "prompt": "pick one",
            "max_tokens": 5,
            "n": 3,
            "temperature": 0.9,
            "seed": 5,
            "ignore_eos": True,
        },
        timeout=180,
    )
    out = r.json()
    assert len(out["choices"]) == 3
    assert {c["index"] for c in out["choices"]} == {0, 1, 2}
    # distinct seeds -> (almost surely) not all identical
    texts = [c["text"] for c in out["choices"]]
    assert len(set(texts)) >= 2, texts
    assert out["usage"]["completion_tokens"] == 15


def test_api_key_auth():
    """A server with --api-key must 401 unauthenticated requests."""
    from aiohttp import web as _web

    from .utils import TINY_LLAMA_CFG as C2, ByteTokenizer as BT2, tiny_hf_model_and_tensors as mk2

    _, tensors = mk2()
    mc = ModelConfig(model_path="", hf_config=dict(C2))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32, api_key="sekrit")
    engine = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=BT2())
    app = build_app(engine)
    port = _free_port()
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            runner = _web.AppRunner(app)
            await runner.setup()
            await _web.TCPSite(runner, "127.0.0.1", port).start()
            started.set()
            while True:
                await asyncio.sleep(3600)

        loop.run_until_complete(main())

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(30)
    base = f"http://127.0.0.1:{port}"
    try:
        assert httpx.get(f"{base}/health", timeout=30).status_code == 200  # open
        r = httpx.post(f"{base}/generate", json={"text": "x"}, timeout=30)
        assert r.status_code == 401
        r2 = httpx.post(
            f"{base}/generate",
            json={"text": "hi", "sampling_params": {"max_new_tokens": 2, "ignore_eos": True, "temperature": 0.0}},
            headers={"Authorization": "Bearer sekrit"},
            timeout=120,
        )
        assert r2.status_code == 200
    finally:
        engine.shutdown()
        loop.call_soon_threadsafe(loop.stop)


def test_v1_completions_echo_logprobs(server_url):
    """OpenAI completions with echo + logprobs: prompt AND output tokens
    carry logprobs (reference echo+logprobs surface)."""
    prompt = "The quick brown fox"
    r = httpx.post(
        f"{server_url}/v1/completions",
        json={
            "model": "tiny",
            "prompt": prompt,
            "max_tokens": 4,
            "temperature": 0.0,
            "ignore_eos": True,
            "echo": True,
            "logprobs": 2,
        },
        timeout=120,
    )
    out = r.json()
    ch = out["choices"][0]
    assert ch["text"].startswith(prompt)
    lp = ch["logprobs"]
    assert lp is not None
    n_prompt = out["usage"]["prompt_tokens"]
    assert len(lp["tokens"]) == n_prompt + 4
    assert lp["token_logprobs"][0] is None  # first prompt token: no prefix
    assert all(v is not None and v <= 0.0 for v in lp["token_logprobs"][1:])
    # decoded-text keys may collide (two ids, same text), so 1..2 entries
    assert all(t is None or 1 <= len(t) <= 2 for t in lp["top_logprobs"])


def test_v1_completions_logprobs_no_echo(server_url):
    r = httpx.post(
        f"{server_url}/v1/completions",
        json={
            "model": "tiny",
            "prompt": "hello there",
            "max_tokens": 3,
            "temperature": 0.0,
            "ignore_eos": True,
            "logprobs": 1,
        },
        timeout=120,
    )
    lp = r.json()["choices"][0]["logprobs"]
    assert lp is not None and len(lp["tokens"]) == 3
    assert all(v <= 0.0 for v in lp["token_logprobs"])


def test_run_eval_harness(server_url):
    """run_eval pipeline smoke: both evals run against the live server with
    the synthetic set and produce a score dict (accuracy meaningless on the
    tiny random model — the reference floors need a real checkpoint)."""
    from sglang_awq_tpu.run_eval import main as run_eval_main

    host, port = server_url.rsplit("//", 1)[1].split(":")
    for name in ("mmlu", "gsm8k"):
        res = run_eval_main([
            "--eval-name", name, "--data-path", "synthetic",
            "--host", host, "--port", port,
            "--num-questions", "2", "--max-tokens", "16", "--parallel", "2",
            "--num-shots", "2",
        ])
        assert res["eval"] == name
        assert 0.0 <= res["score"] <= 1.0
        assert res["n"] == 2


def test_chat_tools_forced_call(server_url):
    """tool_choice='required' grammar-forces a parseable call even from the
    tiny random model; the response carries tool_calls + finish_reason."""
    tools = [{
        "type": "function",
        "function": {
            "name": "add",
            "parameters": {
                "type": "object",
                "properties": {"a": {"enum": [1, 2, 3]},
                               "b": {"enum": [1, 2, 3]}},
                "required": ["a", "b"],
            },
        },
    }]
    r = httpx.post(
        f"{server_url}/v1/chat/completions",
        json={
            "model": "tiny",
            "messages": [{"role": "user", "content": "add two and three"}],
            # random weights + grammar can pad with whitespace tokens; the
            # budget only needs to be big enough for the forced call to
            # CLOSE (the grammar caps the structure, not the padding)
            "max_tokens": 128,
            "temperature": 0.0,
            "tools": tools,
            "tool_choice": "required",
        },
        timeout=180,
    )
    out = r.json()
    ch = out["choices"][0]
    assert ch["finish_reason"] == "tool_calls", ch
    tc = ch["message"]["tool_calls"]
    assert tc[0]["function"]["name"] == "add"
    args = json.loads(tc[0]["function"]["arguments"])
    assert set(args) <= {"a", "b"}


def test_chat_response_format_json_schema(server_url):
    r = httpx.post(
        f"{server_url}/v1/chat/completions",
        json={
            "model": "tiny",
            "messages": [{"role": "user", "content": "give me json"}],
            "max_tokens": 64,
            "temperature": 0.0,
            "response_format": {
                "type": "json_schema",
                "json_schema": {
                    "name": "t",
                    "schema": {
                        "type": "object",
                        "properties": {"x": {"type": "integer"}},
                        "required": ["x"],
                    },
                },
            },
        },
        timeout=180,
    )
    content = r.json()["choices"][0]["message"]["content"]
    obj = json.loads(content)
    assert isinstance(obj.get("x"), int)


def test_profile_endpoints(server_url, tmp_path):
    out = str(tmp_path / "trace")
    r = httpx.post(f"{server_url}/start_profile",
                   json={"output_dir": out}, timeout=60)
    assert r.json()["success"]
    # double-start rejected
    r2 = httpx.post(f"{server_url}/start_profile", json={}, timeout=60)
    assert r2.status_code == 409
    httpx.post(
        f"{server_url}/generate",
        json={"text": "p", "sampling_params": {"max_new_tokens": 2,
                                               "temperature": 0.0,
                                               "ignore_eos": True}},
        timeout=120,
    )
    r3 = httpx.post(f"{server_url}/stop_profile", json={}, timeout=60)
    assert r3.json()["success"]
    import glob as _glob

    assert _glob.glob(out + "/**/*.pb", recursive=True) or _glob.glob(
        out + "/**/*.json.gz", recursive=True
    ), "no trace written"


def test_bench_one_batch_harness():
    """Offline one-batch bench runs against a tiny in-process engine."""
    from sglang_awq_tpu.bench_one_batch import run_one
    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.server_args import ServerArgs
    from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors
    import numpy as np

    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=2048,
                    chunked_prefill_size=64, max_running_requests=4)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        rep = run_one(eng, bs=3, input_len=24, output_len=6,
                      rng=np.random.default_rng(0))
    finally:
        eng.shutdown()
    assert rep["batch_size"] == 3
    assert rep["prefill_tok_s"] > 0 and rep["decode_tok_s"] > 0
    assert rep["total_latency_s"] > 0


def test_v1_score(server_url):
    """Label probabilities after query+item, vs direct HF shifted softmax."""
    import torch

    hf, _ = tiny_hf_model_and_tensors()
    q = [7, 8, 9]
    item = [20, 21]
    labels = [5, 6, 7]
    r = httpx.post(
        f"{server_url}/v1/score",
        json={"query": q, "items": [item], "label_token_ids": labels,
              "apply_softmax": False},
        timeout=120,
    )
    scores = r.json()["scores"]
    assert len(scores) == 1 and len(scores[0]) == 3
    with torch.no_grad():
        logits = hf(torch.tensor([q + item])).logits[0, -1].float()
    ref = torch.log_softmax(logits, dim=-1)
    import math

    for j, lab in enumerate(labels):
        assert abs(math.log(max(scores[0][j], 1e-30)) - float(ref[lab])) < 0.1

    # softmax normalization over labels
    r2 = httpx.post(
        f"{server_url}/v1/score",
        json={"query": q, "items": [item], "label_token_ids": labels,
              "apply_softmax": True},
        timeout=120,
    )
    s2 = r2.json()["scores"][0]
    assert abs(sum(s2) - 1.0) < 1e-5


def test_v1_rerank(server_url):
    r = httpx.post(
        f"{server_url}/v1/rerank",
        json={"query": "the quick", "documents": ["brown fox", "zzqqxx"]},
        timeout=120,
    )
    out = r.json()
    assert len(out) == 2
    assert {d["index"] for d in out} == {0, 1}
    assert out[0]["score"] >= out[1]["score"]


def test_tokenize_detokenize(server_url):
    r = httpx.post(f"{server_url}/tokenize", json={"text": "hello"}, timeout=30)
    ids = r.json()["tokens"]
    assert r.json()["count"] == len(ids) == 5  # byte tokenizer
    r2 = httpx.post(f"{server_url}/detokenize", json={"tokens": ids}, timeout=30)
    assert r2.json()["text"] == "hello"


def test_ollama_compat(server_url):
    r = httpx.post(
        f"{server_url}/api/generate",
        json={"model": "tiny", "prompt": "hi", "stream": False,
              "options": {"num_predict": 4, "temperature": 0}},
        timeout=120,
    )
    out = r.json()
    assert out["done"] is True and out["eval_count"] == 4

    # streaming NDJSON
    lines = []
    with httpx.stream(
        "POST", f"{server_url}/api/chat",
        json={"model": "tiny",
              "messages": [{"role": "user", "content": "yo"}],
              "options": {"num_predict": 3, "temperature": 0}},
        timeout=120,
    ) as r:
        for ln in r.iter_lines():
            if ln.strip():
                lines.append(json.loads(ln))
    assert lines[-1]["done"] is True
    assert all("message" in l for l in lines)

    tags = httpx.get(f"{server_url}/api/tags", timeout=30).json()
    assert tags["models"][0]["name"]


def test_v1_responses(server_url):
    """OpenAI Responses API subset: string input, non-stream."""
    r = httpx.post(
        f"{server_url}/v1/responses",
        json={"input": "say hi", "max_output_tokens": 6, "temperature": 0.0},
        timeout=120,
    )
    assert r.status_code == 200
    out = r.json()
    assert out["object"] == "response"
    assert out["status"] == "completed"
    msg = out["output"][0]
    assert msg["type"] == "message" and msg["role"] == "assistant"
    assert msg["content"][0]["type"] == "output_text"
    assert out["output_text"] == msg["content"][0]["text"]
    assert out["usage"]["output_tokens"] == 6


def test_v1_responses_messages_and_stream(server_url):
    """Message-list input + instructions; streaming event protocol."""
    with httpx.stream(
        "POST",
        f"{server_url}/v1/responses",
        json={
            "instructions": "be brief",
            "input": [
                {"type": "message", "role": "user",
                 "content": [{"type": "input_text", "text": "hello"}]},
            ],
            "max_output_tokens": 5,
            "temperature": 0.0,
            "stream": True,
        },
        timeout=120,
    ) as r:
        assert r.status_code == 200
        events = []
        data = []
        for line in r.iter_lines():
            if line.startswith("event: "):
                events.append(line[7:])
            elif line.startswith("data: "):
                data.append(json.loads(line[6:]))
    assert events[0] == "response.created"
    assert events[-1] == "response.completed"
    final = data[-1]["response"]
    deltas = "".join(d["delta"] for d in data
                     if d.get("type") == "response.output_text.delta")
    assert final["output_text"] == deltas
    # delta events appear exactly when visible text was produced (special
    # tokens from the random model may detokenize to "")
    assert ("response.output_text.delta" in events) == (deltas != "")
    assert final["usage"]["output_tokens"] == 5


def test_v1_responses_rejects_previous_id(server_url):
    r = httpx.post(
        f"{server_url}/v1/responses",
        json={"input": "x", "previous_response_id": "resp_123"},
        timeout=30,
    )
    assert r.status_code == 400
