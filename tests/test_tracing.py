"""Request-tracing tests: span model + OTLP/HTTP JSON export.

Reference role: srt/tracing/trace.py two-level request spans
(trace_req_start:433, trace_slice_start:543).
"""

import http.server
import json
import threading
import time

import numpy as np
import pytest

from sglang_awq_tpu.tracing import trace as T


def _mk_tracer(endpoint=None):
    return T._Tracer(endpoint, "test-svc")


def test_span_lifecycle_and_summary():
    tr = _mk_tracer()
    tr.req_start("r1", {"stream": False})
    tr.slice_start("r1", "tokenize", {})
    tr.slice_end("r1", "tokenize", {"prompt_tokens": 5})
    tr.slice_start("r1", "queue", {})
    tr.slice_end("r1", "queue", {})
    tr.slice_start("r1", "decode", {})
    tr.req_finish("r1", {"completion_tokens": 7})

    recent = tr.recent()
    assert len(recent) == 1
    s = recent[0]
    assert s["rid"] == "r1"
    assert s["attrs"]["completion_tokens"] == 7
    names = [sl["name"] for sl in s["slices"]]
    # open decode slice auto-closed at finish
    assert names == ["tokenize", "queue", "decode"]
    tok = s["slices"][0]
    assert tok["attrs"]["prompt_tokens"] == 5
    assert tok["duration_ms"] >= 0
    # double end / unknown rid are no-ops
    tr.slice_end("r1", "tokenize", {})
    tr.req_finish("nope", {})


def test_noop_when_disabled():
    T.trace_init(False)
    assert not T.tracing_enabled()
    # all entry points are harmless no-ops
    T.trace_req_start("x")
    T.trace_slice_start("x", "s")
    T.trace_slice_end("x", "s")
    T.trace_req_finish("x")
    assert T.trace_recent() == []


def test_otlp_http_export():
    """Spans land at a live OTLP/HTTP collector as valid OTLP JSON."""
    received = []

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        tr = _mk_tracer(f"127.0.0.1:{srv.server_port}")
        tr.req_start("r1", {})
        tr.slice_start("r1", "prefill", {})
        tr.slice_end("r1", "prefill", {})
        tr.req_finish("r1", {"completion_tokens": 3})
        deadline = time.time() + 5
        while not received and time.time() < deadline:
            time.sleep(0.02)
        assert received, "no OTLP batch arrived"
        batch = received[0]["resourceSpans"][0]
        svc = batch["resource"]["attributes"][0]
        assert svc["key"] == "service.name"
        spans = batch["scopeSpans"][0]["spans"]
        names = sorted(s["name"] for s in spans)
        assert names == ["prefill", "request"]
        root = next(s for s in spans if s["name"] == "request")
        child = next(s for s in spans if s["name"] == "prefill")
        assert child["parentSpanId"] == root["spanId"]
        assert child["traceId"] == root["traceId"]
        assert int(root["endTimeUnixNano"]) >= int(root["startTimeUnixNano"])
    finally:
        srv.shutdown()


def test_engine_emits_traces(tiny_engine):
    """End-to-end: a generation through the Engine produces a full trace."""
    eng = tiny_engine
    T.trace_init(True)
    try:
        out = eng.generate(
            input_ids=[3, 4, 5, 6],
            sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        )
        assert len(out["output_ids"]) == 4
        deadline = time.time() + 5
        while not T.trace_recent() and time.time() < deadline:
            time.sleep(0.02)
        traces = T.trace_recent()
        assert traces, "no finished trace recorded"
        s = traces[-1]
        names = [sl["name"] for sl in s["slices"]]
        assert "tokenize" in names and "queue" in names
        assert "prefill" in names and "decode" in names
        assert s["attrs"]["completion_tokens"] == 4
        assert s["attrs"]["prompt_tokens"] == 4
    finally:
        T.trace_init(False)


@pytest.fixture(scope="module")
def tiny_engine():
    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.server_args import ServerArgs

    cfg = dict(
        architectures=["LlamaForCausalLM"],
        vocab_size=128,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        max_position_embeddings=128,
        tie_word_embeddings=False,
        bos_token_id=1,
        eos_token_id=2,
    )
    mc = ModelConfig(model_path="", hf_config=cfg)
    sa = ServerArgs(
        model_path="tiny",
        random_weights=True,
        page_size=8,
        max_total_tokens=512,
        max_running_requests=4,
    )
    eng = Engine(server_args=sa, model_config=mc, tokenizer=None)
    yield eng
    eng.shutdown()


def test_bench_serving_ttft_breakdown(tiny_engine):
    """bench_serving --ttft-breakdown attributes TTFT from /get_trace
    (VERDICT round-3 item 8: per-stage TTFT decomposition)."""
    import asyncio
    import socket
    import threading

    from aiohttp import web

    from sglang_awq_tpu import bench_serving
    from sglang_awq_tpu.entrypoints.http_server import build_app

    app = build_app(tiny_engine)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
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
    T.trace_init(True)
    try:
        report = bench_serving.main([
            "--base-url", f"http://127.0.0.1:{port}",
            "--num-prompts", "4", "--input-len", "24",
            "--output-len", "4", "--ttft-breakdown", "--max-token-id", "120",
        ])
        bd = report["ttft_breakdown_ms"]
        assert "error" not in bd, bd
        # tokenize/queue/prefill stages attributed + residual bucket
        assert "prefill" in bd and "other_p50" in bd, bd
        assert bd["prefill"]["p50"] >= 0
    finally:
        T.trace_init(False)
        loop.call_soon_threadsafe(loop.stop)
