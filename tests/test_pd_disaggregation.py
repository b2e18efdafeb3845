"""PD disaggregation: prefill server -> KV transfer -> decode server.

Two engines (same weights) + the PD router; outputs must equal a unified
single-server run token-for-token, and the decode server must NOT
recompute the transferred prefix (cached_tokens check).
"""

import asyncio
import json
import socket
import threading

import httpx
import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.disaggregation.pd_router import PDRouter
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.entrypoints.http_server import build_app
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, ByteTokenizer, tiny_hf_model_and_tensors


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _serve(app, port, loop):
    from aiohttp import web

    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            runner = web.AppRunner(app)
            await runner.setup()
            await web.TCPSite(runner, "127.0.0.1", port).start()
            started.set()
            while True:
                await asyncio.sleep(3600)

        loop.run_until_complete(main())

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert started.wait(timeout=30)


@pytest.fixture(scope="module")
def pd_stack():
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))

    def engine():
        sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=2048,
                        chunked_prefill_size=64, max_running_requests=8)
        return Engine(server_args=sa, model_config=mc, tensors=tensors,
                      tokenizer=ByteTokenizer())

    eng_p, eng_d, eng_u = engine(), engine(), engine()
    pport, dport, rport = _free_port(), _free_port(), _free_port()
    _serve(build_app(eng_p), pport, asyncio.new_event_loop())
    _serve(build_app(eng_d), dport, asyncio.new_event_loop())
    router = PDRouter(f"http://127.0.0.1:{pport}", f"http://127.0.0.1:{dport}")
    _serve(router.app, rport, asyncio.new_event_loop())
    jport = _free_port()  # legacy JSON+base64 framing
    router_j = PDRouter(f"http://127.0.0.1:{pport}",
                        f"http://127.0.0.1:{dport}", binary=False)
    _serve(router_j.app, jport, asyncio.new_event_loop())
    yield {
        "router": f"http://127.0.0.1:{rport}",
        "router_json": f"http://127.0.0.1:{jport}",
        "prefill": eng_p, "decode": eng_d, "unified": eng_u,
    }
    for e in (eng_p, eng_d, eng_u):
        e.shutdown()


def test_pd_matches_unified(pd_stack):
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, 37).tolist()
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    ref = pd_stack["unified"].generate(
        input_ids=prompt, sampling_params=dict(sp)
    )["output_ids"]

    r = httpx.post(
        pd_stack["router"] + "/generate",
        json={"input_ids": prompt, "sampling_params": dict(sp)},
        timeout=300,
    )
    out = r.json()
    assert out["output_ids"] == ref, (out["output_ids"], ref)
    # decode server saw the transferred pages as cached prefix
    assert out["meta_info"]["cached_tokens"] >= 32


def test_pd_finish_at_prefill(pd_stack):
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 500, 11).tolist()
    r = httpx.post(
        pd_stack["router"] + "/generate",
        json={"input_ids": prompt,
              "sampling_params": {"max_new_tokens": 1, "temperature": 0.0,
                                  "ignore_eos": True}},
        timeout=300,
    )
    out = r.json()
    assert len(out["output_ids"]) == 1
    ref = pd_stack["unified"].generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                         "ignore_eos": True},
    )["output_ids"]
    assert out["output_ids"] == ref


def test_pd_streaming(pd_stack):
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 500, 21).tolist()
    chunks = []
    with httpx.stream(
        "POST", pd_stack["router"] + "/generate",
        json={"input_ids": prompt, "stream": True,
              "sampling_params": {"max_new_tokens": 5, "temperature": 0.0,
                                  "ignore_eos": True}},
        timeout=300,
    ) as r:
        for line in r.iter_lines():
            if line.startswith("data: ") and line != "data: [DONE]":
                chunks.append(json.loads(line[6:]))
    assert chunks, "no stream chunks"
    assert len(chunks[-1]["output_ids"]) == 5
    ref = pd_stack["unified"].generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 5, "temperature": 0.0,
                         "ignore_eos": True},
    )["output_ids"]
    assert chunks[-1]["output_ids"] == ref


def test_pd_frame_codec_roundtrip():
    from sglang_awq_tpu.disaggregation.pd import frame_decode, frame_encode

    header = {"a": 1, "nested": {"b": [1, 2, 3]}}
    payload = bytes(range(256)) * 33
    h2, p2 = frame_decode(frame_encode(header, payload))
    assert h2 == header and p2 == payload


def test_pd_json_fallback_matches(pd_stack):
    """A binary=False router (legacy JSON+base64 hop) is token-identical."""
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 500, 37).tolist()
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
    ref = pd_stack["unified"].generate(
        input_ids=prompt, sampling_params=dict(sp)
    )["output_ids"]
    r = httpx.post(
        pd_stack["router_json"] + "/generate",
        json={"input_ids": prompt, "sampling_params": dict(sp)},
        timeout=300,
    )
    out = r.json()
    assert out["output_ids"] == ref
    assert out["meta_info"]["cached_tokens"] >= 32
