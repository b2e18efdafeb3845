"""Frontend DSL (reference python/sglang/lang): gen/select/fork/run_batch
against the in-process engine."""

import numpy as np
import pytest

import sglang_awq_tpu.lang as sgl
from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, ByteTokenizer, tiny_hf_model_and_tensors


@pytest.fixture(scope="module")
def backend():
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG),
                     context_length=1024)
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=4096,
                    chunked_prefill_size=64, max_running_requests=8)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=ByteTokenizer())
    yield sgl.EngineBackend(eng)
    eng.shutdown()


def test_gen_and_roles(backend):
    @sgl.function
    def qa(s, question):
        s += sgl.system("You are terse.")
        s += sgl.user(question)
        s += sgl.assistant(sgl.gen("answer", max_tokens=8,
                                   temperature=0.0))

    state = qa.run(question="what is up", backend=backend)
    assert "answer" in state  # may be "" if the random model emits EOS
    assert state.text.startswith("system: You are terse.\nuser: what is up\n")
    assert state["answer"] in state.text


def test_gen_constrained(backend):
    @sgl.function
    def pick(s):
        s += "direction: "
        s += sgl.gen("d", max_tokens=16, regex=r"(left|right)")

    state = pick.run(backend=backend)
    assert state["d"] in ("left", "right")


def test_select(backend):
    @sgl.function
    def choose(s):
        s += "the quick brown "
        s += sgl.select("w", choices=["fox", "zzq"])

    state = choose.run(backend=backend)
    assert state["w"] in ("fox", "zzq")
    assert state.text.endswith(state["w"])


def test_fork_and_run_batch(backend):
    @sgl.function
    def base(s, topic):
        s += f"topic {topic}: "
        s += sgl.gen("x", max_tokens=4, temperature=0.0)

    states = base.run_batch(
        [{"topic": "a"}, {"topic": "b"}, {"topic": "c"}], backend=backend
    )
    assert len(states) == 3
    assert all("x" in st for st in states)

    forks = states[0].fork(2)
    for i, f in enumerate(forks):
        f += f" branch{i} "
        f += sgl.gen(f"y{i}", max_tokens=3, temperature=0.0)
    assert forks[0].text != forks[1].text
    assert "y0" in forks[0] and "y1" in forks[1]
    # parent state untouched by forks
    assert "y0" not in states[0]


def test_deterministic_same_program(backend):
    @sgl.function
    def p(s):
        s += "abc "
        s += sgl.gen("g", max_tokens=6, temperature=0.0)

    a = p.run(backend=backend)
    b = p.run(backend=backend)
    assert a["g"] == b["g"]


@pytest.fixture(scope="module")
def openai_server_url():
    """Tiny engine behind the OpenAI-compatible HTTP server (reference
    lang/backend/openai.py role: the DSL's second backend family)."""
    import asyncio
    import socket
    import threading

    from sglang_awq_tpu.entrypoints.http_server import build_app

    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG),
                     context_length=1024)
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=2048,
                    chunked_prefill_size=32, max_running_requests=8)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=ByteTokenizer())
    app = build_app(eng)
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    loop = asyncio.new_event_loop()
    started = threading.Event()

    def run():
        asyncio.set_event_loop(loop)

        async def main():
            from aiohttp import web
            runner = web.AppRunner(app)
            await runner.setup()
            await web.TCPSite(runner, "127.0.0.1", port).start()
            started.set()
            while True:
                await asyncio.sleep(3600)

        loop.run_until_complete(main())

    threading.Thread(target=run, daemon=True).start()
    assert started.wait(timeout=30)
    yield f"http://127.0.0.1:{port}"
    eng.shutdown()


def test_openai_backend_gen_and_select(openai_server_url):
    be = sgl.OpenAIBackend(openai_server_url, model="tiny")

    @sgl.function
    def prog(s):
        s += "the quick brown "
        s += sgl.select("w", choices=["fox", "zzq"])
        s += sgl.gen("tail", max_tokens=4, temperature=0.0)

    state = prog.run(backend=be)
    assert state["w"] in ("fox", "zzq")
    assert isinstance(state["tail"], str)


def test_openai_backend_chat_mode(openai_server_url):
    be = sgl.OpenAIBackend(openai_server_url, model="tiny", chat=True)
    out = be.generate("say hi", {"max_new_tokens": 4, "temperature": 0.0})
    assert isinstance(out, str)
