"""gRPC endpoint (reference grpc_server role): generate stream/unary,
health, abort — via generic stubs with the JSON codec."""

import json

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.entrypoints.grpc_server import GrpcEngineServer
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, ByteTokenizer, tiny_hf_model_and_tensors


@pytest.fixture(scope="module")
def grpc_target():
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=2048,
                    chunked_prefill_size=32, max_running_requests=8)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=ByteTokenizer())
    srv = GrpcEngineServer(eng, port=0)
    srv.start()
    yield f"127.0.0.1:{srv.bound_port}"
    srv.stop()
    eng.shutdown()


def _chan(target):
    import grpc

    return grpc.insecure_channel(target)


def test_grpc_health_and_unary(grpc_target):
    import grpc

    with _chan(grpc_target) as ch:
        health = ch.unary_unary("/sglang.Engine/Health")
        out = json.loads(health(b"{}", timeout=30))
        assert out["status"] == "ok"

        gen = ch.unary_unary("/sglang.Engine/GenerateUnary")
        req = {"text": "hello", "sampling_params": {
            "max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}}
        out = json.loads(gen(json.dumps(req).encode(), timeout=120))
        assert out["finished"] is True
        assert len(out["output_ids"]) == 5
        assert out["meta_info"]["completion_tokens"] == 5


def test_grpc_stream(grpc_target):
    with _chan(grpc_target) as ch:
        gen = ch.unary_stream("/sglang.Engine/Generate")
        req = {"text": "abc", "sampling_params": {
            "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}}
        chunks = [json.loads(x) for x in gen(json.dumps(req).encode(),
                                             timeout=120)]
        assert len(chunks) >= 2
        assert chunks[-1]["finished"] is True
        assert len(chunks[-1]["output_ids"]) == 4
