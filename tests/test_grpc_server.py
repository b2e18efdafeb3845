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
    srv = GrpcEngineServer(eng, port=0, codec="json")
    srv.start()
    srv2 = GrpcEngineServer(eng, port=0, codec="proto")
    srv2.start()
    yield f"127.0.0.1:{srv.bound_port}", f"127.0.0.1:{srv2.bound_port}"
    srv.stop()
    srv2.stop()
    eng.shutdown()


def _chan(target):
    import grpc

    return grpc.insecure_channel(target)


def test_grpc_health_and_unary(grpc_target):
    import grpc

    with _chan(grpc_target[0]) as ch:
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
    with _chan(grpc_target[0]) as ch:
        gen = ch.unary_stream("/sglang.Engine/Generate")
        req = {"text": "abc", "sampling_params": {
            "max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}}
        chunks = [json.loads(x) for x in gen(json.dumps(req).encode(),
                                             timeout=120)]
        assert len(chunks) >= 2
        assert chunks[-1]["finished"] is True
        assert len(chunks[-1]["output_ids"]) == 4


def test_grpc_proto_codec(grpc_target):
    """Compiled-proto contract (protos/sglang_engine.proto): typed
    request/response messages over the same service."""
    from sglang_awq_tpu.entrypoints import sglang_engine_pb2 as pb

    with _chan(grpc_target[1]) as ch:
        health = ch.unary_unary(
            "/sglang.Engine/Health",
            request_serializer=pb.HealthRequest.SerializeToString,
            response_deserializer=pb.HealthResponse.FromString,
        )
        assert health(pb.HealthRequest(), timeout=30).status == "ok"

        gen = ch.unary_unary(
            "/sglang.Engine/GenerateUnary",
            request_serializer=pb.GenerateRequest.SerializeToString,
            response_deserializer=pb.GenerateResponse.FromString,
        )
        req = pb.GenerateRequest(
            text="hello",
            sampling_params_json=json.dumps(
                {"max_new_tokens": 5, "temperature": 0.0,
                 "ignore_eos": True}),
        )
        out = gen(req, timeout=120)
        assert out.finished and len(out.output_ids) == 5

        stream = ch.unary_stream(
            "/sglang.Engine/Generate",
            request_serializer=pb.GenerateRequest.SerializeToString,
            response_deserializer=pb.GenerateResponse.FromString,
        )
        chunks = list(stream(pb.GenerateRequest(
            input_ids=[5, 6, 7],
            sampling_params_json=json.dumps(
                {"max_new_tokens": 4, "temperature": 0.0,
                 "ignore_eos": True}),
        ), timeout=120))
        assert chunks[-1].finished
        assert sum(len(c.output_ids) for c in chunks) >= 4
