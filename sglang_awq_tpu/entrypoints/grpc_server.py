"""gRPC serving endpoint.

Role model: reference `python/sglang/srt/entrypoints/grpc_server.py`
(SglangScheduler service: Generate stream, HealthCheck).  The service
speaks the COMPILED `protos/sglang_engine.proto` contract (protoc-generated
message classes wired through generic method handlers — no
grpc_python_plugin needed): clients generate stubs from the same proto.
Set SGLT_GRPC_CODEC=json for the round-2 JSON codec (legacy clients).

Methods (service `sglang.Engine`):
  Generate      server-streaming; request/response JSON:
                {"text"|"input_ids", "sampling_params": {...}} ->
                stream of {"text", "delta", "output_ids", "meta_info",
                "finished"}
  GenerateUnary unary variant (final chunk only)
  Health        {} -> {"status": "ok"}
  Abort         {"rid": ...} -> {}
"""

from __future__ import annotations

import json
import logging
import queue
from concurrent import futures
from typing import Optional

import grpc

from sglang_awq_tpu.managers.tokenizer_manager import GenerateReqInput

logger = logging.getLogger(__name__)

_SERVICE = "sglang.Engine"


def _ser(obj) -> bytes:
    return json.dumps(obj).encode()


def _de(data: bytes):
    return json.loads(data.decode())


def _gin_from(body: dict, stream: bool) -> GenerateReqInput:
    return GenerateReqInput(
        text=body.get("text"),
        input_ids=body.get("input_ids"),
        sampling_params=body.get("sampling_params"),
        rid=body.get("rid"),
        stream=stream,
        return_logprob=bool(body.get("return_logprob", False)),
        logprob_start_len=int(body.get("logprob_start_len", -1)),
    )


def _payload(out: dict) -> dict:
    return {
        "text": out.get("text", ""),
        "delta": out.get("delta", ""),
        "output_ids": out.get("output_ids", []),
        "meta_info": out.get("meta_info", {}),
        "finished": out.get("finished", True),
    }


class GrpcEngineServer:
    def __init__(self, engine, port: int, max_workers: int = 16,
                 codec: Optional[str] = None):
        import os

        self.engine = engine
        self.port = port
        self.server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=max_workers)
        )
        codec = codec or os.environ.get("SGLT_GRPC_CODEC", "proto")
        if codec == "proto":
            from sglang_awq_tpu.entrypoints import sglang_engine_pb2 as pb

            def req_de(data: bytes) -> dict:
                m = pb.GenerateRequest.FromString(data)
                return {
                    "text": m.text or None,
                    "input_ids": list(m.input_ids) or None,
                    "sampling_params": (
                        json.loads(m.sampling_params_json)
                        if m.sampling_params_json else None
                    ),
                    "rid": m.rid or None,
                    "return_logprob": m.return_logprob,
                    "logprob_start_len": m.logprob_start_len or -1,
                }

            def resp_ser(out: dict) -> bytes:
                return pb.GenerateResponse(
                    text=out.get("text") or "",
                    delta=out.get("delta") or "",
                    output_ids=out.get("output_ids") or [],
                    meta_info_json=json.dumps(out.get("meta_info") or {}),
                    finished=bool(out.get("finished", True)),
                ).SerializeToString()

            self._req_de = req_de
            self._resp_ser = resp_ser
            self._health_ser = lambda o: pb.HealthResponse(
                status=o.get("status", "ok")).SerializeToString()
            self._health_de = lambda b: {}
            self._abort_de = lambda b: {
                "rid": pb.AbortRequest.FromString(b).rid or None}
            self._abort_ser = lambda o: pb.AbortResponse().SerializeToString()
        else:  # legacy JSON codec
            self._req_de = _de
            self._resp_ser = lambda out: _ser(_payload(out))
            self._health_ser = _ser
            self._health_de = _de
            self._abort_de = _de
            self._abort_ser = _ser

        def generate_stream(request: bytes, context):
            body = self._req_de(request)
            state = self.engine.tokenizer_manager.create_request(
                _gin_from(body, stream=True)
            )
            try:
                while True:
                    item = state.out_queue.get()
                    if item is None:
                        break
                    yield self._resp_ser(_payload(item))
            finally:
                self.engine.tokenizer_manager._drop(state)

        def generate_unary(request: bytes, context):
            body = self._req_de(request)
            state = self.engine.tokenizer_manager.create_request(
                _gin_from(body, stream=False)
            )
            last = None
            while True:
                item = state.out_queue.get()
                if item is None:
                    break
                last = item
            self.engine.tokenizer_manager._drop(state)
            if last is None:
                context.abort(grpc.StatusCode.INTERNAL, "no output")
            return self._resp_ser(_payload(last))

        def health(request: bytes, context):
            self._health_de(request)
            return self._health_ser({"status": "ok"})

        def abort(request: bytes, context):
            rid = self._abort_de(request).get("rid")
            if rid:
                self.engine.tokenizer_manager.abort_request(rid)
            return self._abort_ser({})

        handlers = {
            "Generate": grpc.unary_stream_rpc_method_handler(
                generate_stream, request_deserializer=None,
                response_serializer=None,
            ),
            "GenerateUnary": grpc.unary_unary_rpc_method_handler(
                generate_unary, request_deserializer=None,
                response_serializer=None,
            ),
            "Health": grpc.unary_unary_rpc_method_handler(
                health, request_deserializer=None, response_serializer=None,
            ),
            "Abort": grpc.unary_unary_rpc_method_handler(
                abort, request_deserializer=None, response_serializer=None,
            ),
        }
        self.server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(_SERVICE, handlers),)
        )
        self.bound_port = self.server.add_insecure_port(f"[::]:{port}")

    def start(self):
        self.server.start()
        logger.info("gRPC server on :%d", self.bound_port)

    def stop(self, grace: Optional[float] = 1.0):
        self.server.stop(grace)
