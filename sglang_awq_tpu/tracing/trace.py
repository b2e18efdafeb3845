"""Request tracing with OTLP export (reference: srt/tracing/trace.py).

The reference emits two-level OpenTelemetry spans per request — a root
request span plus per-stage "slices" (tokenize -> queue -> prefill ->
decode) — to an OTLP collector (`trace_req_start:433`,
`trace_slice_start:543`, init `process_tracing_init:210`).  This engine is
single-process, so the reference's cross-process span-context propagation
(`trace_get_proc_propagate_context:325`) collapses away; what remains is
the span model and the OTLP export.

The image ships only the opentelemetry API shim (no SDK, no exporter), so
spans are recorded with plain dataclasses and exported over the standard
OTLP/HTTP **JSON** protocol (POST <endpoint>/v1/traces) by a background
thread using urllib — zero hard dependencies.  A bounded in-memory ring of
recently finished request traces backs the `/get_trace` debug endpoint.

Opt-in: `--enable-trace [--oltp-traces-endpoint host:4318]` (flag name
matches the reference's `server_args.py` spelling).
"""

from __future__ import annotations

import json
import logging
import os
import queue
import random
import threading
import time
import urllib.request
from dataclasses import dataclass, field
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)

_NS = 1_000_000_000


def _now_ns() -> int:
    return time.time_ns()


def _rand_id(nbytes: int) -> str:
    return "".join(f"{random.getrandbits(8):02x}" for _ in range(nbytes))


@dataclass
class Span:
    name: str
    trace_id: str
    span_id: str
    parent_id: str = ""
    start_ns: int = 0
    end_ns: int = 0
    attrs: Dict[str, object] = field(default_factory=dict)
    events: List[Dict] = field(default_factory=list)

    def to_otlp(self) -> dict:
        def attr(k, v):
            if isinstance(v, bool):
                val = {"boolValue": v}
            elif isinstance(v, int):
                val = {"intValue": str(v)}
            elif isinstance(v, float):
                val = {"doubleValue": v}
            else:
                val = {"stringValue": str(v)}
            return {"key": k, "value": val}

        return {
            "traceId": self.trace_id,
            "spanId": self.span_id,
            "parentSpanId": self.parent_id,
            "name": self.name,
            "kind": 1,  # SPAN_KIND_INTERNAL
            "startTimeUnixNano": str(self.start_ns),
            "endTimeUnixNano": str(self.end_ns),
            "attributes": [attr(k, v) for k, v in self.attrs.items()],
            "events": [
                {
                    "timeUnixNano": str(e["ts"]),
                    "name": e["name"],
                    "attributes": [attr(k, v) for k, v in e.get("attrs", {}).items()],
                }
                for e in self.events
            ],
            "status": {},
        }


class _ReqTrace:
    """Root span + ordered slice spans of one request."""

    def __init__(self, rid: str, attrs: Dict[str, object]):
        self.rid = rid
        self.trace_id = _rand_id(16)
        self.root = Span(
            name="request",
            trace_id=self.trace_id,
            span_id=_rand_id(8),
            start_ns=_now_ns(),
            attrs={"rid": rid, **attrs},
        )
        self.slices: List[Span] = []
        self.open: Dict[str, Span] = {}

    def slice_start(self, name: str, attrs: Dict[str, object]):
        if name in self.open:
            return
        sp = Span(
            name=name,
            trace_id=self.trace_id,
            span_id=_rand_id(8),
            parent_id=self.root.span_id,
            start_ns=_now_ns(),
            attrs=attrs,
        )
        self.open[name] = sp

    def slice_end(self, name: str, attrs: Dict[str, object]):
        sp = self.open.pop(name, None)
        if sp is None:
            return
        sp.end_ns = _now_ns()
        sp.attrs.update(attrs)
        self.slices.append(sp)

    def event(self, name: str, attrs: Dict[str, object]):
        self.root.events.append({"ts": _now_ns(), "name": name, "attrs": attrs})

    def finish(self, attrs: Dict[str, object]) -> List[Span]:
        now = _now_ns()
        for name in list(self.open):
            self.slice_end(name, {})
        self.root.end_ns = now
        self.root.attrs.update(attrs)
        return self.slices + [self.root]

    def summary(self) -> dict:
        return {
            "rid": self.rid,
            "trace_id": self.trace_id,
            "start_ns": self.root.start_ns,
            "duration_ms": (self.root.end_ns - self.root.start_ns) / 1e6,
            "attrs": self.root.attrs,
            "slices": [
                {
                    "name": s.name,
                    "start_ms": (s.start_ns - self.root.start_ns) / 1e6,
                    "duration_ms": (s.end_ns - s.start_ns) / 1e6,
                    "attrs": s.attrs,
                }
                for s in sorted(self.slices, key=lambda s: s.start_ns)
            ],
        }


class _Tracer:
    def __init__(self, endpoint: Optional[str], service_name: str,
                 keep_finished: int = 256):
        self.endpoint = endpoint
        self.service_name = service_name
        self.active: Dict[str, _ReqTrace] = {}
        self.lock = threading.Lock()
        self.finished: List[dict] = []  # ring of summaries (newest last)
        self.keep_finished = keep_finished
        self.outq: "queue.Queue[List[Span]]" = queue.Queue(maxsize=4096)
        self.export_errors = 0
        if endpoint:
            t = threading.Thread(target=self._export_loop, daemon=True,
                                 name="trace-export")
            t.start()

    # -- span bookkeeping -------------------------------------------------
    def req_start(self, rid: str, attrs: Dict[str, object]):
        with self.lock:
            if rid not in self.active:
                self.active[rid] = _ReqTrace(rid, attrs)

    def slice_start(self, rid: str, name: str, attrs: Dict[str, object]):
        with self.lock:
            tr = self.active.get(rid)
            if tr:
                tr.slice_start(name, attrs)

    def slice_end(self, rid: str, name: str, attrs: Dict[str, object]):
        with self.lock:
            tr = self.active.get(rid)
            if tr:
                tr.slice_end(name, attrs)

    def event(self, rid: str, name: str, attrs: Dict[str, object]):
        with self.lock:
            tr = self.active.get(rid)
            if tr:
                tr.event(name, attrs)

    def req_finish(self, rid: str, attrs: Dict[str, object]):
        with self.lock:
            tr = self.active.pop(rid, None)
            if tr is None:
                return
            spans = tr.finish(attrs)
            self.finished.append(tr.summary())
            if len(self.finished) > self.keep_finished:
                del self.finished[: -self.keep_finished]
        if self.endpoint:
            try:
                self.outq.put_nowait(spans)
            except queue.Full:
                pass

    def recent(self, n: int = 32) -> List[dict]:
        with self.lock:
            return list(self.finished[-n:])

    # -- OTLP/HTTP JSON export -------------------------------------------
    def _export_loop(self):
        url = self.endpoint
        if not url.startswith("http"):
            url = "http://" + url
        url = url.rstrip("/")
        if not url.endswith("/v1/traces"):
            url += "/v1/traces"
        while True:
            spans = self.outq.get()
            # drain whatever else is queued into one batch
            try:
                while True:
                    spans += self.outq.get_nowait()
            except queue.Empty:
                pass
            body = json.dumps(
                {
                    "resourceSpans": [
                        {
                            "resource": {
                                "attributes": [
                                    {
                                        "key": "service.name",
                                        "value": {"stringValue": self.service_name},
                                    }
                                ]
                            },
                            "scopeSpans": [
                                {
                                    "scope": {"name": "sglang_awq_tpu"},
                                    "spans": [s.to_otlp() for s in spans],
                                }
                            ],
                        }
                    ]
                }
            ).encode()
            try:
                req = urllib.request.Request(
                    url, data=body,
                    headers={"Content-Type": "application/json"},
                )
                urllib.request.urlopen(req, timeout=5).read()
            except Exception as e:  # noqa: BLE001 — collector down: drop
                self.export_errors += 1
                if self.export_errors == 1:
                    logger.warning("trace export to %s failed: %r", url, e)


_tracer: Optional[_Tracer] = None


def trace_init(enable: bool, endpoint: Optional[str] = None,
               service_name: str = "sglang_awq_tpu"):
    """Process-wide init (reference process_tracing_init:210)."""
    global _tracer
    if not enable:
        _tracer = None
        return
    _tracer = _Tracer(endpoint or os.environ.get("SGLT_OTLP_ENDPOINT"),
                      service_name)


def tracing_enabled() -> bool:
    return _tracer is not None


def trace_req_start(rid: str, **attrs):
    if _tracer:
        _tracer.req_start(rid, attrs)


def trace_slice_start(rid: str, name: str, **attrs):
    if _tracer:
        _tracer.slice_start(rid, name, attrs)


def trace_slice_end(rid: str, name: str, **attrs):
    if _tracer:
        _tracer.slice_end(rid, name, attrs)


def trace_event(rid: str, name: str, **attrs):
    if _tracer:
        _tracer.event(rid, name, attrs)


def trace_req_finish(rid: str, **attrs):
    if _tracer:
        _tracer.req_finish(rid, attrs)


def trace_recent(n: int = 32) -> List[dict]:
    return _tracer.recent(n) if _tracer else []
