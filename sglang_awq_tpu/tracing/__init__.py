from sglang_awq_tpu.tracing.trace import (  # noqa: F401
    trace_init,
    trace_req_start,
    trace_req_finish,
    trace_slice_start,
    trace_slice_end,
    trace_event,
    tracing_enabled,
)
