from sglang_awq_tpu.disaggregation.pd import (
    adopt_prefilled,
    export_prefilled_kv,
)

__all__ = ["adopt_prefilled", "export_prefilled_kv"]
