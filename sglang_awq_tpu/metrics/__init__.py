from sglang_awq_tpu.metrics.collector import SchedulerMetrics

__all__ = ["SchedulerMetrics"]
