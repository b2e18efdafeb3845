from sglang_awq_tpu.model_executor.model_runner import ModelRunner

__all__ = ["ModelRunner"]
