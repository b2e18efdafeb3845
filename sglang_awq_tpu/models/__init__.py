from sglang_awq_tpu.models.registry import get_model_class

__all__ = ["get_model_class"]
