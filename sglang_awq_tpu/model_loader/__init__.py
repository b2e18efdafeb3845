from sglang_awq_tpu.model_loader.loader import load_model, load_params_from_tensors

__all__ = ["load_model", "load_params_from_tensors"]
