"""Quantization configs and method registry.

Role model: reference `python/sglang/srt/layers/quantization/__init__.py:50-92`
(23-method registry).  The TPU engine supports the subset that matters for the
north star: AWQ INT4 (W4A16), plus unquantized bf16; KV-cache int8/fp8 hooks.
"""

from sglang_awq_tpu.quantization.awq_config import AWQConfig, detect_quant_config

QUANT_CONFIGS = {
    "awq": AWQConfig,
}

__all__ = ["AWQConfig", "detect_quant_config", "QUANT_CONFIGS"]
