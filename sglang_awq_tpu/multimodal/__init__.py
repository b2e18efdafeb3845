from sglang_awq_tpu.multimodal.vision import ClipVisionTower

__all__ = ["ClipVisionTower"]
