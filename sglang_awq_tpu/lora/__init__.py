from sglang_awq_tpu.lora.lora_manager import LoraManager, load_peft_adapter

__all__ = ["LoraManager", "load_peft_adapter"]
