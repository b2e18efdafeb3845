from sglang_awq_tpu.parser.reasoning_parser import ReasoningParser

__all__ = ["ReasoningParser"]
