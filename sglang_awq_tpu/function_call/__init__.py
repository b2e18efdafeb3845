from sglang_awq_tpu.function_call.parser import (
    FunctionCallParser,
    ToolCallItem,
)

__all__ = ["FunctionCallParser", "ToolCallItem"]
