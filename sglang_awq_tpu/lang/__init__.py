"""sgl: the frontend DSL (reference `python/sglang/lang/`).

    import sglang_awq_tpu.lang as sgl

    @sgl.function
    def qa(s, question):
        s += sgl.system("You are terse.")
        s += sgl.user(question)
        s += sgl.assistant(sgl.gen("answer", max_tokens=32))

    state = qa.run(question="2+2?", backend=sgl.EngineBackend(engine))
    state["answer"]
"""

from sglang_awq_tpu.lang.ir import (
    assistant,
    gen,
    select,
    system,
    user,
)
from sglang_awq_tpu.lang.interpreter import (
    EngineBackend,
    OpenAIBackend,
    RuntimeEndpoint,
    function,
    set_default_backend,
)

__all__ = [
    "assistant",
    "function",
    "gen",
    "select",
    "system",
    "user",
    "EngineBackend",
    "OpenAIBackend",
    "RuntimeEndpoint",
    "set_default_backend",
]
