"""Chat-template registry + TemplateManager resolution.

Reference role: `python/sglang/lang/chat_template.py` (named registry,
model-path matching) + `srt/managers/template_manager.py` (explicit
name / .jinja / .json override resolution order).
"""

import json

import pytest

from sglang_awq_tpu.lang.chat_template import (
    chat_template_registry,
    get_chat_template,
    match_chat_template,
)
from sglang_awq_tpu.managers.template_manager import TemplateManager
from tests.utils import ByteTokenizer

MSGS = [
    {"role": "system", "content": "Be terse."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
]


def test_llama3_render_exact():
    t = get_chat_template("llama-3-instruct")
    got = t.render(MSGS)
    assert got == (
        "<|start_header_id|>system<|end_header_id|>\n\nBe terse.<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nHi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nHello!<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nBye<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n"
    )
    assert "<|eot_id|>" in t.stop_str


def test_chatml_render_and_default_system():
    t = get_chat_template("qwen")
    got = t.render([{"role": "user", "content": "Hi"}])
    assert got == (
        "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
        "<|im_start|>user\nHi<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_llama2_system_folds_into_first_user():
    t = get_chat_template("llama-2-chat")
    got = t.render([
        {"role": "system", "content": "S"},
        {"role": "user", "content": "U"},
    ], add_generation_prompt=True)
    assert got.startswith("[INST] <<SYS>>\nS\n<</SYS>>\n\nU [/INST]")


def test_match_by_model_path():
    cases = {
        "meta-llama/Meta-Llama-3.1-8B-Instruct": "llama-3-instruct",
        "Qwen/Qwen2.5-72B-Instruct": "qwen",
        "google/gemma-3-27b-it": "gemma-it",
        "deepseek-ai/DeepSeek-V3": "deepseek-v3",
        "mistralai/Mixtral-8x7B-Instruct-v0.1": "mistral",
        "moonshotai/Kimi-Linear-48B-A3B-Instruct": "kimi",
        "some/unknown-model": "default",
    }
    for path, name in cases.items():
        assert match_chat_template(path).name == name, path


def test_manager_named_override_encodes():
    tm = TemplateManager("llama-3-instruct", ByteTokenizer(), "whatever")
    ids, stops = tm.render_ids([{"role": "user", "content": "Hi"}])
    assert ByteTokenizer().decode(ids).endswith(
        "assistant<|end_header_id|>\n\n")
    assert stops == ("<|eot_id|>",)


def test_manager_json_override(tmp_path):
    spec = {
        "name": "my-json",
        "system": ["<s>", "</s>\n"],
        "user": ["U>", "\n"],
        "assistant": ["A>", "\n"],
        "stop_str": ["\nU>"],
    }
    p = tmp_path / "tpl.json"
    p.write_text(json.dumps(spec))
    tm = TemplateManager(str(p), ByteTokenizer(), "x")
    text, stops = tm.render_text([
        {"role": "system", "content": "s"},
        {"role": "user", "content": "u"},
    ])
    assert text == "<s>s</s>\nU>u\nA>"
    assert stops == ("\nU>",)


def test_manager_jinja_override(tmp_path):
    p = tmp_path / "tpl.jinja"
    p.write_text(
        "{% for m in messages %}[{{ m.role }}]{{ m.content }}{% endfor %}"
        "{% if add_generation_prompt %}[assistant]{% endif %}"
    )
    tm = TemplateManager(str(p), ByteTokenizer(), "x")
    ids, _ = tm.render_ids([{"role": "user", "content": "hey"}])
    assert ByteTokenizer().decode(ids) == "[user]hey[assistant]"


def test_manager_unknown_name_raises():
    with pytest.raises(ValueError):
        TemplateManager("no-such-template", ByteTokenizer(), "x")


def test_manager_prefers_builtin_hf_template():
    class Tok(ByteTokenizer):
        chat_template = "{{ messages }}"

        def apply_chat_template(self, messages, tokenize=True,
                                add_generation_prompt=True, tools=None):
            return [1, 2, 3]

    tm = TemplateManager(None, Tok(), "meta-llama/Llama-3-8B-Instruct")
    assert tm.use_hf_template
    ids, stops = tm.render_ids([{"role": "user", "content": "q"}])
    assert ids == [1, 2, 3] and stops == ()


def test_registry_covers_major_families():
    for name in ("chatml", "qwen", "llama-2-chat", "llama-3-instruct",
                 "llama-4", "mistral", "vicuna_v1.1", "gemma-it",
                 "deepseek", "deepseek-v3", "phi-3", "glm-4", "yi-1.5",
                 "granite-3-instruct", "dbrx-instruct", "c4ai-command-r",
                 "internlm2-chat", "falcon-instruct", "baichuan2-chat",
                 "exaone3-instruct", "kimi", "qwen2-vl", "default"):
        assert name in chat_template_registry, name


def test_completion_template_fim_render():
    from sglang_awq_tpu.lang.completion_template import (
        completion_template_registry,
    )

    t = completion_template_registry["deepseek_coder"]
    assert t.render("def f(", "return x") == (
        "<｜fim▁begin｜>def f(<｜fim▁hole｜>return x<｜fim▁end｜>")
    t = completion_template_registry["star_coder"]
    assert t.render("a", "b") == "<fim_prefix>a<fim_suffix>b<fim_middle>"
    assert set(completion_template_registry) >= {
        "deepseek_coder", "star_coder", "qwen_coder", "codellama"}


def test_completion_suffix_requires_template():
    """/v1/completions with suffix but no --completion-template -> 400."""
    import asyncio

    from sglang_awq_tpu.entrypoints.http_server import HttpServer

    class FakeEngine:
        class server_args:
            api_key = None
            completion_template = None
        class tokenizer_manager:
            tokenizer = None

    srv = HttpServer.__new__(HttpServer)
    srv.engine = FakeEngine()

    class FakeReq:
        async def json(self):
            return {"prompt": "def f(", "suffix": "return x",
                    "max_tokens": 4}

    resp = asyncio.new_event_loop().run_until_complete(
        srv.v1_completions(FakeReq()))
    assert resp.status == 400
