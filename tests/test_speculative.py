"""Ngram speculative decoding: outputs must match non-speculative greedy
exactly (greedy acceptance is lossless).
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs
from sglang_awq_tpu.speculative.ngram import NgramCache

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors


def test_ngram_cache_draft():
    c = NgramCache(n=2)
    c.update([1, 2, 3, 1, 2, 3, 1, 2, 3])
    assert c.draft([9, 1, 2], 3) == [3, 1, 2]
    assert c.draft([7, 8], 3) == []  # unseen context


def _make_engine(spec: bool):
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(
        model_path="tiny",
        page_size=8,
        max_total_tokens=2048,
        chunked_prefill_size=32,
        speculative_algorithm="ngram" if spec else None,
        speculative_num_draft_tokens=4,
    )
    return Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)


def test_spec_matches_plain_greedy():
    rng = np.random.default_rng(0)
    base = rng.integers(3, 500, 8).tolist()
    # repetitive prompt so ngram drafts actually fire
    prompt = base * 4
    sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}

    eng_plain = _make_engine(spec=False)
    try:
        ref = eng_plain.generate(input_ids=prompt, sampling_params=dict(sp))["output_ids"]
    finally:
        eng_plain.shutdown()

    eng_spec = _make_engine(spec=True)
    try:
        out = eng_spec.generate(input_ids=prompt, sampling_params=dict(sp))["output_ids"]
        # also a second request to exercise cache reuse + spec together
        out2 = eng_spec.generate(input_ids=prompt, sampling_params=dict(sp))["output_ids"]
        sched = eng_spec.scheduler
        accept_rate = sched.spec_accept_sum / max(sched.spec_steps, 1)
    finally:
        eng_spec.shutdown()

    assert out == ref, (out, ref)
    assert out2 == ref
    # with a repetitive model/prompt, at least SOME drafts must be accepted
    assert accept_rate > 1.0, accept_rate


def test_spec_with_sampled_request_falls_back():
    """Non-greedy requests must still work (batch falls back to plain decode)."""
    eng = _make_engine(spec=True)
    try:
        out = eng.generate(
            input_ids=[5, 6, 7, 8] * 3,
            sampling_params={"max_new_tokens": 6, "temperature": 0.9, "seed": 1,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 6
    finally:
        eng.shutdown()


def test_cpp_ngram_parity():
    from sglang_awq_tpu.speculative.ngram_cpp import CppNgramCache, cpp_ngram_available

    if not cpp_ngram_available():
        pytest.skip("no C++ toolchain")
    py = NgramCache(n=2)
    cc = CppNgramCache(n=2)
    seq = [1, 2, 3, 1, 2, 3, 1, 2, 4, 1, 2, 3]
    py.update(seq)
    cc.update(seq)
    for ctx in ([9, 1, 2], [2, 3], [7, 8], [3, 1]):
        assert cc.draft(ctx, 4) == py.draft(ctx, 4), ctx
