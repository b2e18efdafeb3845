"""Logprob return surface (reference return_logprob/top_logprobs_num)."""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors


@pytest.fixture(scope="module")
def eng():
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=1024,
                    chunked_prefill_size=32)
    e = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    yield e
    e.shutdown()


def test_logprobs_returned(eng):
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, 11).tolist()
    out = eng.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 4,
            "temperature": 0.0,
            "ignore_eos": True,
            "return_logprob": True,
            "top_logprobs_num": 3,
        },
    )
    lps = out["meta_info"]["output_token_logprobs"]
    assert lps is not None and len(lps) >= 1
    for lp, tok, _ in lps:
        assert lp <= 0.0
    # greedy: chosen token logprob must equal the max top logprob
    tops = out["meta_info"]["output_top_logprobs"]
    assert tops and len(tops[-1]) == 3
    best = max(tops[-1].values())
    assert abs(best - lps[-1][0]) < 1e-4


def test_no_logprobs_by_default(eng):
    out = eng.generate(
        input_ids=[5, 6, 7],
        sampling_params={"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True},
    )
    assert out["meta_info"]["output_token_logprobs"] is None


def test_penalties_applied(eng):
    """Frequency penalty must break greedy repetition loops."""
    prompt = [7, 8, 9, 7, 8, 9]
    plain = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 12, "temperature": 0.0, "ignore_eos": True},
    )["output_ids"]
    pen = eng.generate(
        input_ids=prompt,
        sampling_params={
            "max_new_tokens": 12,
            "temperature": 0.0,
            "ignore_eos": True,
            "frequency_penalty": 2.0,
        },
    )["output_ids"]
    # the unpenalized run repeats tokens; the penalized one must diverge
    assert plain != pen
    # and produce strictly more distinct tokens
    assert len(set(pen)) >= len(set(plain))
