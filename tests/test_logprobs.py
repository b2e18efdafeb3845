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


@pytest.mark.slow
def test_input_logprobs_match_hf():
    """logprob_start_len=0 returns prompt-token logprobs matching HF's
    shifted log-softmax (reference extend-token logprobs,
    logits_processor.py:233); exercises chunked prefill stitching."""
    import torch

    hf, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=1024,
                    chunked_prefill_size=32)
    e = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    try:
        rng = np.random.default_rng(3)
        prompt = rng.integers(3, 500, 45).tolist()  # > 1 chunk of 32
        out = e.generate(
            input_ids=prompt,
            sampling_params={
                "max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True,
                "return_logprob": True, "logprob_start_len": 0,
                "top_logprobs_num": 2,
            },
        )
        in_lps = out["meta_info"]["input_token_logprobs"]
        assert in_lps is not None
        # tokens 1..T-1 scored (token 0 has no prefix)
        assert len(in_lps) == len(prompt) - 1
        with torch.no_grad():
            logits = hf(torch.tensor([prompt])).logits[0].float()
        ref_lp = torch.log_softmax(logits, dim=-1)
        for i, (lp, tok) in enumerate(in_lps):
            assert tok == prompt[i + 1]
            ref = float(ref_lp[i, prompt[i + 1]])
            assert abs(lp - ref) < 0.05, (i, lp, ref)
        tops = out["meta_info"]["input_top_logprobs"]
        assert tops is not None and len(tops) == len(in_lps)
        assert all(len(t) == 2 for t in tops)

        # start_len mid-prompt restricts the scored range
        out2 = e.generate(
            input_ids=prompt,
            sampling_params={
                "max_new_tokens": 1, "temperature": 0.0, "ignore_eos": True,
                "return_logprob": True, "logprob_start_len": 20,
            },
        )
        in2 = out2["meta_info"]["input_token_logprobs"]
        assert len(in2) == len(prompt) - 21
        assert in2[0][1] == prompt[21]
    finally:
        e.shutdown()
