"""Deterministic / batch-invariant inference.

Role model: reference `srt/batch_invariant_ops/` +
`--enable-deterministic-inference` (`scheduler.py:697`): the reference must
swap in fixed-reduction-order GEMM/attention kernels because cuBLAS/split-K
reduction order varies with batch shape.  The TPU design gets this by
construction — XLA dot and the Pallas ragged-attention kernels reduce over
the K/chunk dimension in a fixed sequential order regardless of how many
other rows share the executable — so batch invariance is the default, not a
flag.  These tests pin that property.
"""

import threading

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
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=4096,
                    chunked_prefill_size=64, max_running_requests=8)
    e = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    yield e
    e.shutdown()


def _run(eng, prompt, n=8):
    return eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": n, "temperature": 0.0,
                         "ignore_eos": True, "return_logprob": True},
    )


def test_batch_invariant_decode(eng):
    """A request's tokens AND logprobs must not depend on what else is in
    the continuous batch (different bucket executables included)."""
    rng = np.random.default_rng(7)
    target = rng.integers(3, 500, 33).tolist()
    others = [rng.integers(3, 500, int(ln)).tolist() for ln in (17, 41, 25)]

    solo = _run(eng, target)
    assert eng.flush_cache()  # force full recompute in the batched run

    results = {}

    def worker(key, prompt):
        results[key] = _run(eng, prompt)

    threads = [threading.Thread(target=worker, args=(("t",), target))]
    threads += [
        threading.Thread(target=worker, args=((i,), p))
        for i, p in enumerate(others)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    batched = results[("t",)]

    assert batched["output_ids"] == solo["output_ids"]
    lp_solo = [t[0] for t in solo["meta_info"]["output_token_logprobs"]]
    lp_batch = [t[0] for t in batched["meta_info"]["output_token_logprobs"]]
    # CPU CI caveat: the oneDNN matmuls JAX-on-CPU uses retile with M, so
    # bf16 logits can move by 1 ulp across batch shapes; on TPU the Mosaic
    # matmul reduces K-tiles in fixed order and this is bitwise.  Assert
    # token-exactness above + logprobs within 1 bf16 ulp here.
    np.testing.assert_allclose(lp_batch, lp_solo, rtol=0.01, atol=0.05)


def test_rerun_identical(eng):
    """Same request twice (cold cache both times) -> bitwise-equal logprobs."""
    prompt = np.random.default_rng(9).integers(3, 500, 21).tolist()
    a = _run(eng, prompt)
    assert eng.flush_cache()
    b = _run(eng, prompt)
    assert a["output_ids"] == b["output_ids"]
    lpa = [t[0] for t in a["meta_info"]["output_token_logprobs"]]
    lpb = [t[0] for t in b["meta_info"]["output_token_logprobs"]]
    np.testing.assert_allclose(lpa, lpb, rtol=0, atol=0)
