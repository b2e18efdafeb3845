"""EPLB: expert distribution recording + rebalancing (reference srt/eplb/)."""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.eplb.expert_distribution import rebalance_order
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

from .test_mixtral import TINY_MIXTRAL, _hf_mixtral


def test_rebalance_order_spreads_load():
    counts = np.array([100, 90, 5, 4, 3, 2, 1, 1])
    perm = rebalance_order(counts, 2)
    assert sorted(perm) == list(range(8))
    a, b = counts[perm[:4]].sum(), counts[perm[4:]].sum()
    # the two hot experts must land on different shards
    assert abs(int(a) - int(b)) <= 12


@pytest.fixture(scope="module")
def eng():
    hf = _hf_mixtral()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(TINY_MIXTRAL))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=1024,
                    chunked_prefill_size=32)
    e = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    yield e
    e.shutdown()


def _gen(eng, prompt, n=6):
    return eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": n, "temperature": 0.0,
                         "ignore_eos": True},
    )["output_ids"]


def test_record_and_relocate(eng):
    runner = eng.runner
    prompt = np.random.default_rng(3).integers(3, 500, 19).tolist()
    base = _gen(eng, prompt)

    def start():
        runner.start_expert_distribution_record()

    eng.run_on_scheduler(start)
    assert eng.flush_cache()
    out = _gen(eng, prompt)
    assert out == base  # recording must not perturb the computation

    dump = runner.dump_expert_distribution()
    assert dump["recording"]
    counts = np.asarray(dump["counts"])
    L, E = counts.shape
    assert (L, E) == (TINY_MIXTRAL["num_hidden_layers"],
                      TINY_MIXTRAL["num_local_experts"])
    # every (token, slot) routing recorded: prefill 19 + decode steps, K=2
    assert counts.sum(axis=1).min() >= 2 * len(prompt)

    # relocation: logits (hence greedy tokens) invariant under the
    # permutation because router columns move with their expert blocks
    perm = {}

    def rebal():
        perm["v"] = runner.rebalance_experts()

    eng.run_on_scheduler(rebal)
    assert sorted(perm["v"]) == list(range(E))
    assert eng.flush_cache()
    assert _gen(eng, prompt) == base

    def stop():
        runner.stop_expert_distribution_record()

    eng.run_on_scheduler(stop)
    assert eng.flush_cache()
    assert _gen(eng, prompt) == base
    # sink detached: counts frozen
    frozen = np.asarray(runner.dump_expert_distribution()["counts"])
    assert not runner.dump_expert_distribution()["recording"]
    _gen(eng, np.random.default_rng(4).integers(3, 500, 9).tolist())
    assert np.array_equal(
        frozen, np.asarray(runner.dump_expert_distribution()["counts"])
    )
