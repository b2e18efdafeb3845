"""EAGLE3 draft (aux-hidden fusion) — reference `llama_eagle3.py:186`.

Losslessness is the core property: whatever the draft proposes (random
weights, its own draft-vocab head, d2t-mapped ids), greedy output equals
the plain engine's.  The aux plumbing (target captures the inputs of three
layers -> [T, 3H] -> draft fc) is exercised end to end by the same runs —
a width mismatch anywhere would fail at trace time.
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs
from sglang_awq_tpu.speculative.eagle_draft import (
    Eagle3DraftModel,
    is_eagle3_checkpoint,
    load_draft_params_eagle3,
)

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors

H = TINY_LLAMA_CFG["hidden_size"]
DV = 128  # draft vocab (subset of the target's 512)


def _eagle3_tensors(seed=13):
    rng = np.random.default_rng(seed)
    I = TINY_LLAMA_CFG["intermediate_size"]
    nh = TINY_LLAMA_CFG["num_attention_heads"]
    nkv = TINY_LLAMA_CFG["num_key_value_heads"]
    hd = H // nh

    def w(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    d2t = ((np.arange(DV) * 3 + 7) % TINY_LLAMA_CFG["vocab_size"]
           - np.arange(DV)).astype(np.int64)
    return {
        "fc.weight": w(H, 3 * H),  # torch layout [out, in=3H]
        "midlayer.self_attn.q_proj.weight": w(nh * hd, 2 * H),
        "midlayer.self_attn.k_proj.weight": w(nkv * hd, 2 * H),
        "midlayer.self_attn.v_proj.weight": w(nkv * hd, 2 * H),
        "midlayer.self_attn.o_proj.weight": w(H, nh * hd),
        "midlayer.mlp.gate_proj.weight": w(I, H),
        "midlayer.mlp.up_proj.weight": w(I, H),
        "midlayer.mlp.down_proj.weight": w(H, I),
        "midlayer.input_layernorm.weight": np.ones(H, np.float32),
        "midlayer.hidden_norm.weight": np.ones(H, np.float32),
        "midlayer.post_attention_layernorm.weight": np.ones(H, np.float32),
        "norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(DV, H),
        "d2t": d2t,
    }


def _draft_cfg():
    cfg = dict(TINY_LLAMA_CFG, num_hidden_layers=1)
    return ModelConfig(model_path="", hf_config=cfg)


def _engine(eagle3: bool, topk=1):
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(
        model_path="tiny", page_size=8, max_total_tokens=2048,
        chunked_prefill_size=64,
        speculative_algorithm="eagle" if eagle3 else None,
        speculative_num_draft_tokens=4,
        speculative_eagle_topk=topk,
    )
    kw = {}
    if eagle3:
        kw = dict(draft_config=_draft_cfg(), draft_tensors=_eagle3_tensors())
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None, **kw)


def test_eagle3_detection_and_loader():
    t = _eagle3_tensors()
    assert is_eagle3_checkpoint(t, H)
    m = Eagle3DraftModel(config=_draft_cfg(), target_hidden_size=H)
    p = load_draft_params_eagle3(m, t)
    assert p["fc"]["weight"].shape == (3 * H, H)
    assert p["layers"]["hidden_norm"].shape == (1, H)
    assert p["lm_head"]["weight"].shape == (H, DV)
    # d2t: draft id -> target id, in range
    import jax.numpy as jnp

    ids = m.map_draft_ids(p, jnp.arange(DV, dtype=jnp.int32))
    ids = np.asarray(ids)
    assert ids.min() >= 0 and ids.max() < TINY_LLAMA_CFG["vocab_size"]
    assert (ids == (np.arange(DV) * 3 + 7) % TINY_LLAMA_CFG["vocab_size"]).all()


@pytest.mark.slow
def test_eagle3_chain_matches_plain_greedy():
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 500, 27).tolist()
    sp = {"max_new_tokens": 14, "temperature": 0.0, "ignore_eos": True}

    eng_plain = _engine(False)
    try:
        ref = eng_plain.generate(input_ids=prompt, sampling_params=dict(sp))[
            "output_ids"]
    finally:
        eng_plain.shutdown()

    eng = _engine(True)
    try:
        assert eng.scheduler.runner.model.aux_capture_layers
        out = eng.generate(input_ids=prompt, sampling_params=dict(sp))[
            "output_ids"]
        assert eng.scheduler.spec_steps > 0
    finally:
        eng.shutdown()
    assert out == ref, (out, ref)


@pytest.mark.slow
def test_eagle3_scored_tree_matches_plain_greedy():
    rng = np.random.default_rng(6)
    prompt = rng.integers(3, 500, 21).tolist()
    sp = {"max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True}

    eng_plain = _engine(False)
    try:
        ref = eng_plain.generate(input_ids=prompt, sampling_params=dict(sp))[
            "output_ids"]
    finally:
        eng_plain.shutdown()

    eng = _engine(True, topk=2)
    try:
        out = eng.generate(input_ids=prompt, sampling_params=dict(sp))[
            "output_ids"]
        assert eng.scheduler.spec_tree_scored
        assert eng.scheduler.spec_steps > 0
    finally:
        eng.shutdown()
    assert out == ref, (out, ref)


@pytest.mark.slow
def test_eagle3_tp2_matches_canonical_greedy():
    """EAGLE3 under tp=2 (replicated aux-fusion draft + GSPMD draft fns,
    wrapped sharded verify with 3H aux-hidden capture) reproduces the
    canonical tp=1 greedy chain."""
    _, tensors = tiny_hf_model_and_tensors()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 250, 27).tolist()
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    outs = {}
    for tp, e3 in ((1, False), (2, True)):
        mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
        sa = ServerArgs(
            model_path=f"tiny-e3tp{tp}", page_size=8, max_total_tokens=2048,
            chunked_prefill_size=64, tp_size=tp,
            speculative_algorithm="eagle" if e3 else None,
            speculative_num_draft_tokens=4,
        )
        kw = {}
        if e3:
            kw = dict(draft_config=_draft_cfg(),
                      draft_tensors=_eagle3_tensors())
        eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                     tokenizer=None, **kw)
        try:
            outs[tp] = eng.generate(
                input_ids=prompt, sampling_params=dict(sp))["output_ids"]
        finally:
            eng.shutdown()
    assert outs[2] == outs[1], outs
