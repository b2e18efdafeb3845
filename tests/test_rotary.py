"""Rotary scaling variants vs HF's own rope init functions (the oracle
the reference's rotary_embedding.py also matches)."""

import numpy as np

from sglang_awq_tpu.layers.rotary import compute_inv_freq


def _hf_ref(scaling, D=128, theta=500000.0, seq_len=16384):
    from transformers import PretrainedConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    cfg = PretrainedConfig()
    cfg.rope_theta = theta
    cfg.head_dim = D
    cfg.hidden_size = D * 8
    cfg.num_attention_heads = 8
    cfg.max_position_embeddings = seq_len
    cfg.rope_scaling = dict(scaling)
    inv, scale = ROPE_INIT_FUNCTIONS[scaling["rope_type"]](
        cfg, "cpu", seq_len=seq_len
    )
    return inv.numpy(), float(scale)


def _check(scaling):
    ref_inv, ref_scale = _hf_ref(scaling)
    ours, mscale = compute_inv_freq(
        128, 500000.0, scaling, max_positions=16384, trained_max=16384
    )
    np.testing.assert_allclose(ours, ref_inv, rtol=2e-5)
    assert abs(mscale - ref_scale) < 1e-6


def test_yarn_matches_hf():
    _check({"rope_type": "yarn", "factor": 4.0,
            "original_max_position_embeddings": 4096})


def test_dynamic_ntk_matches_hf():
    _check({"rope_type": "dynamic", "factor": 2.0})


def test_llama3_matches_hf():
    _check({"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192})


def test_linear_and_default():
    inv0, s0 = compute_inv_freq(64, 10000.0, None)
    invl, _ = compute_inv_freq(64, 10000.0, {"type": "linear", "factor": 2.0})
    np.testing.assert_allclose(invl, inv0 / 2.0, rtol=1e-6)
    assert s0 == 1.0


def _hf_longrope(seq_len, max_pos, orig_max, short, long, D=128,
                 theta=10000.0):
    from transformers import PretrainedConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    cfg = PretrainedConfig()
    cfg.rope_theta = theta
    cfg.head_dim = D
    cfg.hidden_size = D * 8
    cfg.num_attention_heads = 8
    cfg.max_position_embeddings = max_pos
    cfg.original_max_position_embeddings = orig_max
    cfg.rope_scaling = {"rope_type": "longrope", "short_factor": short,
                        "long_factor": long}
    inv, scale = ROPE_INIT_FUNCTIONS["longrope"](cfg, "cpu", seq_len=seq_len)
    return inv.numpy(), float(scale)


def test_longrope_matches_hf_both_regimes():
    rng = np.random.default_rng(0)
    short = (1.0 + rng.random(64) * 0.1).tolist()
    long = (1.0 + rng.random(64) * 4.0).tolist()
    scaling = {"rope_type": "longrope", "short_factor": short,
               "long_factor": long,
               "original_max_position_embeddings": 4096}
    # long regime: serving window (trained_max) beyond the original window
    ref_inv, ref_scale = _hf_longrope(16384, 16384, 4096, short, long)
    ours, mscale = compute_inv_freq(
        128, 10000.0, scaling, max_positions=16384, trained_max=16384
    )
    np.testing.assert_allclose(ours, ref_inv, rtol=2e-5)
    assert abs(mscale - ref_scale) < 1e-6
    # short regime: serving inside the original window
    ref_inv, ref_scale = _hf_longrope(4096, 4096, 4096, short, long)
    ours, mscale = compute_inv_freq(
        128, 10000.0, scaling, max_positions=4096, trained_max=4096
    )
    np.testing.assert_allclose(ours, ref_inv, rtol=2e-5)
    assert abs(mscale - ref_scale) < 1e-6
