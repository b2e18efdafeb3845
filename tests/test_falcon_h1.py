"""Falcon-H1 (parallel attention + Mamba2) vs HF.

Reference role: `python/sglang/srt/models/falcon_h1.py` + MambaMixer2
(`srt/layers/attention/mamba/mamba.py`); numerics target is HF
`transformers/models/falcon_h1/modeling_falcon_h1.py` torch_forward.
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

CFG = dict(
    architectures=["FalconH1ForCausalLM"],
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16,
    mamba_d_ssm=64, mamba_n_heads=4, mamba_n_groups=2, mamba_d_state=16,
    mamba_d_conv=4, mamba_expand=2, mamba_conv_bias=True,
    mamba_proj_bias=False, mamba_rms_norm=True, mamba_norm_before_gate=True,
    mamba_chunk_size=16,
    attention_in_multiplier=1.5, attention_out_multiplier=0.5,
    ssm_in_multiplier=1.25, ssm_out_multiplier=0.75, key_multiplier=0.8,
    embedding_multiplier=2.0, lm_head_multiplier=0.5,
    mlp_multipliers=[1.2, 0.9], ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.05],
    max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
    tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
)


def _mk():
    import torch
    from transformers import FalconH1Config, FalconH1ForCausalLM as HF

    torch.manual_seed(0)
    hf = HF(FalconH1Config(
        **{k: v for k, v in CFG.items() if k != "architectures"})).eval()
    return hf, _torch_state_dict_to_np(hf.state_dict())


def _engine(tensors, **kw):
    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    sa = ServerArgs(model_path="tiny-fh1", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32, max_running_requests=4, **kw)
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


def test_falcon_h1_matches_hf_greedy():
    import torch

    hf, tensors = _mk()
    rng = np.random.default_rng(0)
    # > 1 chunk of 32: exercises cross-chunk conv + SSM state carry
    prompt = rng.integers(3, 250, 41).tolist()
    n_new = 6
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=n_new, do_sample=False,
        )[0, len(prompt):].tolist()

    eng = _engine(tensors)
    try:
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": n_new, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()
    assert out == ref, (out, ref)


def test_falcon_h1_no_gated_norm_variant():
    """mamba_rms_norm=False path: epilogue is y * silu(z)."""
    import torch
    from transformers import FalconH1Config, FalconH1ForCausalLM as HF

    cfg = dict(CFG, mamba_rms_norm=False, num_hidden_layers=2)
    torch.manual_seed(1)
    hf = HF(FalconH1Config(
        **{k: v for k, v in cfg.items() if k != "architectures"})).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 250, 17).tolist()
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=4, do_sample=False,
        )[0, len(prompt):].tolist()
    mc = ModelConfig(model_path="", hf_config=dict(cfg))
    sa = ServerArgs(model_path="tiny-fh1b", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=4)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()
    assert out == ref, (out, ref)
