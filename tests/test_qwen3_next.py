"""Qwen3-Next (hybrid gated-deltanet linear attention) vs HF.

Reference role: `python/sglang/srt/models/qwen3_next.py` + the hybrid
state pool (`srt/mem_cache/memory_pool.py:1055`).
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

CFG = dict(
    architectures=["Qwen3NextForCausalLM"],
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
    layer_types=["linear_attention", "linear_attention",
                 "linear_attention", "full_attention"],
    head_dim=16,
    linear_num_value_heads=4, linear_num_key_heads=2,
    linear_key_head_dim=16, linear_value_head_dim=16,
    linear_conv_kernel_dim=4,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
    shared_expert_intermediate_size=32, decoder_sparse_step=1,
    norm_topk_prob=True,
    max_position_embeddings=128, rms_norm_eps=1e-5, rope_theta=10000.0,
    partial_rotary_factor=0.25, tie_word_embeddings=False,
    bos_token_id=1, eos_token_id=2,
)


def _mk():
    import torch
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM as HF

    torch.manual_seed(0)
    hf = HF(Qwen3NextConfig(
        **{k: v for k, v in CFG.items() if k != "architectures"})).eval()
    return hf, _torch_state_dict_to_np(hf.state_dict())


def _engine(tensors, **kw):
    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    sa = ServerArgs(model_path="tiny-q3n", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32, max_running_requests=4, **kw)
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


def test_qwen3_next_matches_hf_greedy():
    import torch

    hf, tensors = _mk()
    rng = np.random.default_rng(0)
    # > 1 chunk of 32: exercises cross-chunk conv + recurrent state carry
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


def test_qwen3_next_concurrent_state_isolation():
    """Two interleaved requests must keep independent recurrent state
    (per-row pools); each must match its solo run."""
    import threading

    hf, tensors = _mk()
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 250, 21).tolist(),
               rng.integers(3, 250, 17).tolist()]
    sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}

    eng = _engine(tensors)
    try:
        solos = [eng.generate(input_ids=p, sampling_params=dict(sp))[
            "output_ids"] for p in prompts]
        results = [None, None]

        def run(i):
            results[i] = eng.generate(
                input_ids=prompts[i], sampling_params=dict(sp))["output_ids"]

        ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=180)
    finally:
        eng.shutdown()
    assert results[0] == solos[0], (results[0], solos[0])
    assert results[1] == solos[1], (results[1], solos[1])
