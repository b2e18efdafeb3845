"""Gemma3n text model vs HF (AltUp + LAuReL + per-layer embeddings + KV
sharing + activation sparsity).

Reference role: `srt/models/gemma3n_causal.py`; ground truth is
transformers' Gemma3nForCausalLM.
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

CFG = dict(
    architectures=["Gemma3nForCausalLM"],
    vocab_size=512, vocab_size_per_layer_input=512,
    hidden_size=64, intermediate_size=[96] * 6,
    num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, hidden_size_per_layer_input=16,
    altup_num_inputs=4, altup_active_idx=0, altup_coef_clip=120.0,
    altup_correct_scale=True, laurel_rank=8,
    num_kv_shared_layers=2, sliding_window=16,
    layer_types=["sliding_attention", "sliding_attention",
                 "full_attention", "sliding_attention",
                 "sliding_attention", "full_attention"],
    activation_sparsity_pattern=[0.95, 0.95, 0.0, 0.0, 0.0, 0.0],
    hidden_activation="gelu_pytorch_tanh",
    rms_norm_eps=1e-6, rope_theta=1000000.0, rope_local_base_freq=10000.0,
    max_position_embeddings=256, final_logit_softcapping=30.0,
    tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
)


def _mk(seed=0):
    import torch
    from transformers import Gemma3nTextConfig, Gemma3nForCausalLM as HF

    torch.manual_seed(seed)
    cfg = Gemma3nTextConfig(
        **{k: v for k, v in CFG.items() if k != "architectures"})
    hf = HF(cfg).eval()
    # correct_output_scale is zero-init (kills the per-layer-embedding
    # channel); randomize so the AltUp correction path actually matters
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.altup.correct_output_scale.normal_(0.0, 0.5)
    return hf, _torch_state_dict_to_np(hf.state_dict())


def _engine(tensors, **kw):
    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    sa = ServerArgs(model_path="tiny-g3n", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=4, disable_radix_cache=True, **kw)
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


def test_gemma3n_matches_hf_greedy():
    import torch

    hf, tensors = _mk()
    rng = np.random.default_rng(0)
    # > 1 chunk of 32 and > sliding_window: cross-chunk sliding masks +
    # shared-KV layers exercise the pool mapping
    prompt = rng.integers(3, 500, 41).tolist()
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


@pytest.mark.slow
def test_gemma3n_kv_sharing_pool_is_smaller():
    """Only the non-shared layers own pool pages."""
    hf, tensors = _mk(seed=1)
    eng = _engine(tensors)
    try:
        pool = eng.scheduler.runner.kv_cache
        import jax

        leaves = jax.tree.leaves(pool)
        assert leaves[0].shape[0] == 4  # 6 layers - 2 shared
        out = eng.generate(
            input_ids=list(range(3, 30)),
            sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                             "ignore_eos": True})["output_ids"]
        assert len(out) == 3
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_gemma3n_batched_vs_solo():
    """Two prompts served concurrently match their solo runs (pool layer
    mapping + sliding windows under batching)."""
    import threading

    hf, tensors = _mk(seed=2)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 500, 21).tolist(),
               rng.integers(3, 500, 33).tolist()]
    sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
    eng = _engine(tensors)
    try:
        solos = [eng.generate(input_ids=p, sampling_params=dict(sp))[
            "output_ids"] for p in prompts]
        results = [None, None]

        def run(i):
            results[i] = eng.generate(
                input_ids=prompts[i], sampling_params=dict(sp))["output_ids"]

        ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=180)
    finally:
        eng.shutdown()
    assert results == solos, (results, solos)
