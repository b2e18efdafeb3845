"""DeepSeek-V2/V3 (MLA + DeepSeekMoE) logit equivalence vs HF.

Covers: absorbed-MLA attention against HF's materialized per-head K/V,
q_lora on/off, first-k-dense layer split, greedy / group-limited / noaux-tc
routing, shared experts, and the engine decode path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np, load_model

from .test_model_zoo import _check_vs_hf, _run_extend

BASE = dict(
    vocab_size=512,
    hidden_size=128,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=4,
    intermediate_size=224,  # dense-layer MLP size
    kv_lora_rank=64,
    qk_rope_head_dim=16,
    qk_nope_head_dim=32,
    v_head_dim=32,
    q_lora_rank=None,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
    attention_bias=False,
    attention_dropout=0.0,
)


def _mk_v2(cfg_over):
    import torch
    from transformers import DeepseekV2Config
    from transformers.models.deepseek_v2 import DeepseekV2ForCausalLM as HFV2

    cfg = dict(BASE, architectures=["DeepseekV2ForCausalLM"], **cfg_over)
    torch.manual_seed(0)
    hf = HFV2(
        DeepseekV2Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    return hf, cfg


def test_mla_dense_matches_hf():
    """MLA attention only: first_k_dense >= L -> every layer dense MLP."""
    hf, cfg = _mk_v2(dict(n_routed_experts=8, moe_intermediate_size=96,
                          num_experts_per_tok=2, first_k_dense_replace=3))
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 13).tolist())


def test_mla_q_lora_matches_hf():
    hf, cfg = _mk_v2(dict(n_routed_experts=8, moe_intermediate_size=96,
                          num_experts_per_tok=2, first_k_dense_replace=3,
                          q_lora_rank=48))
    rng = np.random.default_rng(1)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 11).tolist())


def test_deepseek_v2_moe_matches_hf():
    """V2-Lite shape: greedy top-k + shared experts + 1 dense layer."""
    hf, cfg = _mk_v2(dict(
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=96,
        n_shared_experts=2, first_k_dense_replace=1, moe_layer_freq=1,
        routed_scaling_factor=1.0, topk_method="greedy", n_group=1,
        topk_group=1, norm_topk_prob=False, scoring_func="softmax",
        aux_loss_alpha=0.0, seq_aux=False,
    ))
    rng = np.random.default_rng(2)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 13).tolist())


def test_deepseek_v2_group_limited_matches_hf():
    hf, cfg = _mk_v2(dict(
        n_routed_experts=8, num_experts_per_tok=3, moe_intermediate_size=96,
        n_shared_experts=1, first_k_dense_replace=1, moe_layer_freq=1,
        routed_scaling_factor=1.5, topk_method="group_limited_greedy",
        n_group=4, topk_group=2, norm_topk_prob=False,
        scoring_func="softmax", aux_loss_alpha=0.0, seq_aux=False,
    ))
    rng = np.random.default_rng(3)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 12).tolist())


def test_deepseek_v3_matches_hf():
    """V3: sigmoid scores + noaux-tc group selection + norm_topk."""
    import torch
    from transformers import DeepseekV3Config
    from transformers.models.deepseek_v3 import DeepseekV3ForCausalLM as HFV3

    cfg = dict(
        BASE,
        architectures=["DeepseekV3ForCausalLM"],
        q_lora_rank=48,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=96,
        n_shared_experts=1, first_k_dense_replace=1, moe_layer_freq=1,
        routed_scaling_factor=2.0, topk_method="noaux_tc", n_group=4,
        topk_group=2, norm_topk_prob=True, scoring_func="sigmoid",
        aux_loss_alpha=0.0, seq_aux=False,
    )
    torch.manual_seed(0)
    hf = HFV3(
        DeepseekV3Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    # make the correction bias non-trivial: selection and weights diverge
    with torch.no_grad():
        for layer in hf.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    rng = np.random.default_rng(4)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 13).tolist())


def test_mla_engine_decode_matches_hf():
    """Engine e2e greedy decode == HF greedy (prefill + decode KV paths)."""
    import torch

    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.server_args import ServerArgs

    hf, cfg = _mk_v2(dict(
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=96,
        n_shared_experts=2, first_k_dense_replace=1, moe_layer_freq=1,
        routed_scaling_factor=1.0, topk_method="greedy", n_group=1,
        topk_group=1, norm_topk_prob=False, scoring_func="softmax",
        aux_loss_alpha=0.0, seq_aux=False,
    ))
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(cfg))
    sa = ServerArgs(
        model_path="tiny-dsv2", page_size=8, max_total_tokens=1024,
        chunked_prefill_size=32, max_running_requests=4, watchdog_timeout=60,
    )
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        rng = np.random.default_rng(5)
        prompt = rng.integers(3, 500, 9).tolist()
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        ids = torch.tensor([prompt])
        with torch.no_grad():
            ref = hf.generate(
                ids, max_new_tokens=8, do_sample=False,
                pad_token_id=0,
            )[0, len(prompt):].tolist()
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


@pytest.mark.slow
def test_mla_latent_layout_tp4_matches_tp1():
    """Round 5 (VERDICT #4): the single-copy latent pool survives TP.

    The latent row is identical on every shard (kv_a is replicated), so
    the 4-dim latent pool is REPLICATED over the model axis rather than
    lane-sharded (parallel/sharding.kv_pspec) — pool bytes stay 1.0x
    minimal per device at tp>1 (reference stores one latent row
    regardless of TP, memory_pool.py:1396).  Geometry picked so the
    latent row is lane-aligned (kv_lora_rank+rope = 128)."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from sglang_awq_tpu.model_executor.forward_batch import (
        DecodeInput, ExtendBatchInput, SamplingRow)
    from sglang_awq_tpu.model_executor.model_runner import ModelRunner
    from sglang_awq_tpu.server_args import ServerArgs

    hf, cfg = _mk_v2(dict(
        kv_lora_rank=112, qk_rope_head_dim=16,
        n_routed_experts=8, moe_intermediate_size=96,
        num_experts_per_tok=2, first_k_dense_replace=3,
    ))
    tensors = _torch_state_dict_to_np(hf.state_dict())
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, 21).tolist()
    T = len(prompt)
    ps = 8

    out = {}
    for tp in (1, 4):
        mc = ModelConfig(model_path="", hf_config=dict(cfg))
        sa = ServerArgs(model_path="ds", page_size=ps, max_total_tokens=512,
                        chunked_prefill_size=64, tp_size=tp)
        r = ModelRunner(sa, model_config=mc, tensors=tensors)
        assert r.kv_spec.layout == "latent", (tp, r.kv_spec.layout)
        assert r.kv_cache.ndim == 4
        pages = np.arange(8, dtype=np.int32)
        pos = np.arange(T, dtype=np.int32)
        slots = pages[pos // ps] * ps + pos % ps
        ids0, _ = r.forward_extend_batch(ExtendBatchInput(
            tokens=np.asarray(prompt, np.int32), positions=pos, slots=slots,
            page_table=pages[None, :], kv_lens=np.asarray([T], np.int32),
            q_lens=np.asarray([T], np.int32),
            qb_base=np.asarray([0], np.int32), sampling=[SamplingRow()],
        ))
        toks = [int(ids0[0])]
        for j in range(3):
            p = T + j
            d = DecodeInput(
                tokens=np.asarray([toks[-1]], np.int32),
                positions=np.asarray([p], np.int32),
                slots=np.asarray([pages[p // ps] * ps + p % ps], np.int32),
                page_table=pages[None, :],
                lengths=np.asarray([p + 1], np.int32),
                sample_steps=np.asarray([j + 1], np.int32),
                sampling=[SamplingRow()],
            )
            ids, _ = r.forward_decode(d)
            toks.append(int(ids[0]))
        out[tp] = toks
    assert out[1] == out[4], out
