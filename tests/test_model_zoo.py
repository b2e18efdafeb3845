"""Model-zoo logit equivalence vs HF: Qwen2-MoE and Gemma.

(Llama/Qwen2/Qwen3/Mixtral covered in their own files.)
"""

import numpy as np
import pytest

# HF-equivalence tests load torch reference models: slow tier
pytestmark = pytest.mark.slow

import jax.numpy as jnp

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np, load_model


def _run_extend(model, params, prompt, ps=8):
    spec = KVPoolSpec(model.config.num_layers, model.kvh, 16, ps,
                      model.head_dim)
    kv = spec.alloc()
    T = len(prompt)
    T_pad = max((T + 15) // 16 * 16, 16)
    pages = list(range(1, T_pad // ps + 1))
    slots = np.full(T_pad, PAD_SLOT, np.int32)
    for i in range(T):
        slots[i] = pages[i // ps] * ps + i % ps
    logits, _ = model.extend_step(
        params, kv, model.rope(),
        jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32),
        jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32),
        jnp.asarray(slots),
        jnp.asarray(np.asarray(pages, np.int32)[None, :]),
        jnp.asarray([T], jnp.int32), jnp.asarray([T], jnp.int32),
        jnp.asarray([0], jnp.int32), block_q=16,
    )
    return np.asarray(logits[0])


def _check_vs_hf(hf, cfg_dict, prompt, atol=0.3):
    import torch

    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(cfg_dict))
    model, params = load_model(mc, tensors=tensors)
    ours = _run_extend(model, params, prompt)
    with torch.no_grad():
        ref = hf(torch.tensor([prompt])).logits[0, -1].float().numpy()
    assert np.argmax(ours) == np.argmax(ref), (
        int(np.argmax(ours)), int(np.argmax(ref)))
    assert np.abs(ours - ref).max() < atol, np.abs(ours - ref).max()


def test_qwen2_moe_matches_hf():
    import torch
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    cfg = dict(
        architectures=["Qwen2MoeForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448,  # dense size (unused: all layers sparse)
        moe_intermediate_size=128, shared_expert_intermediate_size=192,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        decoder_sparse_step=1, mlp_only_layers=[],
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Qwen2MoeForCausalLM(
        Qwen2MoeConfig(**{k: v for k, v in cfg.items()
                          if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 13).tolist())


def test_gemma_matches_hf():
    import torch
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = dict(
        architectures=["GemmaForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_act="gelu_pytorch_tanh",
        rms_norm_eps=1e-6, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = GemmaForCausalLM(
        GemmaConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(1)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 11).tolist())


def test_gemma2_matches_hf():
    """Gemma-2: sandwich norms, logit softcaps, query_pre_attn_scalar AND
    alternating sliding-window layers (prompt longer than the window)."""
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    cfg = dict(
        architectures=["Gemma2ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_act="gelu_pytorch_tanh",
        rms_norm_eps=1e-6, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=True,
        query_pre_attn_scalar=24, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=16,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Gemma2ForCausalLM(
        Gemma2Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(2)
    # 27 tokens > window 16: the sliding layers genuinely clip
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 27).tolist(), atol=0.4)


def test_phi3_matches_hf():
    """Phi-3: fused qkv/gate_up checkpoint split + longrope + uniform SWA."""
    import torch
    from transformers import Phi3Config
    from transformers import Phi3ForCausalLM as HFPhi3

    D2 = 16  # head_dim 32 -> factor lists of 16
    cfg = dict(
        architectures=["Phi3ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="silu",
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256,
        original_max_position_embeddings=256,  # short regime end to end
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0 + 0.05 * i for i in range(D2)],
                      "long_factor": [1.0 + 0.3 * i for i in range(D2)]},
        sliding_window=8,  # < prompt length: SWA active on every layer
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFPhi3(
        Phi3Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 24).tolist())


def test_olmo2_matches_hf():
    """OLMo-2: post-norm residual stream + full-width joint q/k norms."""
    import torch
    from transformers import Olmo2Config
    from transformers import Olmo2ForCausalLM as HFOlmo2

    cfg = dict(
        architectures=["Olmo2ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="silu",
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFOlmo2(
        Olmo2Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(1)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist())


def test_cohere_matches_hf():
    """Command-R: parallel residual, LayerNorm, interleaved rope,
    logit_scale, tied embeddings."""
    import torch
    from transformers import CohereConfig
    from transformers import CohereForCausalLM as HFCohere

    cfg = dict(
        architectures=["CohereForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="silu",
        layer_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, logit_scale=0.25,
        tie_word_embeddings=True, use_qk_norm=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFCohere(
        CohereConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(3)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 19).tolist())


def test_granite_matches_hf():
    """Granite 3: the four muP-style scalar multipliers on the Llama graph."""
    import torch
    from transformers import GraniteConfig
    from transformers import GraniteForCausalLM as HFGranite

    cfg = dict(
        architectures=["GraniteForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="silu",
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256,
        embedding_multiplier=12.0, attention_multiplier=0.0078125,
        residual_multiplier=0.22, logits_scaling=8.0,
        attention_bias=False, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFGranite(
        GraniteConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(4)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 15).tolist())


def test_gemma3_matches_hf():
    """Gemma-3 text: dual rope tables (local theta on sliding layers),
    per-head (1+w) q/k norms, layer_types sliding pattern."""
    import torch
    from transformers import Gemma3TextConfig
    from transformers import Gemma3ForCausalLM as HFGemma3

    cfg = dict(
        architectures=["Gemma3ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=3,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_activation="gelu_pytorch_tanh",
        rms_norm_eps=1e-5, rope_theta=100000.0,
        rope_local_base_freq=10000.0,
        rope_scaling={"rope_type": "linear", "factor": 2.0},
        layer_types=["sliding_attention", "sliding_attention",
                     "full_attention"],
        sliding_window=8, query_pre_attn_scalar=32,
        max_position_embeddings=256, tie_word_embeddings=True,
        attention_bias=False, attn_logit_softcapping=None,
        final_logit_softcapping=None,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFGemma3(
        Gemma3TextConfig(
            **{k: v for k, v in cfg.items() if k != "architectures"}
        )
    ).eval()
    rng = np.random.default_rng(5)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 24).tolist())


def test_gemma3_engine_decode():
    """Dual-table selection inside the decode scan + SWA windows e2e."""
    import torch
    from transformers import Gemma3TextConfig
    from transformers import Gemma3ForCausalLM as HFGemma3

    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.server_args import ServerArgs

    cfg = dict(
        architectures=["Gemma3ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=3,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_activation="gelu_pytorch_tanh",
        rms_norm_eps=1e-5, rope_theta=100000.0,
        rope_local_base_freq=10000.0, rope_scaling=None,
        layer_types=["sliding_attention", "sliding_attention",
                     "full_attention"],
        sliding_window=8, query_pre_attn_scalar=32,
        max_position_embeddings=256, tie_word_embeddings=True,
        attention_bias=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFGemma3(
        Gemma3TextConfig(
            **{k: v for k, v in cfg.items() if k != "architectures"}
        )
    ).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(cfg))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        prompt = np.random.default_rng(6).integers(3, 500, 21).tolist()
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False
            )[0, len(prompt):].tolist()
        assert out == ref, (out, ref)
    finally:
        eng.shutdown()


def test_qwen3_moe_matches_hf():
    """Qwen3-MoE: no shared expert, no qkv bias, per-head qk-norm."""
    import torch
    from transformers import Qwen3MoeConfig
    from transformers import Qwen3MoeForCausalLM as HFQwen3Moe

    cfg = dict(
        architectures=["Qwen3MoeForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, moe_intermediate_size=128,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFQwen3Moe(
        Qwen3MoeConfig(**{k: v for k, v in cfg.items()
                          if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(7)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 13).tolist())


def test_starcoder2_matches_hf():
    """StarCoder2: biased LayerNorms, non-gated gelu MLP, biases on every
    projection (row-parallel ones added once, after the psum)."""
    import torch
    from transformers import Starcoder2Config
    from transformers import Starcoder2ForCausalLM as HFStarcoder2

    cfg = dict(
        architectures=["Starcoder2ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="gelu_pytorch_tanh",
        norm_epsilon=1e-5, rope_theta=10000.0, use_bias=True,
        sliding_window=8, max_position_embeddings=256,
        tie_word_embeddings=True, residual_dropout=0.0,
        embedding_dropout=0.0, attention_dropout=0.0,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFStarcoder2(
        Starcoder2Config(
            **{k: v for k, v in cfg.items() if k != "architectures"}
        )
    ).eval()
    rng = np.random.default_rng(8)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 24).tolist())


def test_nemotron_matches_hf():
    """Nemotron: LayerNorm1P, squared-ReLU MLP, partial rotary (0.5)."""
    import torch
    from transformers import NemotronConfig
    from transformers import NemotronForCausalLM as HFNemotron

    cfg = dict(
        architectures=["NemotronForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="relu2",
        norm_eps=1e-5, rope_theta=10000.0, partial_rotary_factor=0.5,
        mlp_bias=False, attention_bias=False,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFNemotron(
        NemotronConfig(**{k: v for k, v in cfg.items()
                          if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(9)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_phi2_matches_hf():
    """Phi-1.5/2: parallel residual + partial rotary + lm_head bias."""
    import torch
    from transformers import PhiConfig
    from transformers import PhiForCausalLM as HFPhi

    cfg = dict(
        architectures=["PhiForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="gelu_new",
        layer_norm_eps=1e-5, rope_theta=10000.0,
        partial_rotary_factor=0.5, qk_layernorm=False,
        resid_pdrop=0.0, embd_pdrop=0.0, attention_dropout=0.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFPhi(
        PhiConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(10)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_stablelm_matches_hf():
    """StableLM: biased LayerNorms + 0.25 partial rotary + qkv biases."""
    import torch
    from transformers import StableLmConfig
    from transformers import StableLmForCausalLM as HFStableLm

    cfg = dict(
        architectures=["StableLmForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="silu",
        layer_norm_eps=1e-5, rope_theta=10000.0,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        use_parallel_residual=False, qk_layernorm=False,
        attention_dropout=0.0, hidden_dropout=0.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFStableLm(
        StableLmConfig(**{k: v for k, v in cfg.items()
                          if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(11)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_granitemoe_matches_hf():
    """GraniteMoe: fused 3D expert tensors + post-topk-softmax router +
    the Granite multipliers."""
    import torch
    from transformers import GraniteMoeConfig
    from transformers import GraniteMoeForCausalLM as HFGraniteMoe

    cfg = dict(
        architectures=["GraniteMoeForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=128, num_local_experts=4, num_experts_per_tok=2,
        hidden_act="silu", rms_norm_eps=1e-5, rope_theta=10000.0,
        embedding_multiplier=12.0, attention_multiplier=0.0078125,
        residual_multiplier=0.22, logits_scaling=8.0,
        attention_bias=False, max_position_embeddings=256,
        tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFGraniteMoe(
        GraniteMoeConfig(**{k: v for k, v in cfg.items()
                            if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(12)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 15).tolist())


def test_gpt_neox_matches_hf():
    """GPT-NeoX/Pythia: dual-norm parallel residual, per-head-interleaved
    fused qkv de-interleave, 0.25 partial rotary, exact gelu."""
    import torch
    from transformers import GPTNeoXConfig
    from transformers import GPTNeoXForCausalLM as HFNeoX

    cfg = dict(
        architectures=["GPTNeoXForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, intermediate_size=448, hidden_act="gelu",
        layer_norm_eps=1e-5, rotary_pct=0.25, rotary_emb_base=10000,
        use_parallel_residual=True, attention_dropout=0.0,
        hidden_dropout=0.0, max_position_embeddings=256,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFNeoX(
        GPTNeoXConfig(**{k: v for k, v in cfg.items()
                         if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(13)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_olmo_v1_matches_hf():
    """OLMo v1: non-parametric LayerNorms + clip_qkv."""
    import torch
    from transformers import OlmoConfig
    from transformers import OlmoForCausalLM as HFOlmo

    cfg = dict(
        architectures=["OlmoForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="silu", clip_qkv=0.2,
        rope_theta=10000.0, max_position_embeddings=256,
        tie_word_embeddings=False, attention_bias=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFOlmo(
        OlmoConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(14)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_helium_matches_hf():
    """Helium: Llama graph with interleaved rotary pairs."""
    import torch
    from transformers import HeliumConfig
    from transformers import HeliumForCausalLM as HFHelium

    cfg = dict(
        architectures=["HeliumForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_act="silu", rms_norm_eps=1e-8,
        rope_theta=10000.0, attention_bias=False, mlp_bias=False,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFHelium(
        HeliumConfig(**{k: v for k, v in cfg.items()
                        if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(15)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def _engine_vs_hf_generate(hf, cfg, prompt, n=6):
    """Greedy engine decode must be token-identical to HF generate."""
    import torch

    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.server_args import ServerArgs

    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(cfg))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": n, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=n, do_sample=False
            )[0, len(prompt):].tolist()
        assert out == ref, (out, ref)
    finally:
        eng.shutdown()


def test_starcoder2_engine_decode():
    """SWA + biases + non-gated MLP through the DECODE path."""
    import torch
    from transformers import Starcoder2Config
    from transformers import Starcoder2ForCausalLM as HFStarcoder2

    cfg = dict(
        architectures=["Starcoder2ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="gelu_pytorch_tanh",
        norm_epsilon=1e-5, rope_theta=10000.0, use_bias=True,
        sliding_window=8, max_position_embeddings=256,
        tie_word_embeddings=True, residual_dropout=0.0,
        embedding_dropout=0.0, attention_dropout=0.0,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFStarcoder2(
        Starcoder2Config(
            **{k: v for k, v in cfg.items() if k != "architectures"}
        )
    ).eval()
    prompt = np.random.default_rng(20).integers(3, 500, 21).tolist()
    _engine_vs_hf_generate(hf, cfg, prompt)


def test_gpt_neox_engine_decode():
    """Dual-norm parallel residual + partial rotary through DECODE."""
    import torch
    from transformers import GPTNeoXConfig
    from transformers import GPTNeoXForCausalLM as HFNeoX

    cfg = dict(
        architectures=["GPTNeoXForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, intermediate_size=448, hidden_act="gelu",
        layer_norm_eps=1e-5, rotary_pct=0.25, rotary_emb_base=10000,
        use_parallel_residual=True, attention_dropout=0.0,
        hidden_dropout=0.0, max_position_embeddings=256,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFNeoX(
        GPTNeoXConfig(**{k: v for k, v in cfg.items()
                         if k != "architectures"})
    ).eval()
    prompt = np.random.default_rng(21).integers(3, 500, 17).tolist()
    _engine_vs_hf_generate(hf, cfg, prompt)


def test_smollm3_matches_hf():
    """SmolLM3: NoPE layers (identity rope table selected per layer)."""
    import torch
    from transformers import SmolLM3Config
    from transformers import SmolLM3ForCausalLM as HFSmolLM3

    cfg = dict(
        architectures=["SmolLM3ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="silu", rms_norm_eps=1e-5,
        rope_theta=10000.0, no_rope_layers=[1, 0, 1, 0],
        use_sliding_window=False, max_position_embeddings=256,
        tie_word_embeddings=True, attention_bias=False, mlp_bias=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFSmolLM3(
        SmolLM3Config(**{k: v for k, v in cfg.items()
                         if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(16)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_arcee_matches_hf():
    """Arcee AFM: non-gated squared-ReLU MLP on the Llama graph."""
    import torch
    from transformers import ArceeConfig
    from transformers import ArceeForCausalLM as HFArcee

    cfg = dict(
        architectures=["ArceeForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, hidden_act="relu2", rms_norm_eps=1e-5,
        rope_theta=10000.0, attention_bias=False, mlp_bias=False,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFArcee(
        ArceeConfig(**{k: v for k, v in cfg.items()
                       if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(17)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_seed_oss_matches_hf():
    """Seed-OSS: qkv biases + o_proj bias on the Llama graph."""
    import torch
    from transformers import SeedOssConfig
    from transformers import SeedOssForCausalLM as HFSeedOss

    cfg = dict(
        architectures=["SeedOssForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_act="silu", rms_norm_eps=1e-5,
        rope_theta=10000.0, attention_bias=True, attention_out_bias=True,
        mlp_bias=False, attention_dropout=0.0, residual_dropout=0.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFSeedOss(
        SeedOssConfig(**{k: v for k, v in cfg.items()
                         if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(18)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_glm_matches_hf():
    """GLM: partial-INTERLEAVED rotary + fused gate_up + qkv biases."""
    import torch
    from transformers import GlmConfig
    from transformers import GlmForCausalLM as HFGlm

    cfg = dict(
        architectures=["GlmForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_act="silu", rms_norm_eps=1e-5,
        rope_theta=10000.0, partial_rotary_factor=0.5,
        attention_bias=True, attention_dropout=0.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFGlm(
        GlmConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(19)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_glm4_matches_hf():
    """GLM-4-0414: GLM plus sandwich output norms."""
    import torch
    from transformers import Glm4Config
    from transformers import Glm4ForCausalLM as HFGlm4

    cfg = dict(
        architectures=["Glm4ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_act="silu", rms_norm_eps=1e-5,
        rope_theta=10000.0, partial_rotary_factor=0.5,
        attention_bias=False, attention_dropout=0.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFGlm4(
        Glm4Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(20)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_ernie45_matches_hf():
    """ERNIE 4.5: interleaved rotary + use_bias on the Llama graph."""
    import torch
    from transformers import Ernie4_5Config
    from transformers import Ernie4_5ForCausalLM as HFErnie

    cfg = dict(
        architectures=["Ernie4_5ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, hidden_act="silu", rms_norm_eps=1e-5,
        rope_theta=10000.0, use_bias=True,
        max_position_embeddings=256, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(0)
    hf = HFErnie(
        Ernie4_5Config(**{k: v for k, v in cfg.items()
                          if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(21)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist(), atol=0.05)


def test_gpt_oss_matches_hf():
    """GPT-OSS: sinks + alternating SWA + clamped-SwiGLU MoE with
    softmax-after-top-k routing (models/gpt_oss.py)."""
    import torch
    from transformers import GptOssConfig, GptOssForCausalLM

    cfg = dict(
        architectures=["GptOssForCausalLM"],
        vocab_size=512, hidden_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=96, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=8,
        layer_types=["sliding_attention", "full_attention"] * 2,
        attention_bias=True, rms_norm_eps=1e-5, rope_theta=10000.0,
        rope_scaling=None,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = GptOssForCausalLM(
        GptOssConfig(**{k: v for k, v in cfg.items()
                        if k != "architectures"})
    ).eval()
    # HF inits sinks/biases as empty -> randomize them deterministically
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for name, p in hf.named_parameters():
            if "sinks" in name or "bias" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.5)
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 21).tolist())


def test_olmoe_matches_hf():
    """OLMoE: full-width q/k RMSNorm + softmax-then-top-k MoE
    (models/olmoe.py)."""
    import torch
    from transformers import OlmoeConfig, OlmoeForCausalLM

    cfg = dict(
        architectures=["OlmoeForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=128, num_experts=4, num_experts_per_tok=2,
        norm_topk_prob=True,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = OlmoeForCausalLM(
        OlmoeConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist())


def test_exaone4_matches_hf():
    """EXAONE 4.0: post-norm residuals + qk-norm + hybrid SWA with global
    NoPE (models/exaone4.py)."""
    import torch
    from transformers import Exaone4Config, Exaone4ForCausalLM

    cfg = dict(
        architectures=["Exaone4ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, sliding_window=8, sliding_window_pattern=4,
        layer_types=["sliding_attention"] * 3 + ["full_attention"],
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Exaone4ForCausalLM(
        Exaone4Config(**{k: v for k, v in cfg.items()
                         if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 19).tolist())


def test_glm4_moe_matches_hf():
    """GLM-4.5/4.6 MoE: GLM attention (interleaved partial rotary) +
    DeepSeek-V3 noaux-tc routing with shared experts and first-k-dense
    (models/glm4_moe.py)."""
    import torch
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    cfg = dict(
        architectures=["Glm4MoeForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=3,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=384, moe_intermediate_size=96,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, n_group=2, topk_group=1,
        norm_topk_prob=True, routed_scaling_factor=1.5,
        partial_rotary_factor=0.5, use_qk_norm=True, attention_bias=True,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Glm4MoeForCausalLM(
        Glm4MoeConfig(**{k: v for k, v in cfg.items()
                         if k != "architectures"})
    ).eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for name, b in hf.named_buffers():
            if "e_score_correction_bias" in name:
                b.copy_(torch.randn(b.shape, generator=g) * 0.5)
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 21).tolist())


def test_ernie45_moe_matches_hf():
    """ERNIE 4.5 MoE: softmax noaux routing with correction bias, shared
    experts, dense layer 0, interleaved rotary (models/ernie45_moe.py)."""
    import torch
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM

    cfg = dict(
        architectures=["Ernie4_5_MoeForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=3,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=384, moe_intermediate_size=96,
        moe_num_experts=4, moe_k=2, moe_num_shared_experts=1,
        moe_layer_start_index=1, moe_layer_end_index=2,
        use_bias=False, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Ernie4_5_MoeForCausalLM(
        Ernie4_5_MoeConfig(**{k: v for k, v in cfg.items()
                              if k != "architectures"})
    ).eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for name, p in hf.named_parameters():
            if "e_score_correction_bias" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.5)
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 21).tolist())


def test_dots1_matches_hf():
    """dots.llm1: Qwen3-style qk-norm attention + DeepSeek-V3 noaux MoE
    (models/glm4_moe.py Dots1ForCausalLM)."""
    import torch
    from transformers import Dots1Config, Dots1ForCausalLM

    cfg = dict(
        architectures=["Dots1ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=3,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=384, moe_intermediate_size=96,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        first_k_dense_replace=1, n_group=2, topk_group=1,
        norm_topk_prob=True, routed_scaling_factor=2.0,
        attention_bias=False, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Dots1ForCausalLM(
        Dots1Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(1)
        for name, b in hf.named_buffers():
            if "e_score_correction_bias" in name:
                b.copy_(torch.randn(b.shape, generator=g) * 0.5)
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 21).tolist())


def test_dbrx_matches_hf():
    """DBRX: weight-only LayerNorm, fused clipped Wqkv, stacked-param
    experts with L1-renormalized top-k (models/dbrx.py)."""
    import torch
    from transformers import DbrxConfig, DbrxForCausalLM

    cfg = dict(
        architectures=["DbrxForCausalLM"],
        vocab_size=512, d_model=256, n_layers=2, n_heads=8,
        max_seq_len=256,
        attn_config={"kv_n_heads": 4, "clip_qkv": 8.0,
                     "rope_theta": 10000.0},
        ffn_config={"ffn_hidden_size": 96, "moe_num_experts": 4,
                    "moe_top_k": 2, "moe_normalize_expert_weights": 1.0,
                    "moe_jitter_eps": None},
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = DbrxForCausalLM(
        DbrxConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 17).tolist())


def test_olmo3_matches_hf():
    """OLMo 3: OLMo-2 post-norm graph + hybrid sliding windows with
    global-layer-only rope scaling (models/olmo2.py Olmo3ForCausalLM)."""
    import torch
    from transformers import Olmo3Config, Olmo3ForCausalLM

    cfg = dict(
        architectures=["Olmo3ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, sliding_window=8,
        layer_types=["sliding_attention"] * 3 + ["full_attention"],
        rope_scaling={"rope_type": "yarn", "factor": 2.0,
                      "original_max_position_embeddings": 128},
        rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = Olmo3ForCausalLM(
        Olmo3Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 19).tolist())


def test_hunyuan_dense_matches_hf():
    """HunYuan v1 dense: per-head q/k RMSNorm AFTER RoPE
    (models/hunyuan.py)."""
    import torch
    from transformers import HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM

    cfg = dict(
        architectures=["HunYuanDenseV1ForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, head_dim=32,
        intermediate_size=448, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = HunYuanDenseV1ForCausalLM(
        HunYuanDenseV1Config(**{k: v for k, v in cfg.items()
                                if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 15).tolist())


def test_apertus_matches_hf():
    """Apertus: non-gated xIELU MLP with learnable per-layer alphas,
    qk-norm, llama3 rope (models/apertus.py)."""
    import torch
    from transformers import ApertusConfig, ApertusForCausalLM

    cfg = dict(
        architectures=["ApertusForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4,
        intermediate_size=448, rms_norm_eps=1e-5, rope_theta=10000.0,
        rope_scaling={"rope_type": "llama3", "factor": 4.0,
                      "original_max_position_embeddings": 64,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0},
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = ApertusForCausalLM(
        ApertusConfig(**{k: v for k, v in cfg.items()
                         if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 15).tolist())


def test_gpt2_matches_hf():
    """GPT-2: learned wpe positions (NoPE rope), Conv1D transposed
    weights, fused biased c_attn, gelu_new MLP (models/gpt2.py)."""
    import torch
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = dict(
        architectures=["GPT2LMHeadModel"],
        vocab_size=512, n_positions=256, n_embd=256, n_layer=2, n_head=8,
        n_inner=448, activation_function="gelu_new",
        layer_norm_epsilon=1e-5, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(
        GPT2Config(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 15).tolist())


def test_gpt_bigcode_matches_hf():
    """GPTBigCode (StarCoder v1): GPT-2 graph, nn.Linear layout, MQA
    single K/V head, gelu_pytorch_tanh (models/gpt2.py)."""
    import torch
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    cfg = dict(
        architectures=["GPTBigCodeForCausalLM"],
        vocab_size=512, n_positions=256, n_embd=256, n_layer=2, n_head=8,
        n_inner=448, activation_function="gelu_pytorch_tanh",
        multi_query=True, layer_norm_epsilon=1e-5,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = GPTBigCodeForCausalLM(
        GPTBigCodeConfig(**{k: v for k, v in cfg.items()
                            if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(1)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 15).tolist())


def test_opt_matches_hf():
    """OPT: decoder.* names, offset-by-2 learned positions, relu MLP,
    per-layer final_layer_norm as the post norm (models/gpt2.py)."""
    import torch
    from transformers import OPTConfig, OPTForCausalLM

    cfg = dict(
        architectures=["OPTForCausalLM"],
        vocab_size=512, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=8, ffn_dim=448, max_position_embeddings=256,
        do_layer_norm_before=True, activation_function="relu",
        word_embed_proj_dim=256, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = OPTForCausalLM(
        OPTConfig(**{k: v for k, v in cfg.items() if k != "architectures"})
    ).eval()
    rng = np.random.default_rng(2)
    _check_vs_hf(hf, cfg, rng.integers(3, 500, 15).tolist())


def test_phimoe_matches_hf():
    """PhiMoE: sparsemixer routing + biased LayerNorms + longrope."""
    import torch
    from transformers import PhimoeConfig, PhimoeForCausalLM as HFPhimoe

    cfg = dict(
        architectures=["PhimoeForCausalLM"],
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=False,
        attention_bias=True, lm_head_bias=True,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = HFPhimoe(PhimoeConfig(
        **{k: v for k, v in cfg.items() if k != "architectures"})).eval()
    rng = np.random.default_rng(0)
    _check_vs_hf(hf, cfg, rng.integers(3, 250, 15).tolist())


def test_llama4_matches_hf():
    """Llama 4: chunked attention, NoPE + temperature tuning, qk l2norm,
    interleaved top-1 input-scaled MoE + shared expert."""
    import torch
    from transformers import Llama4TextConfig
    from transformers import Llama4ForCausalLM as HFL4

    cfg = dict(
        architectures=["Llama4ForCausalLM"],
        vocab_size=256, hidden_size=64, intermediate_size=96,
        intermediate_size_mlp=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=2, max_position_embeddings=128,
        attention_chunk_size=16, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        attn_temperature_tuning=True, floor_scale=16, attn_scale=0.1,
        use_qk_norm=True,
    )
    torch.manual_seed(0)
    hf = HFL4(Llama4TextConfig(
        **{k: v for k, v in cfg.items() if k != "architectures"})).eval()
    rng = np.random.default_rng(0)
    # prompt longer than the 16-token chunk so chunked masking matters
    _check_vs_hf(hf, cfg, rng.integers(3, 250, 45).tolist())


# ---------------------------------------------------------------------------
# round-4 remote-code families (no in-image HF classes): REDUCTION tests —
# construct each family's checkpoint FROM a transformed random llama so the
# forward must equal the llama reference exactly, proving the name mapping,
# packing translation and scaling quirks
# ---------------------------------------------------------------------------

BASE_CFG = dict(
    vocab_size=512, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=128,
    tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
)


def _tiny_llama():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(2)
    hf = LlamaForCausalLM(LlamaConfig(**BASE_CFG)).eval()
    return hf, _torch_state_dict_to_np(hf.state_dict())


def _ref_last_logits(hf, prompt):
    import torch

    with torch.no_grad():
        return hf(torch.tensor([prompt])).logits[0, -1].float().numpy()


def test_baichuan_wpack_and_normhead():
    hf, tensors = _tiny_llama()
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, 11).tolist()
    # build a baichuan-named checkpoint: W_pack = [q; k; v]... but k/v are
    # half-size (GQA) — baichuan is MHA, so use kvh == qh here
    cfg = dict(BASE_CFG, num_key_value_heads=4)
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM as HL

    torch.manual_seed(3)
    hf = HL(LlamaConfig(**cfg)).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    # NormHead: our loader normalizes rows; pre-normalize the llama head so
    # the reference and the normalized head agree
    w = tensors["lm_head.weight"]
    w = w / (np.linalg.norm(w, axis=1, keepdims=True) + 1e-7)
    tensors["lm_head.weight"] = w
    hf.lm_head.weight.data = torch.tensor(w)
    bt = {}
    for name, arr in tensors.items():
        if ".self_attn.q_proj.weight" in name:
            base = name[: -len("q_proj.weight")]
            bt[base + "W_pack.weight"] = np.concatenate([
                arr, tensors[base + "k_proj.weight"],
                tensors[base + "v_proj.weight"]], 0)
        elif ".self_attn.k_proj" in name or ".self_attn.v_proj" in name:
            continue
        else:
            bt[name] = arr
    ref = _ref_last_logits(hf, prompt)
    mc = ModelConfig(model_path="", hf_config=dict(
        cfg, architectures=["BaichuanForCausalLM"]))
    model, params = load_model(mc, tensors=bt)
    ours = _run_extend(model, params, prompt)
    assert np.argmax(ours) == np.argmax(ref)
    assert np.abs(ours - ref).max() < 0.3


def test_internlm2_wqkv_interleave():
    hf, tensors = _tiny_llama()
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 500, 13).tolist()
    c = BASE_CFG
    kvh, qh = c["num_key_value_heads"], c["num_attention_heads"]
    g = qh // kvh
    d = c["hidden_size"] // qh
    it = {}
    for name, arr in tensors.items():
        n = name.replace("model.embed_tokens", "model.tok_embeddings")
        n = n.replace("input_layernorm", "attention_norm")
        n = n.replace("post_attention_layernorm", "ffn_norm")
        n = n.replace(".mlp.gate_proj", ".feed_forward.w1")
        n = n.replace(".mlp.up_proj", ".feed_forward.w3")
        n = n.replace(".mlp.down_proj", ".feed_forward.w2")
        n = n.replace(".self_attn.o_proj", ".attention.wo")
        if n == "lm_head.weight":
            n = "output.weight"
        if ".self_attn.q_proj.weight" in n:
            base = name[: -len("q_proj.weight")]
            q = arr.reshape(kvh, g, d, -1)
            k = tensors[base + "k_proj.weight"].reshape(kvh, 1, d, -1)
            v = tensors[base + "v_proj.weight"].reshape(kvh, 1, d, -1)
            wqkv = np.concatenate([q, k, v], axis=1).reshape(
                kvh * (g + 2) * d, -1)
            it[base.replace(".self_attn.", ".attention.") + "wqkv.weight"] = wqkv
        elif ".self_attn.k_proj" in n or ".self_attn.v_proj" in n:
            continue
        else:
            it[n] = arr
    ref = _ref_last_logits(hf, prompt)
    mc = ModelConfig(model_path="", hf_config=dict(
        BASE_CFG, architectures=["InternLM2ForCausalLM"]))
    model, params = load_model(mc, tensors=it)
    ours = _run_extend(model, params, prompt)
    assert np.argmax(ours) == np.argmax(ref)
    assert np.abs(ours - ref).max() < 0.3


def test_minicpm_mup_scaling():
    hf, tensors = _tiny_llama()
    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 500, 9).tolist()
    L = BASE_CFG["num_hidden_layers"]
    scale_emb, scale_depth, dim_base = 4.0, 1.2, 32
    rm = scale_depth / np.sqrt(2 * L)
    logit_div = BASE_CFG["hidden_size"] / dim_base
    mt = {}
    for name, arr in tensors.items():
        a = np.asarray(arr, np.float32)
        if name == "model.embed_tokens.weight":
            a = a / scale_emb
        elif ".self_attn.o_proj.weight" in name or ".mlp.down_proj.weight" in name:
            a = a / rm
        elif name == "lm_head.weight":
            a = a * logit_div
        mt[name] = a
    ref = _ref_last_logits(hf, prompt)
    mc = ModelConfig(model_path="", hf_config=dict(
        BASE_CFG, architectures=["MiniCPMForCausalLM"],
        scale_emb=scale_emb, scale_depth=scale_depth,
        dim_model_base=dim_base))
    model, params = load_model(mc, tensors=mt)
    ours = _run_extend(model, params, prompt)
    assert np.argmax(ours) == np.argmax(ref)
    assert np.abs(ours - ref).max() < 0.3
