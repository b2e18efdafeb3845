"""Mixtral MoE equivalence vs HuggingFace (torch CPU) + engine e2e + AWQ.

Reference strategy: the AWQ accuracy baseline model in the reference IS a
Mixtral (`test/srt/quant/test_awq.py:15-41`); HF-vs-engine logit equivalence
mirrors `python/sglang/test/runners.py:881`.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np, load_model
from sglang_awq_tpu.server_args import ServerArgs

TINY_MIXTRAL = dict(
    architectures=["MixtralForCausalLM"],
    vocab_size=512,
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    intermediate_size=256,
    num_local_experts=4,
    num_experts_per_tok=2,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
)


def _hf_mixtral(seed=0):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(seed)
    cfg = MixtralConfig(
        **{k: v for k, v in TINY_MIXTRAL.items() if k != "architectures"}
    )
    return MixtralForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def hf_and_ours():
    hf = _hf_mixtral()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(TINY_MIXTRAL))
    model, params = load_model(mc, tensors=tensors)
    return hf, model, params


def run_hf(hf, token_ids):
    import torch

    with torch.no_grad():
        out = hf(torch.tensor([token_ids])).logits[0]
    return out.float().numpy()


@pytest.mark.slow
def test_extend_and_decode_match_hf(hf_and_ours):
    hf, model, params = hf_and_ours
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, 13).tolist()
    hf_logits = run_hf(hf, prompt)

    ps = 8
    spec = KVPoolSpec(2, model.kvh, num_pages=16, page_size=ps,
                      head_dim=model.head_dim)
    kv = spec.alloc()
    rope = model.rope()
    pages = [3, 5, 7, 2]
    T, T_pad = len(prompt), 16
    tokens = jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32)
    positions = jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32)
    slots = np.full(T_pad, PAD_SLOT, np.int32)
    for i in range(T):
        slots[i] = pages[i // ps] * ps + i % ps
    logits, kv = model.extend_step(
        params, kv, rope, tokens, positions, jnp.asarray(slots),
        jnp.asarray(np.asarray(pages, np.int32)[None, :]),
        jnp.asarray([T], jnp.int32), jnp.asarray([T], jnp.int32),
        jnp.asarray([0], jnp.int32), block_q=16,
    )
    ours, ref = np.asarray(logits[0]), hf_logits[T - 1]
    assert np.argmax(ours) == np.argmax(ref)
    assert np.abs(ours - ref).max() < 0.2, np.abs(ours - ref).max()

    # greedy decode continuation, teacher-forcing HF tokens
    seq = list(prompt)
    for step in range(3):
        nxt = int(np.argmax(run_hf(hf, seq)[-1]))
        seq.append(nxt)
        pos = len(seq) - 1
        slot = pages[pos // ps] * ps + pos % ps
        pt = np.zeros((1, 8), np.int32)
        pt[0, : len(pages)] = pages
        logits, kv = model.decode_step(
            params, kv, rope,
            jnp.asarray([nxt], jnp.int32), jnp.asarray([pos], jnp.int32),
            jnp.asarray([slot], jnp.int32), jnp.asarray(pt),
            jnp.asarray([len(seq)], jnp.int32),
        )
        ours = np.asarray(logits[0])
        ref = run_hf(hf, seq)[-1]
        assert np.argmax(ours) == np.argmax(ref), f"step {step}"
        assert np.abs(ours - ref).max() < 0.25, (step, np.abs(ours - ref).max())


@pytest.mark.slow
def test_mixtral_engine_greedy_matches_manual_rollout():
    """Engine (scheduler + runner + batching) vs a manual greedy rollout of
    the SAME model step functions — must agree exactly.  (HF math parity is
    pinned by the logit-level test above; a tiny random MoE's greedy tokens
    vs HF are chance at its ~1e-3 logit margins.)"""
    hf = _hf_mixtral(1)
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(TINY_MIXTRAL))

    rng = np.random.default_rng(2)
    prompt = rng.integers(3, 500, 17).tolist()

    # manual rollout with the raw step functions
    model, params = load_model(mc, tensors=tensors)
    ps = 8
    spec = KVPoolSpec(2, model.kvh, num_pages=32, page_size=ps,
                      head_dim=model.head_dim)
    kv = spec.alloc()
    rope = model.rope()
    pages = list(range(8))
    T, T_pad = len(prompt), 24
    tokens = jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32)
    positions = jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32)
    slots = np.full(T_pad, PAD_SLOT, np.int32)
    for i in range(T):
        slots[i] = pages[i // ps] * ps + i % ps
    logits, kv = model.extend_step(
        params, kv, rope, tokens, positions, jnp.asarray(slots),
        jnp.asarray(np.asarray(pages, np.int32)[None, :]),
        jnp.asarray([T], jnp.int32), jnp.asarray([T], jnp.int32),
        jnp.asarray([0], jnp.int32), block_q=8,
    )
    ref, seq = [], list(prompt)
    nxt = int(np.argmax(np.asarray(logits[0])))
    for _ in range(8):
        ref.append(nxt)
        seq.append(nxt)
        pos = len(seq) - 1
        slot = pages[pos // ps] * ps + pos % ps
        pt = np.asarray(pages, np.int32)[None, :]
        logits, kv = model.decode_step(
            params, kv, rope,
            jnp.asarray([nxt], jnp.int32), jnp.asarray([pos], jnp.int32),
            jnp.asarray([slot], jnp.int32), jnp.asarray(pt),
            jnp.asarray([len(seq)], jnp.int32),
        )
        nxt = int(np.argmax(np.asarray(logits[0])))

    sa = ServerArgs(
        model_path="tiny-mixtral", page_size=8, max_total_tokens=1024,
        max_running_requests=4, watchdog_timeout=60,
    )
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    try:
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()


def test_mixtral_awq_quantized_close_to_dequantized():
    """AWQ-pack the tiny Mixtral's expert + attention weights; the packed
    engine path must match a bf16 engine running the dequantized weights
    (exact-semantics parity of the packed kernels — reference
    `test/srt/quant/test_awq.py` role, without a real checkpoint)."""
    from sglang_awq_tpu.quantization.awq_config import (
        awq_dequantize_ref,
        pack_awq_reference,
    )

    hf = _hf_mixtral(3)
    tensors = _torch_state_dict_to_np(hf.state_dict())
    G = 64
    rng = np.random.default_rng(0)
    quant_targets = [
        n[: -len(".weight")]
        for n in tensors
        if n.endswith(".weight")
        and (".experts." in n or "self_attn" in n)
    ]
    qt = {}
    for n, w in tensors.items():
        base = n[: -len(".weight")] if n.endswith(".weight") else None
        if base in quant_targets:
            W = w.T  # [K, N]
            K, N = W.shape
            wq = rng.integers(0, 16, (K, N)).astype(np.int32)
            zq = rng.integers(4, 12, (K // G, N)).astype(np.int32)
            sc = (np.abs(rng.standard_normal((K // G, N))) * 0.02 + 0.01).astype(
                np.float16
            )
            qt[base + ".qweight"] = pack_awq_reference(wq)
            qt[base + ".qzeros"] = pack_awq_reference(zq)
            qt[base + ".scales"] = sc
            # dequantized equivalent for the bf16 reference engine
            qt[base + ".weight.deq"] = awq_dequantize_ref(
                qt[base + ".qweight"], sc, qt[base + ".qzeros"], G
            )
        else:
            qt[n] = w

    cfg_q = dict(
        TINY_MIXTRAL,
        quantization_config={
            "quant_method": "awq", "bits": 4, "group_size": G, "zero_point": True,
        },
    )
    tensors_q = {k: v for k, v in qt.items() if not k.endswith(".weight.deq")}
    tensors_d = {
        (k[: -len(".deq")] if k.endswith(".weight.deq") else k): (
            v.T if k.endswith(".weight.deq") else v
        )
        for k, v in qt.items()
        if not (k.endswith(".qweight") or k.endswith(".qzeros")
                or k.endswith(".scales"))
    }

    prompt = list(range(7, 26))
    outs = {}
    for name, cfg, tns in (
        ("awq", cfg_q, tensors_q),
        ("deq", dict(TINY_MIXTRAL), tensors_d),
    ):
        mc = ModelConfig(model_path="", hf_config=dict(cfg))
        sa = ServerArgs(
            model_path="tiny-mixtral-" + name, page_size=8,
            max_total_tokens=1024, max_running_requests=4, watchdog_timeout=60,
        )
        eng = Engine(server_args=sa, model_config=mc, tensors=tns, tokenizer=None)
        try:
            outs[name] = eng.generate(
                input_ids=prompt,
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            )["output_ids"]
        finally:
            eng.shutdown()
    assert outs["awq"] == outs["deq"], outs
