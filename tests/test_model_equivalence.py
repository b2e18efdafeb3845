"""Model equivalence vs HuggingFace transformers (torch CPU).

Mirrors the reference's HFRunner-vs-SRTRunner strategy
(`python/sglang/test/runners.py:142,509`, `check_close_model_outputs:881`):
a tiny random Llama runs in HF eager and in our engine's extend/decode step
functions; logits must agree.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np, load_model

TINY_CFG = dict(
    architectures=["LlamaForCausalLM"],
    vocab_size=512,
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    intermediate_size=448,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
)


@pytest.fixture(scope="module")
def hf_and_ours():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    hf_cfg = LlamaConfig(**{k: v for k, v in TINY_CFG.items() if k != "architectures"})
    hf = LlamaForCausalLM(hf_cfg).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(TINY_CFG))
    model, params = load_model(mc, tensors=tensors)
    return hf, model, params


def run_hf(hf, token_ids):
    import torch

    with torch.no_grad():
        out = hf(torch.tensor([token_ids])).logits[0]
    return out.float().numpy()  # [T, V]


def _extend(model, params, kv, rope, tokens, positions, slots, pages,
            prefix_len, q_len, bq=16):
    """Single-sequence extend through the batched ragged API."""
    pt = jnp.asarray(np.asarray(pages, np.int32)[None, :])
    logits, kv = model.extend_step(
        params, kv, rope,
        jnp.asarray(tokens, jnp.int32),
        jnp.asarray(positions, jnp.int32),
        jnp.asarray(slots, jnp.int32),
        pt,
        jnp.asarray([prefix_len + q_len], jnp.int32),
        jnp.asarray([q_len], jnp.int32),
        jnp.asarray([0], jnp.int32),
        block_q=bq,
    )
    return logits, kv


def test_extend_matches_hf(hf_and_ours):
    hf, model, params = hf_and_ours
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, 13).tolist()
    hf_logits = run_hf(hf, prompt)

    ps = 8
    spec = KVPoolSpec(2, model.kvh, num_pages=16, page_size=ps, head_dim=model.head_dim)
    kv = spec.alloc()
    rope = model.rope()

    T_pad, n_pages = 16, 4
    pages = jnp.asarray([3, 5, 7, 2], jnp.int32)
    T = len(prompt)
    tokens = jnp.asarray(prompt + [0] * (T_pad - T), jnp.int32)
    positions = jnp.asarray(list(range(T)) + [0] * (T_pad - T), jnp.int32)
    slots = np.full(T_pad, PAD_SLOT, np.int32)
    for i in range(T):
        slots[i] = int(pages[i // ps]) * ps + i % ps
    logits, kv = _extend(
        model, params, kv, rope, tokens, positions, slots, pages, 0, T
    )
    ours = np.asarray(logits[0])
    ref = hf_logits[T - 1]
    assert np.argmax(ours) == np.argmax(ref)
    assert np.abs(ours - ref).max() < 0.2, np.abs(ours - ref).max()

    # --- continue with decode steps, teacher-forcing HF's greedy tokens ---
    seq = list(prompt)
    page_list = [3, 5, 7, 2]
    pmax = 8
    for step in range(4):
        nxt = int(np.argmax(run_hf(hf, seq)[-1]))
        seq.append(nxt)
        pos = len(seq) - 1
        if pos // ps >= len(page_list):
            page_list.append([9, 10, 11, 12][step])
        slot = page_list[pos // ps] * ps + pos % ps
        pt = np.zeros((1, pmax), np.int32)
        pt[0, : len(page_list)] = page_list
        logits, kv = model.decode_step(
            params, kv, rope,
            jnp.asarray([nxt], jnp.int32),
            jnp.asarray([pos], jnp.int32),
            jnp.asarray([slot], jnp.int32),
            jnp.asarray(pt),
            jnp.asarray([len(seq)], jnp.int32),
        )
        ours = np.asarray(logits[0])
        ref = run_hf(hf, seq)[-1]
        assert np.argmax(ours) == np.argmax(ref), f"step {step}"
        assert np.abs(ours - ref).max() < 0.25, (step, np.abs(ours - ref).max())


def test_chunked_prefill_matches_full(hf_and_ours):
    """Two chunks (prefix reuse) must equal one-shot prefill."""
    hf, model, params = hf_and_ours
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 500, 16).tolist()
    ps = 8
    spec = KVPoolSpec(2, model.kvh, num_pages=16, page_size=ps, head_dim=model.head_dim)
    rope = model.rope()
    pages = jnp.asarray([1, 4], jnp.int32)

    def slots_for(r):
        s = np.full(16, -1, np.int32)
        for idx, i in enumerate(r):
            s[idx] = int(pages[i // ps]) * ps + i % ps
        return jnp.asarray(s[: len(r) if len(r) % 8 == 0 else 16][:8] if False else s[:8])

    # one-shot
    kv = spec.alloc()
    tokens = jnp.asarray(prompt, jnp.int32)
    positions = jnp.arange(16, dtype=jnp.int32)
    slots = jnp.asarray(
        [int(pages[i // ps]) * ps + i % ps for i in range(16)], jnp.int32
    )
    full_logits, _ = _extend(
        model, params, kv, rope, tokens, positions, slots, pages, 0, 16
    )

    # chunked: 8 + 8
    kv = spec.alloc()
    l1, kv = _extend(
        model, params, kv, rope, tokens[:8], positions[:8], slots[:8], pages,
        0, 8, bq=8,
    )
    l2, kv = _extend(
        model, params, kv, rope, tokens[8:], positions[8:], slots[8:], pages,
        8, 8, bq=8,
    )
    np.testing.assert_allclose(
        np.asarray(l2[0]), np.asarray(full_logits[0]), atol=5e-2, rtol=5e-2
    )
