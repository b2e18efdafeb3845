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


def test_qwen3_next_batched_extend_matches_solo():
    """Round 4: the segment-aware deltanet extend — THREE sequences in one
    token-major dispatch must match three solo dispatches (logits and the
    conv/recurrent state rows)."""
    import jax.numpy as jnp

    from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec
    from sglang_awq_tpu.model_loader.loader import load_model

    hf, tensors = _mk()
    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    model, params = load_model(mc, tensors=tensors)
    rope = model.rope()
    BQ = 16
    ps = 8
    q_lens = [13, 8, 21]
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 250, n).astype(np.int32) for n in q_lens]

    def pool(rows):
        spec = KVPoolSpec(len(model.full_layers), model.kvh, num_pages=16,
                          page_size=ps, head_dim=model.head_dim)
        return model.wrap_kv_state(spec.alloc(), rows)

    # --- solo runs ---
    solo_logits = []
    solo_conv, solo_rec = [], []
    for i, p in enumerate(prompts):
        kv = pool(rows=2)
        T = len(p)
        pad = -T % BQ
        toks = np.concatenate([p, np.zeros(pad, np.int32)])
        pos = np.concatenate([np.arange(T), np.zeros(pad)]).astype(np.int32)
        slots = np.concatenate(
            [np.arange(T), np.full(pad, -1)]).astype(np.int32)
        logits, kv = model.extend_step(
            params, kv, rope, jnp.asarray(toks), jnp.asarray(pos),
            jnp.asarray(slots),
            jnp.asarray(np.arange(16, dtype=np.int32)[None, :]),
            jnp.asarray([T], np.int32), jnp.asarray([T], np.int32),
            jnp.asarray([0], np.int32), block_q=BQ,
            state_rows=jnp.asarray([0], np.int32),
        )
        solo_logits.append(np.asarray(logits)[0])
        solo_conv.append(np.asarray(kv["conv"][:, 0]))
        solo_rec.append(np.asarray(kv["rec"][:, 0]))

    # --- one batched run (3 segments, shared pool, distinct pages/rows) ---
    kv = pool(rows=4)
    qb_base = []
    toks, pos, slots = [], [], []
    blocks = 0
    pages_of = []
    next_page = 0
    for i, p in enumerate(prompts):
        qb_base.append(blocks)
        T = len(p)
        pad = -T % BQ
        blocks += (T + pad) // BQ
        toks.append(np.concatenate([p, np.zeros(pad, np.int32)]))
        pos.append(np.concatenate([np.arange(T), np.zeros(pad)]))
        npg = -(-T // ps)
        pages = list(range(next_page, next_page + npg))
        next_page += npg
        pages_of.append(pages)
        sl = np.asarray(pages)[np.arange(T) // ps] * ps + np.arange(T) % ps
        slots.append(np.concatenate([sl, np.full(pad, -1)]))
    pt = np.zeros((3, 16), np.int32)
    for i, pages in enumerate(pages_of):
        pt[i, : len(pages)] = pages
    logits, kv = model.extend_step(
        params, kv, rope,
        jnp.asarray(np.concatenate(toks).astype(np.int32)),
        jnp.asarray(np.concatenate(pos).astype(np.int32)),
        jnp.asarray(np.concatenate(slots).astype(np.int32)),
        jnp.asarray(pt),
        jnp.asarray(q_lens, np.int32), jnp.asarray(q_lens, np.int32),
        jnp.asarray(qb_base, np.int32), block_q=BQ,
        state_rows=jnp.asarray([0, 1, 2], np.int32),
    )
    logits = np.asarray(logits)
    conv = np.asarray(kv["conv"])
    rec = np.asarray(kv["rec"])
    for i in range(3):
        np.testing.assert_allclose(
            logits[i], solo_logits[i], rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            conv[:, i], solo_conv[i], rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(
            rec[:, i], solo_rec[i], rtol=2e-2, atol=2e-2)


def test_qwen3_next_state_checkpoint_prefix_reuse():
    """Round 4 mamba-radix role: a repeated prompt prefix reuses KV pages
    AND the recurrent-state checkpoint — outputs identical to the cold run,
    cached_tokens > 0 on the warm run."""
    hf, tensors = _mk()
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, 37).tolist()  # 4 full pages at ps=8
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}

    eng = _engine(tensors)
    try:
        cold = eng.generate(input_ids=prompt, sampling_params=dict(sp))
        warm = eng.generate(input_ids=prompt, sampling_params=dict(sp))
        # a longer prompt sharing the prefix also reuses the checkpoint
        longer = prompt + rng.integers(3, 250, 9).tolist()
        ext_cold_eng = _engine(tensors)
        try:
            ext_ref = ext_cold_eng.generate(
                input_ids=longer, sampling_params=dict(sp))
        finally:
            ext_cold_eng.shutdown()
        ext_warm = eng.generate(input_ids=longer, sampling_params=dict(sp))
    finally:
        eng.shutdown()
    assert warm["output_ids"] == cold["output_ids"]
    assert warm["meta_info"]["cached_tokens"] >= 32, warm["meta_info"]
    assert ext_warm["output_ids"] == ext_ref["output_ids"]
    assert ext_warm["meta_info"]["cached_tokens"] >= 32
