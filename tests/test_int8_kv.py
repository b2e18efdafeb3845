"""int8 KV cache with per-layer k/v scales.

Reference role: `layers/quantization/kv_cache.py:18-62` (per-layer
k_scale/v_scale applied around the KV cache) + the checkpoint schema
(`model_loader/weight_utils.py:1217-1270`).  The TPU form keeps the scale
algebra OUTSIDE the kernels: round(k/ks) on write, q*ks before the dots,
out*vs after (llama._kv_scale_io).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np, load_model

from .utils import TINY_LLAMA_CFG


def _mk_with_scales():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    cfg = LlamaConfig(
        **{k: v for k, v in TINY_LLAMA_CFG.items() if k != "architectures"}
    )
    hf = LlamaForCausalLM(cfg).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    # calibrate per-layer scales from the model's OWN post-rope KV ranges
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 500, size=(1, 64)).tolist()
    with torch.no_grad():
        out = hf(torch.tensor(ids), use_cache=True)
    for l, layer_cache in enumerate(out.past_key_values):
        k, v = layer_cache[0], layer_cache[1]
        tensors[f"model.layers.{l}.self_attn.k_scale"] = np.asarray(
            k.abs().max().item() / 127.0, np.float32)
        tensors[f"model.layers.{l}.self_attn.v_scale"] = np.asarray(
            v.abs().max().item() / 127.0, np.float32)
    return hf, tensors


def _extend_logits(model, params, kv, prompt):
    rope = model.rope()
    T = len(prompt)
    pad = -T % 16
    pt = jnp.asarray(np.arange(8, dtype=np.int32)[None, :])
    logits, kv = model.extend_step(
        params, kv, rope,
        jnp.asarray(np.concatenate([prompt, np.zeros(pad)]).astype(np.int32)),
        jnp.asarray(np.concatenate([np.arange(T), np.zeros(pad)]).astype(np.int32)),
        jnp.asarray(np.concatenate([np.arange(T), np.full(pad, -1)]).astype(np.int32)),
        pt,
        jnp.asarray([T], np.int32), jnp.asarray([T], np.int32),
        jnp.asarray([0], np.int32), block_q=16,
    )
    return np.asarray(logits)[0], kv


def test_int8_kv_scales_hold_logits():
    hf, tensors = _mk_with_scales()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 500, 23)

    model, params = load_model(mc, tensors=tensors)
    assert "kv_scales" in params["layers"]

    spec16 = KVPoolSpec(2, model.kvh, num_pages=8, page_size=16,
                        head_dim=model.head_dim)
    # bf16 reference WITHOUT the scale path (pop the scales)
    p16 = dict(params)
    p16["layers"] = {k: v for k, v in params["layers"].items()
                     if k != "kv_scales"}
    ref, _ = _extend_logits(model, p16, spec16.alloc(), prompt)

    spec8 = KVPoolSpec(2, model.kvh, num_pages=8, page_size=16,
                       head_dim=model.head_dim, dtype="int8")
    got, kv8 = _extend_logits(model, params, spec8.alloc(), prompt)

    assert kv8.dtype == jnp.int8
    assert got.argmax() == ref.argmax()
    # int8 KV envelope: small logit drift only
    denom = np.abs(ref).max() + 1e-6
    assert np.abs(got - ref).max() / denom < 0.08, (
        np.abs(got - ref).max(), denom)


def test_int8_kv_without_scales_degrades():
    """Sanity that the scales are load-bearing: an int8 pool with the
    scale path DISABLED truncates K/V magnitudes and corrupts logits."""
    hf, tensors = _mk_with_scales()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    rng = np.random.default_rng(5)
    prompt = rng.integers(3, 500, 23)
    model, params = load_model(mc, tensors=tensors)
    p16 = dict(params)
    p16["layers"] = {k: v for k, v in params["layers"].items()
                     if k != "kv_scales"}
    spec16 = KVPoolSpec(2, model.kvh, num_pages=8, page_size=16,
                        head_dim=model.head_dim)
    ref, _ = _extend_logits(model, p16, spec16.alloc(), prompt)
    spec8 = KVPoolSpec(2, model.kvh, num_pages=8, page_size=16,
                       head_dim=model.head_dim, dtype="int8")
    bad, _ = _extend_logits(model, p16, spec8.alloc(), prompt)
    assert np.abs(bad - ref).max() > np.abs(ref).max() * 0.1
