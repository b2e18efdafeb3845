"""ALiBi positional bias: kernels + the Baichuan-13B variant.

Reference role: `srt/models/baichuan.py:52` (_get_alibi_slopes;
position_embedding == "ALIBI" at :167).  The kernels apply ALiBi in
per-KEY form: m*(j - i) == m*j + const(i), and the query-side constant
cancels in softmax — so the bias is slope * key_position only.
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.models.baichuan import _alibi_slopes
from sglang_awq_tpu.server_args import ServerArgs


def test_alibi_slopes_reference_values():
    s8 = _alibi_slopes(8)
    np.testing.assert_allclose(s8, [2.0 ** -(i + 1) for i in range(8)])
    s12 = _alibi_slopes(12)
    np.testing.assert_allclose(s12[8:], [2.0 ** -(0.5 + i) for i in range(4)],
                               rtol=1e-6)


def test_alibi_decode_kernel_matches_naive():
    import jax.numpy as jnp

    from sglang_awq_tpu.ops.ragged_attention import (
        ragged_decode, ragged_decode_xla)

    rng = np.random.default_rng(0)
    L, P, ps, KVH, D = 2, 32, 16, 2, 64  # wide pool (KVH*D = 128)
    Xr = KVH * D
    kv = jnp.asarray(rng.normal(size=(L, P, 2, ps, Xr)) * 0.3, jnp.bfloat16)
    B, pmax, QH = 4, 4, 4
    lengths = np.array([33, 7, 0, 50], np.int32)
    pt = rng.integers(0, P, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, QH, D)), jnp.bfloat16)
    slopes = jnp.asarray(_alibi_slopes(QH))

    # naive m*(j - i) oracle
    g = np.asarray(kv, np.float32)[1]
    ref = np.zeros((B, 1, QH, D), np.float32)
    for b in range(B):
        if lengths[b] == 0:
            continue
        S = int(lengths[b])
        K = np.stack([g[pt[b, t // ps], 0, t % ps].reshape(KVH, D)
                      for t in range(S)])
        V = np.stack([g[pt[b, t // ps], 1, t % ps].reshape(KVH, D)
                      for t in range(S)])
        i = S - 1
        for h in range(QH):
            kh = K[:, h // (QH // KVH)]
            sc = (np.asarray(q, np.float32)[b, 0, h] @ kh.T) * 0.125 \
                + float(slopes[h]) * (np.arange(S) - i)
            p = np.exp(sc - sc.max())
            p /= p.sum()
            ref[b, 0, h] = p @ V[:, h // (QH // KVH)]

    live = lengths > 0
    o_xla = np.asarray(ragged_decode_xla(
        q, kv, jnp.asarray(pt), jnp.asarray(lengths), 1,
        sm_scale=0.125, alibi=slopes))
    np.testing.assert_allclose(o_xla[live], ref[live], rtol=2e-2, atol=2e-2)
    o_pal = np.asarray(ragged_decode(
        q, kv, jnp.asarray(pt), jnp.asarray(lengths), 1,
        sm_scale=0.125, alibi=slopes, pages_per_chunk=2, interpret=True))
    np.testing.assert_allclose(o_pal[live], o_xla[live], rtol=2e-2, atol=2e-2)


def test_alibi_extend_kernel_matches_xla():
    import jax.numpy as jnp

    from sglang_awq_tpu.ops.ragged_attention import (
        ragged_extend, ragged_extend_xla)

    rng = np.random.default_rng(1)
    L, P, ps, KVH, D = 2, 32, 16, 2, 64
    Xr = KVH * D
    kv = jnp.asarray(rng.normal(size=(L, P, 2, ps, Xr)) * 0.3, jnp.bfloat16)
    B, pmax, QH, BQ = 4, 4, 4, 16
    q_lens = np.array([5, 16, 0, 3], np.int32)
    kv_lens = q_lens + np.array([8, 0, 0, 16], np.int32)
    qb_base = np.array([0, 1, 2, 3], np.int32)
    pt = rng.integers(0, P, size=(B, pmax)).astype(np.int32)
    TQ = 4 * BQ
    q = jnp.asarray(rng.normal(size=(TQ, QH, D)), jnp.bfloat16)
    slopes = jnp.asarray(_alibi_slopes(QH))
    args = (jnp.asarray(pt), jnp.asarray(kv_lens), jnp.asarray(q_lens),
            jnp.asarray(qb_base), 0)
    o_x = np.asarray(ragged_extend_xla(
        q, kv, *args, sm_scale=0.125, block_q=BQ, alibi=slopes))
    o_p = np.asarray(ragged_extend(
        q, kv, *args, sm_scale=0.125, block_q=BQ, pages_per_chunk=2,
        interpret=True, alibi=slopes))
    live = np.zeros(TQ, bool)
    for i in range(B):
        s = qb_base[i] * BQ
        live[s:s + q_lens[i]] = True
    np.testing.assert_allclose(o_p[live], o_x[live], rtol=2e-2, atol=2e-2)


# ----------------------------------------------------------------------
# Baichuan-13B-style model (tiny geometry, position_embedding=ALIBI)
# ----------------------------------------------------------------------

V, H, NL, NH, DH, I = 256, 64, 3, 4, 16, 128

CFG = dict(
    architectures=["BaichuanForCausalLM"],
    vocab_size=V, hidden_size=H, intermediate_size=I,
    num_hidden_layers=NL, num_attention_heads=NH,
    position_embedding="ALIBI",
    rms_norm_eps=1e-6, max_position_embeddings=128,
    tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
)


def _mk_tensors(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    t = {"model.embed_tokens.weight": w(V, H, s=0.3),
         "model.norm.weight": np.ones(H, np.float32),
         "lm_head.weight": w(V, H, s=0.3)}
    for l in range(NL):
        pre = f"model.layers.{l}."
        t[pre + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[pre + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        t[pre + "self_attn.W_pack.weight"] = w(3 * H, H)
        t[pre + "self_attn.o_proj.weight"] = w(H, H)
        t[pre + "mlp.gate_proj.weight"] = w(I, H)
        t[pre + "mlp.up_proj.weight"] = w(I, H)
        t[pre + "mlp.down_proj.weight"] = w(H, I)
    return t


def _naive_greedy(t, prompt, n_new):
    """Llama graph + ALiBi in the canonical m*(j-i) form, f32 numpy."""
    slopes = _alibi_slopes(NH)

    def rms(x, wt):
        return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + 1e-6) * wt

    def silu(x):
        return x / (1.0 + np.exp(-x))

    # the model class applies Baichuan2's NormHead (L2-normalized rows)
    head = t["lm_head.weight"]
    head = head / (np.linalg.norm(head, axis=1, keepdims=True) + 1e-7)

    def logits(ids):
        x = t["model.embed_tokens.weight"][np.asarray(ids)]
        T = len(ids)
        for l in range(NL):
            pre = f"model.layers.{l}."
            h = rms(x, t[pre + "input_layernorm.weight"])
            qkv = h @ t[pre + "self_attn.W_pack.weight"].T
            q, k, v = np.split(qkv, 3, axis=-1)
            q = q.reshape(T, NH, DH)
            k = k.reshape(T, NH, DH)
            v = v.reshape(T, NH, DH)
            o = np.zeros_like(q)
            pos = np.arange(T)
            for hh in range(NH):
                sc = (q[:, hh] @ k[:, hh].T) * DH ** -0.5 \
                    + slopes[hh] * (pos[None, :] - pos[:, None])
                sc = np.where(pos[None, :] <= pos[:, None], sc, -1e30)
                p = np.exp(sc - sc.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                o[:, hh] = p @ v[:, hh]
            x = x + o.reshape(T, H) @ t[pre + "self_attn.o_proj.weight"].T
            h2 = rms(x, t[pre + "post_attention_layernorm.weight"])
            act = silu(h2 @ t[pre + "mlp.gate_proj.weight"].T) \
                * (h2 @ t[pre + "mlp.up_proj.weight"].T)
            x = x + act @ t[pre + "mlp.down_proj.weight"].T
        return rms(x, t["model.norm.weight"]) @ head.T

    ids = list(prompt)
    for _ in range(n_new):
        ids.append(int(np.argmax(logits(ids)[-1])))
    return ids[len(prompt):]


def test_baichuan_alibi_matches_naive_greedy():
    tensors = _mk_tensors()
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 250, 37).tolist()
    n_new = 6
    ref = _naive_greedy(tensors, prompt, n_new)

    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    sa = ServerArgs(model_path="tiny-bc13", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=2)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        assert eng.scheduler.runner.model.alibi_slopes is not None
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": n_new, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()
    assert out == ref, (out, ref)
