"""Kimi Linear (KDA hybrid) vs a naive numpy reference.

Reference role: `python/sglang/srt/models/kimi_linear.py` +
`srt/layers/attention/fla/kda.py` (fused_kda_gate :1306, sigmoid-gated
o-norm :399) + `srt/layers/attention/fla/fused_recurrent.py:16` (IS_KDA
per-key-channel decay).  transformers has no KimiLinear (trust_remote_code
model), so ground truth is a token-recurrent f32 numpy implementation of
the exact reference math, driven step-by-step.
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

V, H, L = 256, 64, 6
KDA_1IDX = [1, 2, 4, 5]  # 3:1-style hybrid, MLA at (0-idx) layers 2 and 5
HL, DL, CK = 4, 16, 4  # KDA heads / head_dim / conv kernel
P = HL * DL
NH, RANK, NOPE, ROPE, VD = 4, 32, 16, 8, 16  # MLA geometry
E, TOPK, MI, NSH, FKD = 8, 2, 32, 1, 1  # MoE
I_DENSE = 96
RSCALE = 1.5

CFG = dict(
    architectures=["KimiLinearForCausalLM"],
    vocab_size=V, hidden_size=H, intermediate_size=I_DENSE,
    num_hidden_layers=L, num_attention_heads=NH,
    kv_lora_rank=RANK, qk_nope_head_dim=NOPE, qk_rope_head_dim=ROPE,
    v_head_dim=VD, mla_use_nope=True,
    linear_attn_config=dict(
        kda_layers=KDA_1IDX,
        full_attn_layers=[i for i in range(1, L + 1) if i not in KDA_1IDX],
        num_heads=HL, head_dim=DL, short_conv_kernel_size=CK),
    num_experts=E, num_experts_per_token=TOPK, moe_intermediate_size=MI,
    num_shared_experts=NSH, moe_renormalize=True,
    routed_scaling_factor=RSCALE, first_k_dense_replace=FKD,
    num_expert_group=1, topk_group=1,
    moe_router_activation_func="sigmoid", hidden_act="silu",
    max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
    tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
)


def _mk_tensors(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    t = {
        "model.embed_tokens.weight": w(V, H, s=0.3),
        "model.norm.weight": np.ones(H, np.float32),
        "lm_head.weight": w(V, H, s=0.3),
    }
    is_kda = [(l + 1) in KDA_1IDX for l in range(L)]
    for l in range(L):
        pre = f"model.layers.{l}."
        t[pre + "input_layernorm.weight"] = np.ones(H, np.float32)
        t[pre + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        if is_kda[l]:
            sa = pre + "self_attn."
            for s in ("q", "k", "v"):
                t[sa + f"{s}_proj.weight"] = w(P, H)
                t[sa + f"{s}_conv1d.weight"] = w(P, 1, CK, s=0.4)
            t[sa + "b_proj.weight"] = w(HL, H)
            t[sa + "f_a_proj.weight"] = w(DL, H)
            t[sa + "f_b_proj.weight"] = w(P, DL, s=0.2)
            t[sa + "g_a_proj.weight"] = w(DL, H)
            t[sa + "g_b_proj.weight"] = w(P, DL, s=0.2)
            t[sa + "dt_bias"] = w(P, s=0.5)
            t[sa + "A_log"] = w(1, 1, HL, 1, s=0.5)
            t[sa + "o_norm.weight"] = np.ones(DL, np.float32)
            t[sa + "o_proj.weight"] = w(H, P)
        else:
            sa = pre + "self_attn."
            t[sa + "q_proj.weight"] = w(NH * (NOPE + ROPE), H)
            t[sa + "kv_a_proj_with_mqa.weight"] = w(RANK + ROPE, H)
            t[sa + "kv_a_layernorm.weight"] = np.ones(RANK, np.float32)
            t[sa + "kv_b_proj.weight"] = w(NH * (NOPE + VD), RANK)
            t[sa + "o_proj.weight"] = w(H, NH * VD)
        if l < FKD:
            mp = pre + "mlp."
            t[mp + "gate_proj.weight"] = w(I_DENSE, H)
            t[mp + "up_proj.weight"] = w(I_DENSE, H)
            t[mp + "down_proj.weight"] = w(H, I_DENSE)
        else:
            mp = pre + "block_sparse_moe."
            t[mp + "gate.weight"] = w(E, H, s=0.2)
            t[mp + "gate.e_score_correction_bias"] = w(E, s=0.1)
            for e in range(E):
                t[mp + f"experts.{e}.w1.weight"] = w(MI, H)
                t[mp + f"experts.{e}.w2.weight"] = w(H, MI)
                t[mp + f"experts.{e}.w3.weight"] = w(MI, H)
            sh = mp + "shared_experts."
            t[sh + "gate_proj.weight"] = w(NSH * MI, H)
            t[sh + "up_proj.weight"] = w(NSH * MI, H)
            t[sh + "down_proj.weight"] = w(H, NSH * MI)
    return t


# ----------------------------------------------------------------------
# naive f32 reference
# ----------------------------------------------------------------------

def _rms(x, w, eps=1e-6):
    return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * w


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _softplus(x):
    return np.where(x > 20.0, x, np.log1p(np.exp(np.minimum(x, 20.0))))


def _kda_naive(t, l, h):
    sa = f"model.layers.{l}.self_attn."
    T = h.shape[0]
    streams = []
    for s in ("q", "k", "v"):
        x = h @ t[sa + f"{s}_proj.weight"].T  # [T, P]
        cw = t[sa + f"{s}_conv1d.weight"][:, 0, :]  # [P, CK]
        y = np.zeros_like(x)
        for j in range(CK):
            d = CK - 1 - j
            xs = np.zeros_like(x)
            if d == 0:
                xs = x
            else:
                xs[d:] = x[:-d]
            y += xs * cw[:, j]
        streams.append(_silu(y))
    q, k, v = (s.reshape(T, HL, DL) for s in streams)

    def l2n(x):
        return x / np.sqrt(np.sum(x * x, -1, keepdims=True) + 1e-6)

    q = l2n(q) * DL ** -0.5
    k = l2n(k)
    beta = 1.0 / (1.0 + np.exp(-(h @ t[sa + "b_proj.weight"].T)))  # [T,HL]
    fa = h @ t[sa + "f_a_proj.weight"].T
    graw = (fa @ t[sa + "f_b_proj.weight"].T).reshape(T, HL, DL)
    alog = t[sa + "A_log"].reshape(HL)
    g = -np.exp(alog)[None, :, None] * _softplus(
        graw + t[sa + "dt_bias"].reshape(HL, DL)[None])
    ga = h @ t[sa + "g_a_proj.weight"].T
    z = (ga @ t[sa + "g_b_proj.weight"].T).reshape(T, HL, DL)

    S = np.zeros((HL, DL, DL), np.float32)
    outs = np.zeros((T, HL, DL), np.float32)
    for i in range(T):
        S = S * np.exp(g[i])[:, :, None]
        kv_mem = np.einsum("hk,hkv->hv", k[i], S)
        delta = (v[i] - kv_mem) * beta[i][:, None]
        S = S + k[i][:, :, None] * delta[:, None, :]
        outs[i] = np.einsum("hk,hkv->hv", q[i], S)
    on = outs / np.sqrt(np.mean(outs * outs, -1, keepdims=True) + 1e-5)
    on = on * t[sa + "o_norm.weight"]
    o = on / (1.0 + np.exp(-z))
    return o.reshape(T, P) @ t[sa + "o_proj.weight"].T


def _mla_naive(t, l, h):
    sa = f"model.layers.{l}.self_attn."
    T = h.shape[0]
    q = (h @ t[sa + "q_proj.weight"].T).reshape(T, NH, NOPE + ROPE)
    kva = h @ t[sa + "kv_a_proj_with_mqa.weight"].T
    ckv = _rms(kva[:, :RANK], t[sa + "kv_a_layernorm.weight"])
    kpe = kva[:, RANK:]  # NoPE: raw, no rotation
    kv = (ckv @ t[sa + "kv_b_proj.weight"].T).reshape(T, NH, NOPE + VD)
    k = np.concatenate(
        [kv[..., :NOPE], np.broadcast_to(kpe[:, None], (T, NH, ROPE))], -1)
    v = kv[..., NOPE:]
    scores = np.einsum("thd,shd->hts", q, k) * (NOPE + ROPE) ** -0.5
    mask = np.tril(np.ones((T, T), bool))
    scores = np.where(mask[None], scores, -1e30)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ctx = np.einsum("hts,shd->thd", p, v)
    return ctx.reshape(T, NH * VD) @ t[sa + "o_proj.weight"].T


def _mlp_naive(t, l, h2):
    if l < FKD:
        mp = f"model.layers.{l}.mlp."
        act = _silu(h2 @ t[mp + "gate_proj.weight"].T) \
            * (h2 @ t[mp + "up_proj.weight"].T)
        return act @ t[mp + "down_proj.weight"].T
    mp = f"model.layers.{l}.block_sparse_moe."
    logits = h2 @ t[mp + "gate.weight"].T
    scores = 1.0 / (1.0 + np.exp(-logits))
    choice = scores + t[mp + "gate.e_score_correction_bias"]
    T = h2.shape[0]
    out = np.zeros_like(h2)
    for i in range(T):
        top = np.argsort(-choice[i])[:TOPK]
        ws = scores[i, top]
        ws = ws / ws.sum()
        ws = ws * RSCALE
        for e, wgt in zip(top, ws):
            ep = mp + f"experts.{e}."
            act = _silu(h2[i] @ t[ep + "w1.weight"].T) \
                * (h2[i] @ t[ep + "w3.weight"].T)
            out[i] += wgt * (act @ t[ep + "w2.weight"].T)
    sh = mp + "shared_experts."
    act = _silu(h2 @ t[sh + "gate_proj.weight"].T) \
        * (h2 @ t[sh + "up_proj.weight"].T)
    return out + act @ t[sh + "down_proj.weight"].T


def _naive_logits(t, ids):
    is_kda = [(l + 1) in KDA_1IDX for l in range(L)]
    x = t["model.embed_tokens.weight"][np.asarray(ids)]
    for l in range(L):
        pre = f"model.layers.{l}."
        h = _rms(x, t[pre + "input_layernorm.weight"])
        o = _kda_naive(t, l, h) if is_kda[l] else _mla_naive(t, l, h)
        x = x + o
        h2 = _rms(x, t[pre + "post_attention_layernorm.weight"])
        x = x + _mlp_naive(t, l, h2)
    h = _rms(x, t["model.norm.weight"])
    return h @ t["lm_head.weight"].T


def _naive_greedy(t, prompt, n_new):
    ids = list(prompt)
    for _ in range(n_new):
        ids.append(int(np.argmax(_naive_logits(t, ids)[-1])))
    return ids[len(prompt):]


def _engine(tensors, **kw):
    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    sa = ServerArgs(model_path="tiny-kimi", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=4, **kw)
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


def test_kimi_linear_matches_naive_greedy():
    tensors = _mk_tensors()
    rng = np.random.default_rng(0)
    # > 1 chunk of 32: exercises cross-chunk conv + recurrent state carry
    prompt = rng.integers(3, 250, 41).tolist()
    n_new = 6
    ref = _naive_greedy(tensors, prompt, n_new)

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


def test_kimi_linear_concurrent_state_isolation():
    """Interleaved requests keep independent conv/recurrent rows."""
    import threading

    tensors = _mk_tensors(seed=1)
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
        for th in ts:
            th.start()
        for th in ts:
            th.join(timeout=180)
    finally:
        eng.shutdown()
    assert results[0] == solos[0], (results[0], solos[0])
    assert results[1] == solos[1], (results[1], solos[1])


@pytest.mark.slow
def test_kimi_linear_state_checkpoint_prefix_reuse():
    """mamba-radix role: repeated prefix reuses KV pages AND the KDA
    conv/recurrent checkpoint; outputs identical to the cold run."""
    tensors = _mk_tensors(seed=2)
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 250, 37).tolist()
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}

    eng = _engine(tensors)
    try:
        cold = eng.generate(input_ids=prompt, sampling_params=dict(sp))
        warm = eng.generate(input_ids=prompt, sampling_params=dict(sp))
        longer = prompt + rng.integers(3, 250, 9).tolist()
        ref_eng = _engine(tensors)
        try:
            ext_ref = ref_eng.generate(
                input_ids=longer, sampling_params=dict(sp))
        finally:
            ref_eng.shutdown()
        ext_warm = eng.generate(input_ids=longer, sampling_params=dict(sp))
    finally:
        eng.shutdown()
    assert warm["output_ids"] == cold["output_ids"]
    assert warm["meta_info"]["cached_tokens"] >= 32, warm["meta_info"]
    assert ext_warm["output_ids"] == ext_ref["output_ids"]
    assert ext_warm["meta_info"]["cached_tokens"] >= 32
