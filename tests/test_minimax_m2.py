"""MiniMax-M2 vs a naive numpy reference.

Reference role: `srt/models/minimax_m2.py` (full-width q/k RMSNormTP
:76, partial rope by absolute rotary_dim :370, sigmoid renormalized
MoE :128 with w1/w2/w3 expert checkpoints).  transformers has no
MiniMaxM2 class, so ground truth is a token-level f32 numpy forward.
"""

import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

V, H, NL, NH, KVH, DH, RD = 256, 64, 3, 4, 2, 16, 8
E, TOPK, MI = 8, 2, 48

CFG = dict(
    architectures=["MiniMaxM2ForCausalLM"],
    vocab_size=V, hidden_size=H, intermediate_size=MI,
    num_hidden_layers=NL, num_attention_heads=NH, num_key_value_heads=KVH,
    head_dim=DH, rotary_dim=RD, use_qk_norm=True, qk_norm_type="per_layer",
    num_local_experts=E, num_experts_per_tok=TOPK,
    scoring_func="sigmoid", use_routing_bias=True,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=128,
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
        t[pre + "self_attn.q_proj.weight"] = w(NH * DH, H)
        t[pre + "self_attn.k_proj.weight"] = w(KVH * DH, H)
        t[pre + "self_attn.v_proj.weight"] = w(KVH * DH, H)
        t[pre + "self_attn.o_proj.weight"] = w(H, NH * DH)
        t[pre + "self_attn.q_norm.weight"] = \
            1.0 + w(NH * DH, s=0.1)
        t[pre + "self_attn.k_norm.weight"] = \
            1.0 + w(KVH * DH, s=0.1)
        t[pre + "mlp.gate.weight"] = w(E, H, s=0.2)
        t[pre + "mlp.gate.e_score_correction_bias"] = w(E, s=0.1)
        for e in range(E):
            t[pre + f"mlp.experts.{e}.w1.weight"] = w(MI, H)
            t[pre + f"mlp.experts.{e}.w2.weight"] = w(H, MI)
            t[pre + f"mlp.experts.{e}.w3.weight"] = w(MI, H)
    return t


def _naive_greedy(t, prompt, n_new):
    def rms(x, wt, eps=1e-6):
        return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * wt

    def silu(x):
        return x / (1.0 + np.exp(-x))

    inv = 1.0 / (10000.0 ** (np.arange(0, RD, 2) / RD))

    def rot(x, pos):
        # half-split partial rotary over the first RD features
        T = x.shape[0]
        ang = pos[:, None] * inv[None, :]
        cos, sin = np.cos(ang), np.sin(ang)
        x1 = x[..., : RD // 2]
        x2 = x[..., RD // 2 : RD]
        out = x.copy()
        out[..., : RD // 2] = x1 * cos[:, None, :] - x2 * sin[:, None, :]
        out[..., RD // 2 : RD] = x2 * cos[:, None, :] + x1 * sin[:, None, :]
        return out

    def logits(ids):
        x = t["model.embed_tokens.weight"][np.asarray(ids)]
        T = len(ids)
        pos = np.arange(T)
        for l in range(NL):
            pre = f"model.layers.{l}."
            h = rms(x, t[pre + "input_layernorm.weight"])
            q = h @ t[pre + "self_attn.q_proj.weight"].T  # [T, NH*DH]
            k = h @ t[pre + "self_attn.k_proj.weight"].T
            v = h @ t[pre + "self_attn.v_proj.weight"].T
            # FULL-width qk RMSNorm (RMSNormTP semantics)
            q = rms(q, t[pre + "self_attn.q_norm.weight"])
            k = rms(k, t[pre + "self_attn.k_norm.weight"])
            q = rot(q.reshape(T, NH, DH), pos)
            k = rot(k.reshape(T, KVH, DH), pos)
            v = v.reshape(T, KVH, DH)
            o = np.zeros_like(q)
            g = NH // KVH
            for hh in range(NH):
                kh = k[:, hh // g]
                sc = (q[:, hh] @ kh.T) * DH ** -0.5
                sc = np.where(pos[None, :] <= pos[:, None], sc, -1e30)
                p = np.exp(sc - sc.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                o[:, hh] = p @ v[:, hh // g]
            x = x + o.reshape(T, NH * DH) \
                @ t[pre + "self_attn.o_proj.weight"].T
            h2 = rms(x, t[pre + "post_attention_layernorm.weight"])
            # sigmoid scoring + correction bias shaping selection only,
            # renormalized original scores
            lg = h2 @ t[pre + "mlp.gate.weight"].T
            scores = 1.0 / (1.0 + np.exp(-lg))
            choice = scores + t[pre + "mlp.gate.e_score_correction_bias"]
            out = np.zeros_like(h2)
            for i in range(T):
                top = np.argsort(-choice[i])[:TOPK]
                ws = scores[i, top]
                ws = ws / ws.sum()
                for e, wgt in zip(top, ws):
                    ep = pre + f"mlp.experts.{e}."
                    act = silu(h2[i] @ t[ep + "w1.weight"].T) \
                        * (h2[i] @ t[ep + "w3.weight"].T)
                    out[i] += wgt * (act @ t[ep + "w2.weight"].T)
            x = x + out
        return rms(x, t["model.norm.weight"]) @ t["lm_head.weight"].T

    ids = list(prompt)
    for _ in range(n_new):
        ids.append(int(np.argmax(logits(ids)[-1])))
    return ids[len(prompt):]


def test_minimax_m2_matches_naive_greedy():
    tensors = _mk_tensors()
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 250, 41).tolist()
    n_new = 6
    ref = _naive_greedy(tensors, prompt, n_new)

    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    sa = ServerArgs(model_path="tiny-m2", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=2)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        m = eng.scheduler.runner.model
        assert m.qk_norm_full and not m.qk_norm
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": n_new, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()
    assert out == ref, (out, ref)


def test_minimax_m2_no_routing_bias_variant():
    """use_routing_bias=False: no e_score_correction_bias tensor in the
    checkpoint; routing selects on raw sigmoid scores."""
    cfg = dict(CFG, use_routing_bias=False)
    tensors = {
        k: v for k, v in _mk_tensors(seed=1).items()
        if "e_score_correction_bias" not in k
    }
    mc = ModelConfig(model_path="", hf_config=cfg)
    sa = ServerArgs(model_path="tiny-m2b", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=2)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        out = eng.generate(
            input_ids=list(range(3, 30)),
            sampling_params={"max_new_tokens": 3, "temperature": 0.0,
                             "ignore_eos": True})["output_ids"]
        assert len(out) == 3
    finally:
        eng.shutdown()
