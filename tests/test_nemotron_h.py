"""Nemotron-H (per-layer M/*/- components) — no HF class in-image, so:

* the Mamba2 mixer code is SHARED with falcon_h1 (HF-logit-verified in
  test_falcon_h1.py, including the group-wise gated norm);
* the component walk is validated against an independent numpy forward
  for an all-'-' (ReLU^2 MLP) pattern;
* hybrid state handling is validated by chunk-size invariance and
  per-request state isolation of greedy generation.

Reference: `python/sglang/srt/models/nemotron_h.py`,
`srt/configs/nemotron_h.py`.
"""

import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

H, I, V = 48, 96, 256

CFG = dict(
    architectures=["NemotronHForCausalLM"],
    vocab_size=V, hidden_size=H, intermediate_size=I,
    num_hidden_layers=5, hybrid_override_pattern="M*-M-",
    num_attention_heads=4, num_key_value_heads=2, head_dim=16,
    mamba_num_heads=4, mamba_head_dim=16, ssm_state_size=16, n_groups=2,
    conv_kernel=4, use_conv_bias=True,
    max_position_embeddings=128, layer_norm_epsilon=1e-5,
    tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
)


def _ckpt(cfg, seed=0):
    """Synthetic checkpoint with NVIDIA backbone.* names."""
    rng = np.random.default_rng(seed)
    pat = cfg["hybrid_override_pattern"]
    h, inter, vocab = cfg["hidden_size"], cfg["intermediate_size"], cfg["vocab_size"]
    nh, hp = cfg["mamba_num_heads"], cfg["mamba_head_dim"]
    ng, ss, ck = cfg["n_groups"], cfg["ssm_state_size"], cfg["conv_kernel"]
    d_ssm = nh * hp
    conv_dim = d_ssm + 2 * ng * ss
    nq = cfg["num_attention_heads"] * cfg["head_dim"]
    nkv = cfg["num_key_value_heads"] * cfg["head_dim"]

    def w(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    t = {
        "backbone.embeddings.weight": w(vocab, h, s=0.3),
        "backbone.norm_f.weight": np.abs(w(h)) + 0.8,
        "lm_head.weight": w(vocab, h, s=0.2),
    }
    for l, ch in enumerate(pat):
        p = f"backbone.layers.{l}"
        t[f"{p}.norm.weight"] = np.abs(w(h)) + 0.8
        if ch == "M":
            t[f"{p}.mixer.in_proj.weight"] = w(
                d_ssm + conv_dim + nh, h)
            t[f"{p}.mixer.out_proj.weight"] = w(h, d_ssm)
            t[f"{p}.mixer.conv1d.weight"] = w(conv_dim, 1, ck)
            t[f"{p}.mixer.conv1d.bias"] = w(conv_dim)
            t[f"{p}.mixer.dt_bias"] = np.abs(w(nh)) + 0.3
            t[f"{p}.mixer.A"] = np.log(np.abs(w(nh)) + 0.5)
            t[f"{p}.mixer.D"] = np.abs(w(nh)) + 0.5
            t[f"{p}.mixer.norm.weight"] = np.abs(w(d_ssm)) + 0.8
        elif ch == "*":
            t[f"{p}.mixer.q_proj.weight"] = w(nq, h)
            t[f"{p}.mixer.k_proj.weight"] = w(nkv, h)
            t[f"{p}.mixer.v_proj.weight"] = w(nkv, h)
            t[f"{p}.mixer.o_proj.weight"] = w(h, nq)
        else:
            t[f"{p}.mixer.up_proj.weight"] = w(inter, h)
            t[f"{p}.mixer.down_proj.weight"] = w(h, inter)
    return t


def _engine(cfg, tensors, **kw):
    mc = ModelConfig(model_path="", hf_config=dict(cfg))
    sa = ServerArgs(model_path="tiny-nh", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=kw.pop("chunked_prefill_size", 32),
                    max_running_requests=4, **kw)
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


def test_nemotron_mlp_walk_matches_numpy():
    """All-'-' pattern: the whole forward is embed -> [rms -> up -> relu^2
    -> down -> +residual]* -> rms -> lm_head, checkable in numpy."""
    cfg = dict(CFG, num_hidden_layers=3, hybrid_override_pattern="---")
    t = _ckpt(cfg, seed=3)
    prompt = [5, 9, 17, 4]
    eng = _engine(cfg, t)
    try:
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                            "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()

    def rms(x, wt, eps=1e-5):
        return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * wt

    def bf16(x):
        import jax.numpy as jnp
        return np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)

    ids = prompt
    x = bf16(t["backbone.embeddings.weight"])[ids]
    for l in range(3):
        h = rms(x, t[f"backbone.layers.{l}.norm.weight"])
        up = bf16(h) @ bf16(t[f"backbone.layers.{l}.mixer.up_proj.weight"]).T
        act = np.square(np.maximum(up, 0.0))
        d = bf16(act) @ bf16(t[f"backbone.layers.{l}.mixer.down_proj.weight"]).T
        x = x + d
    hl = rms(x[-1], t["backbone.norm_f.weight"])
    logits = bf16(hl) @ bf16(t["lm_head.weight"]).T
    assert out[0] == int(np.argmax(logits)), (out, int(np.argmax(logits)))


def test_nemotron_chunk_invariance():
    """Greedy generation must not depend on the prefill chunking (conv
    tails + SSM state carry across chunk boundaries)."""
    t = _ckpt(CFG, seed=0)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 250, 41).tolist()
    outs = []
    for chunk in (8, 32, 64):
        eng = _engine(CFG, t, chunked_prefill_size=chunk)
        try:
            outs.append(eng.generate(
                input_ids=prompt,
                sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                                 "ignore_eos": True},
            )["output_ids"])
        finally:
            eng.shutdown()
    assert outs[0] == outs[1] == outs[2], outs


def test_nemotron_concurrent_state_isolation():
    """Interleaved requests keep independent SSM state rows."""
    import threading

    t = _ckpt(CFG, seed=1)
    rng = np.random.default_rng(1)
    p1 = rng.integers(3, 250, 19).tolist()
    p2 = rng.integers(3, 250, 23).tolist()
    sp = {"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}

    eng = _engine(CFG, t)
    try:
        solo1 = eng.generate(input_ids=p1, sampling_params=sp)["output_ids"]
        solo2 = eng.generate(input_ids=p2, sampling_params=sp)["output_ids"]
        res = {}

        def run(name, p):
            res[name] = eng.generate(input_ids=p, sampling_params=sp)[
                "output_ids"]

        th = [threading.Thread(target=run, args=("a", p1)),
              threading.Thread(target=run, args=("b", p2))]
        for x in th:
            x.start()
        for x in th:
            x.join()
    finally:
        eng.shutdown()
    assert res["a"] == solo1 and res["b"] == solo2, (res, solo1, solo2)
