"""Grouped (megablocks-style) MoE dispatch vs the dense all-expert path.

Reference role model: fused-MoE alignment tests
(`/root/reference/python/sglang/test/srt/test_fused_moe.py`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_awq_tpu.ops.awq_matmul import convert_awq_tensor
from sglang_awq_tpu.ops.moe_grouped import (
    awq_grouped_matmul,
    choose_block_rows,
    grouped_matmul_bf16,
    moe_grouped_mlp,
    moe_plan,
)
from sglang_awq_tpu.quantization.awq_config import (
    awq_dequantize_ref,
    pack_awq_reference,
)


def _dense_ref(x, Wgu, Wd, topi, topv, I):
    """All-expert dense formulation (numpy, f32) — the semantics oracle."""
    T = x.shape[0]
    E = Wgu.shape[1] // (2 * I)
    w = np.zeros((T, E), np.float32)
    for t in range(T):
        for k in range(topi.shape[1]):
            w[t, topi[t, k]] += topv[t, k]
    gu = x @ Wgu  # [T, E*2I]
    gu = gu.reshape(T, E, 2 * I)
    a = gu[..., :I] / (1 + np.exp(-gu[..., :I])) * gu[..., I:]
    a = a * w[..., None]
    return a.reshape(T, E * I) @ Wd


def test_moe_plan_invariants():
    rng = np.random.default_rng(0)
    T, K, El, BT = 33, 4, 8, 8
    topi = rng.integers(0, El, (T, K)).astype(np.int32)
    topv = rng.random((T, K)).astype(np.float32)
    tok, wts, eids = jax.jit(
        lambda ti, tv: moe_plan(ti, tv, e0=0, n_local=El, block_rows=BT)
    )(jnp.asarray(topi), jnp.asarray(topv))
    tok, wts, eids = np.asarray(tok), np.asarray(wts), np.asarray(eids)
    P = tok.shape[0]
    assert P % BT == 0 and eids.shape[0] == P // BT
    # every (t, e) assignment appears exactly once, in a block of expert e
    seen = {}
    for s in range(P):
        if tok[s] == T:
            assert wts[s] == 0.0
            continue
        e = eids[s // BT]
        seen.setdefault((tok[s], e), []).append(wts[s])
    for t in range(T):
        for k in range(K):
            key = (t, topi[t, k])
            assert key in seen, key
            assert any(abs(w - topv[t, k]) < 1e-6 for w in seen[key])
    n_assign = sum(len(v) for v in seen.values())
    assert n_assign == T * K


def test_moe_plan_ep_offset():
    """Only assignments to [e0, e0+n_local) land in slots; others dropped."""
    rng = np.random.default_rng(1)
    T, K, E, El, e0 = 17, 2, 8, 4, 4
    topi = rng.integers(0, E, (T, K)).astype(np.int32)
    topv = rng.random((T, K)).astype(np.float32)
    tok, wts, eids = moe_plan(
        jnp.asarray(topi), jnp.asarray(topv), e0=e0, n_local=El, block_rows=8
    )
    tok, eids = np.asarray(tok), np.asarray(eids)
    BT = 8
    live = [(int(tok[s]), int(eids[s // BT])) for s in range(tok.shape[0])
            if tok[s] != T]
    expect = [(t, int(topi[t, k]) - e0) for t in range(T) for k in range(K)
              if e0 <= topi[t, k] < e0 + El]
    assert sorted(live) == sorted(expect)


@pytest.mark.parametrize("merge", ["column", "row"])
def test_grouped_matmul_bf16(merge):
    rng = np.random.default_rng(2)
    El, Ne, Kx, BT, NB = 4, 128, 64, 8, 6
    P = NB * BT
    xg = jnp.asarray(rng.standard_normal((P, Kx)) * 0.1, jnp.bfloat16)
    eids = jnp.asarray(rng.integers(0, El, NB).astype(np.int32))
    if merge == "column":
        W = rng.standard_normal((Kx, El * Ne)).astype(np.float32) * 0.1
    else:
        W = rng.standard_normal((El * Kx, Ne)).astype(np.float32) * 0.1
    y = np.asarray(
        grouped_matmul_bf16(
            xg, jnp.asarray(W, jnp.bfloat16), eids, merge=merge, expert_n=Ne
        ),
        np.float32,
    )
    xf = np.asarray(xg, np.float32)
    for b in range(NB):
        e = int(eids[b])
        we = (W[:, e * Ne : (e + 1) * Ne] if merge == "column"
              else W[e * Kx : (e + 1) * Kx])
        ref = xf[b * BT : (b + 1) * BT] @ np.asarray(
            np.asarray(we, np.float16).astype(np.float32))
        got = y[b * BT : (b + 1) * BT]
        assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 0.05


def _mk_awq(rng, K, N, G):
    wq = rng.integers(0, 16, (K, N)).astype(np.int32)
    zq = rng.integers(0, 16, (K // G, N)).astype(np.int32)
    sc = (rng.standard_normal((K // G, N)) * 0.02 + 0.03).astype(np.float16)
    qweight, qzeros = pack_awq_reference(wq), pack_awq_reference(zq)
    W = awq_dequantize_ref(qweight, sc, qzeros, G)
    return qweight, qzeros, sc, W


@pytest.mark.parametrize("merge", ["column", "row"])
def test_awq_grouped_matmul(merge):
    rng = np.random.default_rng(3)
    El, Ne, Kx, G, BT, NB = 4, 256, 256, 128, 8, 6
    P = NB * BT
    if merge == "column":
        qw_, qz_, sc_, W = _mk_awq(rng, Kx, El * Ne, G)
        qw, st, bf, pb = convert_awq_tensor(qw_, qz_, sc_, G, unpack="pair")
    else:
        qw_, qz_, sc_, W = _mk_awq(rng, El * Kx, Ne, G)
        # per-expert alignment: pack block must tile Kx
        from sglang_awq_tpu.ops.awq_matmul import choose_pack_block

        pb = choose_pack_block(Kx, G, min_tiles=2)
        qw, st, bf, pb = convert_awq_tensor(
            qw_, qz_, sc_, G, pack_block=pb, unpack="pair"
        )
    xg = jnp.asarray(rng.standard_normal((P, Kx)) * 0.1, jnp.bfloat16)
    eids = jnp.asarray(rng.integers(0, El, NB).astype(np.int32))
    y = np.asarray(
        awq_grouped_matmul(
            xg, jnp.asarray(qw)[None], jnp.asarray(st)[None],
            jnp.asarray(bf)[None], eids, 0,
            merge=merge, expert_n=Ne, group_size=G, pack_block=pb,
            out_dtype=jnp.float32, interpret=True,
        )
    )
    xf = np.asarray(xg, np.float32)
    for b in range(NB):
        e = int(eids[b])
        we = (W[:, e * Ne : (e + 1) * Ne] if merge == "column"
              else W[e * Kx : (e + 1) * Kx])
        ref = xf[b * BT : (b + 1) * BT] @ we
        got = y[b * BT : (b + 1) * BT]
        assert np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9) < 0.02, (
            merge, b, e)


def test_moe_grouped_mlp_matches_dense_bf16():
    from sglang_awq_tpu.layers.linear import LinearSpec

    rng = np.random.default_rng(4)
    T, H, I, E, K = 21, 64, 32, 8, 2
    Wgu = rng.standard_normal((H, E * 2 * I)).astype(np.float32) * 0.2
    Wd = rng.standard_normal((E * I, H)).astype(np.float32) * 0.2
    topi = rng.integers(0, E, (T, K)).astype(np.int32)
    topv = rng.random((T, K)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.bfloat16)

    spec_gu = LinearSpec.make("gate_up", H, E * 2 * I, None, "column")
    spec_d = LinearSpec.make("down", E * I, H, None, "row")
    p_gu = {"weight": jnp.asarray(Wgu, jnp.bfloat16)[None]}
    p_d = {"weight": jnp.asarray(Wd, jnp.bfloat16)[None]}
    y = np.asarray(
        moe_grouped_mlp(
            spec_gu, p_gu, spec_d, p_d, x, jnp.asarray(topi),
            jnp.asarray(topv), 0, e0=0, n_local=E, inter=I,
        ),
        np.float32,
    )
    Wgu16 = np.asarray(Wgu, np.float16).astype(np.float32)
    Wd16 = np.asarray(Wd, np.float16).astype(np.float32)
    ref = _dense_ref(np.asarray(x, np.float32), Wgu16, Wd16, topi, topv, I)
    assert np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9) < 0.05


def test_moe_grouped_mlp_ep_partials_sum_to_dense():
    """Two EP shards' partial outputs sum to the full dense result —
    the row-parallel psum in the model is the expert combine."""
    from sglang_awq_tpu.layers.linear import LinearSpec

    rng = np.random.default_rng(5)
    T, H, I, E, K = 13, 64, 32, 8, 3
    Wgu = rng.standard_normal((H, E * 2 * I)).astype(np.float32) * 0.2
    Wd = rng.standard_normal((E * I, H)).astype(np.float32) * 0.2
    topi = rng.integers(0, E, (T, K)).astype(np.int32)
    topv = rng.random((T, K)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.bfloat16)
    spec_gu = LinearSpec.make("gate_up", H, E * 2 * I, None, "column")
    spec_d = LinearSpec.make("down", E * I, H, None, "row")

    El = E // 2
    total = np.zeros((T, H), np.float32)
    for shard in range(2):
        p_gu = {"weight": jnp.asarray(
            Wgu.reshape(H, E, 2 * I)[:, shard * El:(shard + 1) * El]
            .reshape(H, El * 2 * I), jnp.bfloat16)[None]}
        p_d = {"weight": jnp.asarray(
            Wd[shard * El * I:(shard + 1) * El * I], jnp.bfloat16)[None]}
        total += np.asarray(
            moe_grouped_mlp(
                spec_gu, p_gu, spec_d, p_d, x, jnp.asarray(topi),
                jnp.asarray(topv), 0, e0=shard * El, n_local=El, inter=I,
            ),
            np.float32,
        )
    Wgu16 = np.asarray(Wgu, np.float16).astype(np.float32)
    Wd16 = np.asarray(Wd, np.float16).astype(np.float32)
    ref = _dense_ref(np.asarray(x, np.float32), Wgu16, Wd16, topi, topv, I)
    assert np.abs(total - ref).max() / (np.abs(ref).max() + 1e-9) < 0.05


def test_choose_block_rows_bounds():
    assert choose_block_rows(2048 * 8, 64) == 128
    assert choose_block_rows(8, 8) == 8
    assert choose_block_rows(100, 4) % 8 == 0


def test_model_level_grouped_matches_dense(monkeypatch):
    """Tiny Mixtral-style forward: grouped vs dense paths, same logits."""
    from sglang_awq_tpu.layers.linear import LinearSpec
    from sglang_awq_tpu.models import mixtral as mx

    rng = np.random.default_rng(6)
    T, H, I, E, K = 40, 64, 32, 16, 4
    Wgu = rng.standard_normal((H, E * 2 * I)).astype(np.float32) * 0.2
    Wd = rng.standard_normal((E * I, H)).astype(np.float32) * 0.2
    topi = rng.integers(0, E, (T, K)).astype(np.int32)
    topv = rng.random((T, K)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.bfloat16)
    spec_gu = LinearSpec.make("gate_up", H, E * 2 * I, None, "column")
    spec_d = LinearSpec.make("down", E * I, H, None, "row")
    p = {"gate_up": {"weight": jnp.asarray(Wgu, jnp.bfloat16)[None]},
         "down": {"weight": jnp.asarray(Wd, jnp.bfloat16)[None]}}

    class Shim:
        num_experts = E
        expert_inter = I
        experts_local = E
        tp_axis = None
        specs = {"gate_up": spec_gu, "down": spec_d}

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("SGLT_MOE_GROUPED", mode)
        outs[mode] = np.asarray(
            mx.MixtralForCausalLM._experts_apply(
                Shim(), p, x, jnp.asarray(topi), jnp.asarray(topv), 0
            ),
            np.float32,
        )
    scale = np.abs(outs["0"]).max() + 1e-9
    assert np.abs(outs["0"] - outs["1"]).max() / scale < 0.03
