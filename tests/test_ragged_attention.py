"""Parity tests: combined-pool KV writes + ragged attention kernels vs
pure-XLA references (interpret mode on CPU — reference test strategy
SURVEY.md §4 kernel-unit tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT, write_kv
from sglang_awq_tpu.ops.kv_write import kv_write_prefill, kv_write_tokens
from sglang_awq_tpu.ops.ragged_attention import (
    ragged_decode,
    ragged_decode_xla,
    ragged_extend,
    ragged_extend_xla,
)

L, PAGES, PS, KVH, D = 2, 16, 8, 2, 64
QH = 4  # G = 2


def _pool(seed=0):
    k = jax.random.PRNGKey(seed)
    return jax.random.normal(k, (L, PAGES, PS, 2, KVH * D), jnp.float32).astype(
        jnp.bfloat16
    )


def test_kv_write_tokens_matches_scatter():
    kv = _pool()
    rng = np.random.default_rng(0)
    T = 5
    slots = np.array([3, 17, 42, PAD_SLOT, 99], np.int32)
    kv_new = rng.normal(size=(T, 2, KVH * D)).astype(np.float32)
    layer = 1

    got = kv_write_tokens(kv, jnp.asarray(kv_new), jnp.asarray(slots), layer,
                          interpret=True)
    want = kv.at[layer, slots // PS, slots % PS].set(
        jnp.asarray(kv_new, jnp.bfloat16), mode="drop"
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kv_write_prefill_matches_scatter_with_dead_groups():
    kv = _pool(1)
    rng = np.random.default_rng(1)
    n_groups = 6
    T = n_groups * PS
    # groups 0,1 live (seq A), group 2 dead padding, groups 3,4 live (seq B),
    # group 5 dead
    pages = np.array([4, 9, -1, 2, 7, -1], np.int32)
    kv_new = rng.normal(size=(T, 2, KVH * D)).astype(np.float32)
    layer = 0

    got = kv_write_prefill(kv, jnp.asarray(kv_new), jnp.asarray(pages), layer,
                           interpret=True)
    want = np.array(kv)
    for j, p in enumerate(pages):
        if p >= 0:
            want[layer, p] = np.asarray(
                jnp.asarray(kv_new[j * PS : (j + 1) * PS], jnp.bfloat16)
            )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_write_kv_prefill_mode_routes_dead_groups():
    """write_kv CPU path vs kernel path agree on a multi-seq layout."""
    kv = _pool(2)
    rng = np.random.default_rng(2)
    T = 4 * PS
    slots = np.full(T, PAD_SLOT, np.int32)
    slots[:PS] = np.arange(PS) + 5 * PS  # seq A -> page 5
    slots[2 * PS : 3 * PS] = np.arange(PS) + 11 * PS  # seq B -> page 11
    k_new = rng.normal(size=(T, KVH, D)).astype(np.float32)
    v_new = rng.normal(size=(T, KVH, D)).astype(np.float32)
    got = write_kv(kv, jnp.asarray(k_new), jnp.asarray(v_new),
                   jnp.asarray(slots), 1, mode="prefill")
    kv_new = jnp.stack(
        [jnp.asarray(k_new, jnp.bfloat16).reshape(T, -1),
         jnp.asarray(v_new, jnp.bfloat16).reshape(T, -1)], axis=1
    )
    want = kv.at[1, slots // PS, slots % PS].set(kv_new, mode="drop")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("qs", [1, 3])
def test_ragged_decode_matches_xla(qs):
    kv = _pool(3)
    rng = np.random.default_rng(3)
    B = 4
    pmax = 4
    lengths = np.array([11, 1, 0, 32], np.int32)  # includes padded row
    if qs > 1:
        lengths = np.maximum(lengths, np.where(lengths > 0, qs, 0))
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    q = rng.normal(size=(B, qs, QH, D)).astype(np.float32)
    q = jnp.asarray(q, jnp.bfloat16)

    out = ragged_decode(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, pages_per_chunk=2, interpret=True,
    )
    ref = ragged_decode_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1, sm_scale=0.125
    )
    live = lengths > 0
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )


def test_ragged_extend_matches_xla():
    kv = _pool(4)
    rng = np.random.default_rng(4)
    BQ = 16
    # three seqs: (prefix 8, new 5), (prefix 0, new 16), (prefix 16, new 3);
    # one padded row
    q_lens = np.array([5, 16, 3, 0], np.int32)
    prefixes = np.array([8, 0, 16, 0], np.int32)
    kv_lens = q_lens + prefixes
    B = 4
    pmax = 8
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    qb_base = np.zeros(B, np.int32)
    off = 0
    for i in range(B):
        qb_base[i] = off // BQ
        off += (int(q_lens[i]) + BQ - 1) // BQ * BQ
    TQ = max(off, BQ)
    q = jnp.asarray(rng.normal(size=(TQ, QH, D)), jnp.bfloat16)

    out = ragged_extend(
        q, kv, jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 0,
        sm_scale=0.125, block_q=BQ, pages_per_chunk=2, interpret=True,
    )
    ref = ragged_extend_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 0,
        sm_scale=0.125, block_q=BQ,
    )
    # compare only live rows
    live = np.zeros(TQ, bool)
    for i in range(B):
        s = int(qb_base[i]) * BQ
        live[s : s + int(q_lens[i])] = True
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )


def test_ragged_extend_multi_qblock_and_long_kv():
    """A sequence spanning multiple q blocks AND multiple kv chunks, plus
    trailing padded rows (regression: on hardware, dead grid steps used to
    flush stale output VMEM over block 0 — the trash-block mapping fix)."""
    kv = _pool(6)
    rng = np.random.default_rng(6)
    BQ = 16
    # seq0: 35 new tokens -> 3 q blocks; kv 43 -> 6 pages (3 chunks at ppc=2)
    q_lens = np.array([35, 7, 0, 0], np.int32)
    prefixes = np.array([8, 24, 0, 0], np.int32)
    kv_lens = q_lens + prefixes
    B = 4
    pmax = 8
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    qb_base = np.zeros(B, np.int32)
    off = 0
    for i in range(B):
        qb_base[i] = off // BQ
        off += (int(q_lens[i]) + BQ - 1) // BQ * BQ
    TQ = max(off, BQ)
    q = jnp.asarray(rng.normal(size=(TQ, QH, D)), jnp.bfloat16)

    args = (
        jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 1,
    )
    out = ragged_extend(q, kv, *args, sm_scale=0.125, block_q=BQ,
                        pages_per_chunk=2, interpret=True)
    ref = ragged_extend_xla(q, kv, *args, sm_scale=0.125, block_q=BQ)
    live = np.zeros(TQ, bool)
    for i in range(B):
        s = int(qb_base[i]) * BQ
        live[s : s + int(q_lens[i])] = True
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )


@pytest.mark.slow
def test_ragged_extend_then_decode_consistency():
    """Extend writes + reads the pool; a following decode step must see the
    same context (end-to-end pool round trip through write_kv)."""
    spec = KVPoolSpec(L, KVH, PAGES, PS, D)
    kv = spec.alloc()
    rng = np.random.default_rng(5)
    T = 12
    pages = np.array([3, 7], np.int32)
    pos = np.arange(T)
    slots = pages[pos // PS] * PS + pos % PS
    k_new = jnp.asarray(rng.normal(size=(16, KVH, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(16, KVH, D)), jnp.bfloat16)
    sl = np.full(16, PAD_SLOT, np.int32)
    sl[:T] = slots
    kv = write_kv(kv, k_new, v_new, jnp.asarray(sl), 0, mode="prefill")

    # decode one more token at position T
    slot_T = pages[T // PS] * PS + T % PS
    kd = jnp.asarray(rng.normal(size=(1, KVH, D)), jnp.bfloat16)
    vd = jnp.asarray(rng.normal(size=(1, KVH, D)), jnp.bfloat16)
    kv = write_kv(kv, kd, vd, jnp.asarray([slot_T], np.int32), 0, mode="decode")

    q = jnp.asarray(rng.normal(size=(1, 1, QH, D)), jnp.bfloat16)
    pt = jnp.asarray(pages[None, :], jnp.int32)
    lengths = jnp.asarray([T + 1], jnp.int32)
    out = ragged_decode(q, kv, pt, lengths, 0, sm_scale=0.125,
                        pages_per_chunk=2, interpret=True)
    ref = ragged_decode_xla(q, kv, pt, lengths, 0, sm_scale=0.125)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def _pool_fp8(seed=0):
    """4-row token faces: (K_lo, K_hi, V_lo, V_hi), Xr = KVH*D/2 lanes."""
    k = jax.random.PRNGKey(seed)
    return (
        jax.random.normal(k, (L, PAGES, PS, 2 * KVH * D), jnp.float32) * 0.3
    ).reshape(L, PAGES, PS, 4, KVH * D // 2).astype(jnp.float8_e4m3fn)


def test_ragged_decode_fp8_pool_matches_xla():
    """fp8_e4m3 KV pool: kernel upcasts in VMEM; oracle reads the same
    quantized pool, so tolerance only covers bf16-vs-f32 compute."""
    kv = _pool_fp8(4)
    rng = np.random.default_rng(4)
    B, pmax = 4, 4
    lengths = np.array([11, 1, 0, 32], np.int32)
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, QH, D)), jnp.bfloat16)

    out = ragged_decode(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, pages_per_chunk=2, interpret=True,
    )
    ref = ragged_decode_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1, sm_scale=0.125
    )
    live = lengths > 0
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=3e-2, atol=3e-2
    )


def test_ragged_extend_fp8_pool_matches_xla():
    """fp8 4-row faces through the extend kernel (class-row masks)."""
    kv = _pool_fp8(6)
    rng = np.random.default_rng(6)
    BQ = 16
    q_lens = np.array([5, 16, 3, 0], np.int32)
    prefixes = np.array([8, 0, 16, 0], np.int32)
    kv_lens = q_lens + prefixes
    B, pmax = 4, 8
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    qb_base = np.zeros(B, np.int32)
    off = 0
    for i in range(B):
        qb_base[i] = off // BQ
        off += (int(q_lens[i]) + BQ - 1) // BQ * BQ
    TQ = max(off, BQ)
    q = jnp.asarray(rng.normal(size=(TQ, QH, D)), jnp.bfloat16)

    args = (
        jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 1,
    )
    out = ragged_extend(q, kv, *args, sm_scale=0.125, block_q=BQ,
                        pages_per_chunk=2, interpret=True)
    ref = ragged_extend_xla(q, kv, *args, sm_scale=0.125, block_q=BQ)
    live = np.zeros(TQ, bool)
    for i in range(B):
        s = int(qb_base[i]) * BQ
        live[s : s + int(q_lens[i])] = True
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=3e-2, atol=3e-2
    )


def test_write_kv_fp8_roundtrip():
    kv = _pool_fp8(5)
    rng = np.random.default_rng(5)
    T = 4
    slots = np.array([3, 17, PAD_SLOT, 42], np.int32)
    k_new = rng.normal(size=(T, KVH, D)).astype(np.float32) * 0.3
    v_new = rng.normal(size=(T, KVH, D)).astype(np.float32) * 0.3
    got = write_kv(kv, jnp.asarray(k_new), jnp.asarray(v_new),
                   jnp.asarray(slots), 0, mode="decode")
    assert got.dtype == jnp.float8_e4m3fn
    face = np.asarray(got[0, 3 // PS, 3 % PS].astype(jnp.float32))  # [4, Xr]
    kq = np.asarray(jnp.asarray(k_new[0].reshape(-1), jnp.float8_e4m3fn)
                    .astype(jnp.float32))
    vq = np.asarray(jnp.asarray(v_new[0].reshape(-1), jnp.float8_e4m3fn)
                    .astype(jnp.float32))
    half = KVH * D // 2
    np.testing.assert_array_equal(face[0], kq[:half])
    np.testing.assert_array_equal(face[1], kq[half:])
    np.testing.assert_array_equal(face[2], vq[:half])
    np.testing.assert_array_equal(face[3], vq[half:])


def test_ragged_decode_sliding_window():
    """SWA: only the last `window` positions attend; chunks wholly below
    the window are skipped (schedule changes), so parity vs the oracle
    covers both the mask and the skip arithmetic."""
    kv = _pool(7)
    rng = np.random.default_rng(7)
    B, pmax = 4, 8
    lengths = np.array([40, 7, 0, 61], np.int32)
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, QH, D)), jnp.bfloat16)
    # W > 0: sliding window; W < 0: CHUNKED attention of size |W| (llama4)
    for W in (8, 17, 100, -8, -16):
        out = ragged_decode(
            q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
            sm_scale=0.125, pages_per_chunk=2, interpret=True, window=W,
        )
        ref = ragged_decode_xla(
            q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
            sm_scale=0.125, window=W,
        )
        live = lengths > 0
        np.testing.assert_allclose(
            np.asarray(out)[live], np.asarray(ref)[live],
            rtol=2e-2, atol=2e-2, err_msg=f"W={W}",
        )
    # chunked brute force: row 3 (len 61, chunk 16) sees keys [48, 61)
    kg3, vg3 = _gather_oracle(kv, page_table, 1)
    qrow3 = np.asarray(q, np.float32)[3, 0].reshape(KVH, QH // KVH, D)
    out_c = np.asarray(ragged_decode(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, pages_per_chunk=2, interpret=True, window=-16,
    ))[3, 0].reshape(KVH, QH // KVH, D)
    lo, hi = (61 - 1) // 16 * 16, 61
    for h in range(KVH):
        ks = kg3[3][lo:hi, h].astype(np.float32)
        vs = vg3[3][lo:hi, h].astype(np.float32)
        for g in range(QH // KVH):
            sc = (qrow3[h, g] @ ks.T) * 0.125
            p = np.exp(sc - sc.max()); p /= p.sum()
            np.testing.assert_allclose(
                out_c[h, g], p @ vs, rtol=3e-2, atol=3e-2)
    # brute-force spot check at W=8, row 3 (len 61): softmax over last 8
    kg, vg = _gather_oracle(kv, page_table, 1)
    qrow = np.asarray(q, np.float32)[3, 0]  # [QH, D]
    ks, vs = kg[3], vg[3]  # [S, KVH, D]
    G = QH // KVH
    h = 2  # query head
    kh = ks[61 - 8 : 61, h // G]
    vh = vs[61 - 8 : 61, h // G]
    sc = (qrow[h] @ kh.T) * 0.125
    pr = np.exp(sc - sc.max()); pr /= pr.sum()
    want = pr @ vh
    out8 = ragged_decode(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, pages_per_chunk=2, interpret=True, window=8,
    )
    np.testing.assert_allclose(
        np.asarray(out8)[3, 0, h], want, rtol=3e-2, atol=3e-2
    )


def _gather_oracle(kv, page_table, layer):
    from sglang_awq_tpu.ops.ragged_attention import _gather_seq

    kg, vg = _gather_seq(jnp.asarray(kv), jnp.asarray(page_table), layer, D)
    return np.asarray(kg, np.float32), np.asarray(vg, np.float32)


def test_ragged_extend_sliding_window():
    kv = _pool(8)
    rng = np.random.default_rng(8)
    BQ = 16
    q_lens = np.array([5, 16, 3, 0], np.int32)
    prefixes = np.array([24, 0, 16, 0], np.int32)
    kv_lens = q_lens + prefixes
    B, pmax = 4, 8
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    qb_base = np.zeros(B, np.int32)
    off = 0
    for i in range(B):
        qb_base[i] = off // BQ
        off += (int(q_lens[i]) + BQ - 1) // BQ * BQ
    TQ = max(off, BQ)
    q = jnp.asarray(rng.normal(size=(TQ, QH, D)), jnp.bfloat16)
    args = (
        jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 0,
    )
    for W in (4, 12):
        out = ragged_extend(q, kv, *args, sm_scale=0.125, block_q=BQ,
                            pages_per_chunk=2, interpret=True, window=W)
        ref = ragged_extend_xla(q, kv, *args, sm_scale=0.125, block_q=BQ,
                                window=W)
        live = np.zeros(TQ, bool)
        for i in range(B):
            s = int(qb_base[i]) * BQ
            live[s : s + int(q_lens[i])] = True
        np.testing.assert_allclose(
            np.asarray(out)[live], np.asarray(ref)[live],
            rtol=2e-2, atol=2e-2, err_msg=f"W={W}",
        )


@pytest.mark.parametrize("qs", [1, 3])
def test_ragged_decode_attention_sinks(qs):
    """GPT-OSS learned sinks: a per-q-head logit joins the softmax
    denominator only (reference gpt_oss sink support in sgl-kernel)."""
    kv = _pool(9)
    rng = np.random.default_rng(9)
    B, pmax = 4, 4
    lengths = np.array([11, qs, 0, 29], np.int32)
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, qs, QH, D)), jnp.bfloat16)
    sinks = jnp.asarray(rng.normal(size=(QH,)) * 2.0, jnp.float32)
    out = ragged_decode(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, pages_per_chunk=2, interpret=True, sinks=sinks,
    )
    ref = ragged_decode_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, sinks=sinks,
    )
    live = lengths > 0
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )
    # sinks shrink every output vs the sink-free run (denominator grows)
    base = ragged_decode_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125,
    )
    n_with = np.linalg.norm(np.asarray(ref)[live])
    n_base = np.linalg.norm(np.asarray(base)[live])
    assert n_with < n_base


def test_ragged_extend_attention_sinks():
    kv = _pool(10)
    rng = np.random.default_rng(10)
    BQ = 16
    q_lens = np.array([5, 16, 3, 0], np.int32)
    prefixes = np.array([8, 0, 16, 0], np.int32)
    kv_lens = q_lens + prefixes
    B, pmax = 4, 8
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    qb_base = np.zeros(B, np.int32)
    off = 0
    for i in range(B):
        qb_base[i] = off // BQ
        off += (int(q_lens[i]) + BQ - 1) // BQ * BQ
    TQ = max(off, BQ)
    q = jnp.asarray(rng.normal(size=(TQ, QH, D)), jnp.bfloat16)
    sinks = jnp.asarray(rng.normal(size=(QH,)) * 2.0, jnp.float32)
    args = (
        jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 0,
    )
    out = ragged_extend(q, kv, *args, sm_scale=0.125, block_q=BQ,
                        pages_per_chunk=2, interpret=True, sinks=sinks)
    ref = ragged_extend_xla(q, kv, *args, sm_scale=0.125, block_q=BQ,
                            sinks=sinks)
    live = np.zeros(TQ, bool)
    for i in range(B):
        s = int(qb_base[i]) * BQ
        live[s : s + int(q_lens[i])] = True
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )


# ---------------------------------------------------------------------------
# split K/V pool layout (round-2 v5): [L, P, 2, ps, fcK, XrK]
# ---------------------------------------------------------------------------


def _split_pool(seed=0):
    k = jax.random.PRNGKey(seed)
    return jax.random.normal(
        k, (L, PAGES, 2, PS, 2, KVH * D // 2), jnp.float32
    ).astype(jnp.bfloat16)


def test_split_pool_spec_shape():
    # round 5: bf16 pools take the WIDE layout (one flat row per token,
    # fcK == 1 — no class columns in the decode walk)
    spec = KVPoolSpec(L, KVH, PAGES, PS, D)
    assert spec.layout == "wide"
    assert spec.shape == (L, PAGES, 2, PS, KVH * D)
    # 1-byte dtypes keep the classed split (writes need 4-row faces)
    i8 = KVPoolSpec(L, 4, PAGES, PS, D, dtype="int8")
    assert i8.layout == "split"
    assert i8.shape == (L, PAGES, 2, PS, 4, D)
    mla = KVPoolSpec(L, 1, PAGES, PS, 8 * D)
    assert mla.layout == "wide"


def test_split_write_kv_roundtrip():
    spec = KVPoolSpec(L, KVH, PAGES, PS, D)
    kv = spec.alloc()
    rng = np.random.default_rng(11)
    T = 6
    k_new = jnp.asarray(rng.normal(size=(T, KVH, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(T, KVH, D)), jnp.bfloat16)
    slots = np.array([3, 9, 17, PAD_SLOT, 40, 70], np.int32)
    kv = write_kv(kv, k_new, v_new, jnp.asarray(slots), 1, mode="decode")
    got_k, got_v = np.asarray(kv[1, :, 0]), np.asarray(kv[1, :, 1])
    for i, s in enumerate(slots):
        if s == PAD_SLOT:
            continue
        page, off = s // PS, s % PS
        np.testing.assert_array_equal(
            got_k[page, off].reshape(KVH, D),
            np.asarray(k_new[i], np.float32).astype(np.float32).astype(
                got_k.dtype
            ),
        )
        np.testing.assert_array_equal(
            got_v[page, off].reshape(KVH, D), np.asarray(v_new[i])
        )
    assert not np.any(np.asarray(kv[0]))  # other layer untouched


@pytest.mark.parametrize("qs", [1, 3])
def test_split_ragged_decode_matches_xla(qs):
    kv = _split_pool(12)
    rng = np.random.default_rng(12)
    B, pmax = 4, 4
    lengths = np.array([11, qs, 0, 32], np.int32)
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, qs, QH, D)), jnp.bfloat16)
    for W, sinks in ((0, None), (9, None),
                     (0, jnp.asarray(rng.normal(size=(QH,)), jnp.float32))):
        out = ragged_decode(
            q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
            sm_scale=0.125, pages_per_chunk=2, interpret=True, window=W,
            sinks=sinks,
        )
        ref = ragged_decode_xla(
            q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
            sm_scale=0.125, window=W, sinks=sinks,
        )
        live = lengths > 0
        np.testing.assert_allclose(
            np.asarray(out)[live], np.asarray(ref)[live],
            rtol=2e-2, atol=2e-2, err_msg=f"W={W}",
        )


def test_split_ragged_extend_matches_xla():
    kv = _split_pool(13)
    rng = np.random.default_rng(13)
    BQ = 16
    q_lens = np.array([5, 16, 3, 0], np.int32)
    prefixes = np.array([8, 0, 16, 0], np.int32)
    kv_lens = q_lens + prefixes
    B, pmax = 4, 8
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    qb_base = np.zeros(B, np.int32)
    off = 0
    for i in range(B):
        qb_base[i] = off // BQ
        off += (int(q_lens[i]) + BQ - 1) // BQ * BQ
    TQ = max(off, BQ)
    q = jnp.asarray(rng.normal(size=(TQ, QH, D)), jnp.bfloat16)
    args = (
        jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 0,
    )
    for W, sinks in ((0, None), (7, None),
                     (0, jnp.asarray(rng.normal(size=(QH,)), jnp.float32))):
        out = ragged_extend(q, kv, *args, sm_scale=0.125, block_q=BQ,
                            pages_per_chunk=2, interpret=True, window=W,
                            sinks=sinks)
        ref = ragged_extend_xla(q, kv, *args, sm_scale=0.125, block_q=BQ,
                                window=W, sinks=sinks)
        live = np.zeros(TQ, bool)
        for i in range(B):
            s = int(qb_base[i]) * BQ
            live[s : s + int(q_lens[i])] = True
        np.testing.assert_allclose(
            np.asarray(out)[live], np.asarray(ref)[live],
            rtol=2e-2, atol=2e-2, err_msg=f"W={W}",
        )


def test_split_extend_then_decode_consistency():
    """Write a prefix through write_kv(prefill), extend over it, then a
    decode step — all on the split pool."""
    spec = KVPoolSpec(L, KVH, PAGES, PS, D)
    kv = spec.alloc()
    rng = np.random.default_rng(14)
    S0 = PS * 2  # two full pages of prefix
    k0 = jnp.asarray(rng.normal(size=(S0, KVH, D)), jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(size=(S0, KVH, D)), jnp.bfloat16)
    pages = [2, 5]
    slots = np.concatenate(
        [np.arange(PS) + p * PS for p in pages]
    ).astype(np.int32)
    kv = write_kv(kv, k0, v0, jnp.asarray(slots), 0, mode="prefill")
    # decode one more token at page 7 slot 0
    k1 = jnp.asarray(rng.normal(size=(1, KVH, D)), jnp.bfloat16)
    v1 = jnp.asarray(rng.normal(size=(1, KVH, D)), jnp.bfloat16)
    kv = write_kv(kv, k1, v1, jnp.asarray([7 * PS], np.int32), 0,
                  mode="decode")
    pt = jnp.asarray(np.array([[2, 5, 7]], np.int32))
    lengths = jnp.asarray([S0 + 1], jnp.int32)
    q = jnp.asarray(rng.normal(size=(1, 1, QH, D)), jnp.bfloat16)
    out = ragged_decode(q, kv, pt, lengths, 0, sm_scale=0.125,
                        pages_per_chunk=2, interpret=True)
    ref = ragged_decode_xla(q, kv, pt, lengths, 0, sm_scale=0.125)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


def test_ragged_decode_stats():
    """want_stats returns per-(seq, span, head) softmax (m, l) matching the
    oracle — the two-piece merge input for tree-speculative verify."""
    k9 = jax.random.PRNGKey(9)
    kv = jax.random.normal(
        k9, (L, PAGES, 2, PS, 2, KVH * D // 2), jnp.float32
    ).astype(jnp.bfloat16)  # split layout (stats supported there)
    rng = np.random.default_rng(9)
    B, pmax, QS = 4, 8, 2
    lengths = np.array([40, 7, 0, 33], np.int32)
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, QS, QH, D)), jnp.bfloat16)
    out, m, l = ragged_decode(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, pages_per_chunk=2, interpret=True, want_stats=True,
    )
    ref_o, ref_m, ref_l = ragged_decode_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, want_stats=True,
    )
    live = lengths > 0
    np.testing.assert_allclose(np.asarray(out)[live], np.asarray(ref_o)[live],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(m)[live], np.asarray(ref_m)[live],
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(l)[live], np.asarray(ref_l)[live],
                               rtol=3e-2, atol=3e-2)


def test_split_decode_fused_write_matches_two_dispatch():
    """new_kv fusion: (write_kv; ragged_decode) == ragged_decode(new_kv=...)
    for outputs AND the resulting pool, across walk-edge geometries."""
    kv = _split_pool(21)
    rng = np.random.default_rng(21)
    B, pmax = 4, 4
    # lengths INCLUDE the new token: 1 = nothing to walk; 17 = new token
    # starts a fresh chunk (ppc=2, ps=8 -> ck=16); 0 = dead row
    lengths = np.array([17, 1, 0, 27], np.int32)
    page_table = (
        rng.permutation(PAGES)[: B * pmax].reshape(B, pmax).astype(np.int32)
    )
    q = jnp.asarray(rng.normal(size=(B, 1, QH, D)), jnp.bfloat16)
    k_new = jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(B, KVH, D)), jnp.bfloat16)
    pos = np.maximum(lengths - 1, 0)
    slots = np.where(
        lengths > 0,
        page_table[np.arange(B), pos // PS] * PS + pos % PS,
        PAD_SLOT,
    ).astype(np.int32)

    for W, sinks, cap in ((0, None, 0.0), (9, None, 0.0), (-8, None, 0.0),
                          (0, jnp.asarray(rng.normal(size=(QH,)), jnp.float32),
                           0.0), (0, None, 30.0)):
        kv_ref = write_kv(kv, k_new, v_new, jnp.asarray(slots), 1,
                          mode="decode")
        ref = ragged_decode(
            q, kv_ref, jnp.asarray(page_table), jnp.asarray(lengths), 1,
            sm_scale=0.125, pages_per_chunk=2, interpret=True, window=W,
            sinks=sinks, softcap=cap,
        )
        out, kv_f = ragged_decode(
            q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
            sm_scale=0.125, pages_per_chunk=2, interpret=True, window=W,
            sinks=sinks, softcap=cap,
            new_kv=(k_new, v_new, jnp.asarray(slots)),
        )
        live = lengths > 0
        np.testing.assert_allclose(
            np.asarray(out)[live], np.asarray(ref)[live],
            rtol=2e-2, atol=2e-2, err_msg=f"W={W} sinks={sinks is not None}",
        )
        np.testing.assert_array_equal(
            np.asarray(kv_f), np.asarray(kv_ref), err_msg=f"pool W={W}"
        )


def _latent_pool(seed=0):
    k = jax.random.PRNGKey(seed)
    return jax.random.normal(k, (L, PAGES, PS, 2 * KVH * D), jnp.float32).astype(
        jnp.bfloat16
    )  # Xr = 256 (two-vreg row)


def test_latent_write_tokens_rmw_pairs():
    """Latent single-row writes via 2-row RMW groups, incl. a spec span
    whose two tokens share one group."""
    from sglang_awq_tpu.ops.kv_write import kv_write_tokens_latent

    kv = _latent_pool(31)
    Xr = kv.shape[-1]
    rng = np.random.default_rng(31)
    # slots 40,41 share a group (spec span); 7 odd alone; 18 even alone
    slots = np.array([40, 41, 7, PAD_SLOT, 18], np.int32)
    rows = jnp.asarray(rng.normal(size=(5, Xr)), jnp.bfloat16)
    got = kv_write_tokens_latent(kv, rows, jnp.asarray(slots), 1,
                                 interpret=True)
    want = kv.at[1, slots // PS, slots % PS].set(rows, mode="drop")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_latent_ragged_decode_and_extend_match_xla():
    from sglang_awq_tpu.mem_cache.kv_pool import write_kv

    kv = _latent_pool(32)
    Xr = kv.shape[-1]
    rng = np.random.default_rng(32)
    B, pmax = 4, 4
    lengths = np.array([11, 1, 0, 32], np.int32)
    page_table = rng.integers(0, PAGES, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, QH, Xr)), jnp.bfloat16)
    out = ragged_decode(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, pages_per_chunk=2, interpret=True,
    )
    ref = ragged_decode_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125,
    )
    live = lengths > 0
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2
    )

    # extend: write page-aligned rows then attend
    q_lens = np.array([5, 16, 3, 0], np.int32)
    prefixes = np.array([8, 0, 16, 0], np.int32)
    kv_lens = q_lens + prefixes
    BQ = 16
    qb_base = np.array([0, 1, 2, 3], np.int32)
    TQ = 4 * BQ
    qe = jnp.asarray(rng.normal(size=(TQ, QH, Xr)), jnp.bfloat16)
    oute = ragged_extend(
        qe, kv, jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 0,
        sm_scale=0.125, block_q=BQ, pages_per_chunk=2, interpret=True,
    )
    refe = ragged_extend_xla(
        qe, kv, jnp.asarray(page_table), jnp.asarray(kv_lens),
        jnp.asarray(q_lens), jnp.asarray(qb_base), 0,
        sm_scale=0.125, block_q=BQ,
    )
    for b in range(4):
        s, n = qb_base[b] * BQ, q_lens[b]
        np.testing.assert_allclose(
            np.asarray(oute)[s : s + n], np.asarray(refe)[s : s + n],
            rtol=2e-2, atol=2e-2, err_msg=f"seq {b}",
        )


@pytest.mark.slow
def test_wide_split_tail_batched_matches_xla():
    """Round-5 endgame: the row-BATCHED partial-tail kernel (groups of G
    rows, one block-diagonal cross dot per page index) vs the XLA oracle
    at a wide-pool geometry that passes the split-tail gate.  Lengths
    cover exact-chunk boundaries, pure tails, multi-page tails and dead
    rows; sinks fold at the tail emit."""
    import os

    rng = np.random.default_rng(21)
    L, P, ps, kvh, d = 2, 64, 16, 2, 128
    xr = kvh * d
    kv = jnp.asarray(rng.normal(size=(L, P, 2, ps, xr)) * 0.3, jnp.bfloat16)
    B, pmax = 16, 8
    qh = 4
    lengths = np.array(
        [33, 32, 7, 0, 40, 63, 128, 1, 17, 96, 55, 12, 31, 64, 99, 2],
        np.int32)
    page_table = rng.integers(0, P, size=(B, pmax)).astype(np.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, qh, d)), jnp.bfloat16)
    sinks = jnp.asarray(rng.normal(size=(qh,)), jnp.float32)
    old = os.environ.get("SGLT_TAILBATCH_G")
    try:
        os.environ["SGLT_TAILBATCH_G"] = "4"
        out = ragged_decode(
            q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
            sm_scale=0.125, pages_per_chunk=2, interpret=True, sinks=sinks)
    finally:
        if old is None:
            os.environ.pop("SGLT_TAILBATCH_G", None)
        else:
            os.environ["SGLT_TAILBATCH_G"] = old
    ref = ragged_decode_xla(
        q, kv, jnp.asarray(page_table), jnp.asarray(lengths), 1,
        sm_scale=0.125, sinks=sinks)
    live = lengths > 0
    np.testing.assert_allclose(
        np.asarray(out)[live], np.asarray(ref)[live], rtol=2e-2, atol=2e-2)
