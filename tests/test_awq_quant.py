"""AWQ semantics tests.

Mirrors the reference's kernel-unit-test strategy: a pure reference
implementation (numpy, same semantics as reference
`test/srt/quant/test_awq_dequant.py:32-60`) validated against the TPU layout
converter, the XLA fallback, and the Pallas kernel (interpret mode on CPU).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.quantization.awq_config import (
    AWQConfig,
    awq_dequantize_ref,
    pack_awq_reference,
    unpack_awq_int32,
)
from sglang_awq_tpu.ops.awq_matmul import (
    awq_matmul,
    awq_matmul_xla,
    choose_pack_block,
    convert_awq_tensor,
    dequantize_xla,
    pack_rows_tpu_magic,
    pack_rows_tpu_pair,
    unpack_rows_tpu,
    unpack_rows_tpu_magic,
    unpack_rows_tpu_pair,
)


def make_awq_layer(rng, K, N, G):
    wq = rng.integers(0, 16, (K, N)).astype(np.int32)
    zq = rng.integers(0, 16, (max(1, K // G), N)).astype(np.int32)
    scales = (rng.standard_normal((max(1, K // G), N)) * 0.01 + 0.02).astype(np.float16)
    return pack_awq_reference(wq), pack_awq_reference(zq), scales, wq


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    wq = rng.integers(0, 16, (64, 32)).astype(np.int32)
    packed = pack_awq_reference(wq)
    assert packed.shape == (64, 4)
    assert (unpack_awq_int32(packed) == wq).all()


def test_awq_config_parsing():
    cfg = AWQConfig.from_config({"w_bit": 4, "q_group_size": 64, "zero_point": True})
    assert cfg.group_size == 64 and cfg.pack_factor == 8
    cfg2 = AWQConfig.from_config({"bits": 4, "group_size": 128})
    assert cfg2.group_size == 128
    with pytest.raises(ValueError):
        AWQConfig.from_config({"bits": 8, "group_size": 128})


@pytest.mark.parametrize(
    "K,N,G",
    [(512, 768, 128), (1024, 256, 64), (256, 128, 256), (128, 256, 128)],
)
def test_convert_and_dequant_exact(K, N, G):
    rng = np.random.default_rng(1)
    qweight, qzeros, scales, wq = make_awq_layer(rng, K, N, G)
    W_ref = awq_dequantize_ref(qweight, scales, qzeros, G)

    qw_u8, s_t, b_f32, pb = convert_awq_tensor(qweight, qzeros, scales, G)
    assert (unpack_rows_tpu(qw_u8, pb) == wq).all()

    W_xla = np.asarray(
        dequantize_xla(
            jnp.asarray(qw_u8),
            jnp.asarray(s_t),
            jnp.asarray(b_f32),
            group_size=G,
            pack_block=pb,
            out_dtype=jnp.float32,
        )
    )
    np.testing.assert_allclose(W_xla, W_ref, atol=1e-3)


@pytest.mark.parametrize("K,N,G,M", [(512, 768, 128, 13), (1024, 256, 64, 1)])
def test_awq_matmul_matches_reference(K, N, G, M):
    rng = np.random.default_rng(2)
    qweight, qzeros, scales, _ = make_awq_layer(rng, K, N, G)
    W_ref = awq_dequantize_ref(qweight, scales, qzeros, G)
    qw_u8, s_t, b_f32, pb = convert_awq_tensor(qweight, qzeros, scales, G)

    x = rng.standard_normal((M, K)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    y_ref = np.asarray(xb, np.float32) @ W_ref

    qw3, s3, b3 = (jnp.asarray(a)[None] for a in (qw_u8, s_t, b_f32))
    y_xla = np.asarray(
        awq_matmul_xla(xb, qw3, s3, b3, 0, group_size=G, pack_block=pb, out_dtype=jnp.float32)
    )
    y_pal = np.asarray(
        awq_matmul(
            xb, qw3, s3, b3, 0, group_size=G, pack_block=pb, block_n=128, out_dtype=jnp.float32
        )
    )
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y_xla - y_ref).max() / scale < 0.02
    assert np.abs(y_pal - y_ref).max() / scale < 0.02


def test_stacked_layer_indexing():
    """The layer scalar must select the right slice of the weight stack."""
    rng = np.random.default_rng(3)
    K, N, G, L = 256, 128, 128, 3
    stacks = []
    refs = []
    for _ in range(L):
        qweight, qzeros, scales, _ = make_awq_layer(rng, K, N, G)
        refs.append(awq_dequantize_ref(qweight, scales, qzeros, G))
        stacks.append(convert_awq_tensor(qweight, qzeros, scales, G, pack_block=256))
    qw = jnp.asarray(np.stack([s[0] for s in stacks]))
    st = jnp.asarray(np.stack([s[1] for s in stacks]))
    bt = jnp.asarray(np.stack([s[2] for s in stacks]))

    x = jnp.asarray(rng.standard_normal((4, K)), jnp.bfloat16)
    for l in range(L):
        y_ref = np.asarray(x, np.float32) @ refs[l]
        y = np.asarray(
            awq_matmul(
                x, qw, st, bt, l, group_size=G, pack_block=256, block_n=128,
                out_dtype=jnp.float32,
            )
        )
        scale = np.abs(y_ref).max() + 1e-9
        assert np.abs(y - y_ref).max() / scale < 0.02, f"layer {l}"


def test_magic_pack_roundtrip():
    rng = np.random.default_rng(7)
    wq = rng.integers(0, 16, (512, 128)).astype(np.int32)
    for pb in (256, 512):
        pk = pack_rows_tpu_magic(wq, pb)
        assert pk.shape == (256, 128)
        assert (unpack_rows_tpu_magic(pk, pb) == wq).all(), pb


@pytest.mark.parametrize("K,N,G", [(512, 256, 128), (1024, 128, 64)])
def test_magic_layout_dequant_exact(K, N, G):
    """The magic (fp32-exponent) device layout dequantizes identically."""
    rng = np.random.default_rng(8)
    qweight, qzeros, scales, wq = make_awq_layer(rng, K, N, G)
    W_ref = awq_dequantize_ref(qweight, scales, qzeros, G)
    qw, st, bt, pb = convert_awq_tensor(qweight, qzeros, scales, G, unpack="magic")
    assert (unpack_rows_tpu_magic(qw, pb) == wq).all()
    W = np.asarray(
        dequantize_xla(
            jnp.asarray(qw), jnp.asarray(st), jnp.asarray(bt),
            group_size=G, pack_block=pb, out_dtype=jnp.float32, unpack="magic",
        )
    )
    np.testing.assert_allclose(W, W_ref, atol=1e-3)


def test_magic_matmul_xla_matches_reference():
    rng = np.random.default_rng(9)
    K, N, G, M = 512, 256, 128, 5
    qweight, qzeros, scales, _ = make_awq_layer(rng, K, N, G)
    W_ref = awq_dequantize_ref(qweight, scales, qzeros, G)
    qw, st, bt, pb = convert_awq_tensor(qweight, qzeros, scales, G, unpack="magic")
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    y_ref = np.asarray(x, np.float32) @ W_ref
    qw3, s3, b3 = (jnp.asarray(a)[None] for a in (qw, st, bt))
    y = np.asarray(
        awq_matmul_xla(
            x, qw3, s3, b3, 0, group_size=G, pack_block=pb,
            out_dtype=jnp.float32, unpack="magic",
        )
    )
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y - y_ref).max() / scale < 0.02


def test_pair_pack_roundtrip():
    rng = np.random.default_rng(11)
    wq = rng.integers(0, 16, (512, 128)).astype(np.int32)
    for pb in (256, 512):
        pk = pack_rows_tpu_pair(wq, pb)
        assert pk.shape == (256, 128)
        assert (unpack_rows_tpu_pair(pk, pb) == wq).all(), pb


@pytest.mark.parametrize("K,N,G", [(512, 256, 128), (1024, 128, 64), (256, 128, 256)])
def test_pair_layout_dequant_exact(K, N, G):
    """The pair (bf16-pair-extraction) device layout dequantizes identically."""
    rng = np.random.default_rng(12)
    qweight, qzeros, scales, wq = make_awq_layer(rng, K, N, G)
    W_ref = awq_dequantize_ref(qweight, scales, qzeros, G)
    qw, st, bt, pb = convert_awq_tensor(qweight, qzeros, scales, G, unpack="pair")
    assert (unpack_rows_tpu_pair(qw, pb) == wq).all()
    W = np.asarray(
        dequantize_xla(
            jnp.asarray(qw), jnp.asarray(st), jnp.asarray(bt),
            group_size=G, pack_block=pb, out_dtype=jnp.float32, unpack="pair",
        )
    )
    np.testing.assert_allclose(W, W_ref, atol=1e-3)


def test_pair_matmul_xla_matches_reference():
    rng = np.random.default_rng(13)
    K, N, G, M = 512, 256, 128, 5
    qweight, qzeros, scales, _ = make_awq_layer(rng, K, N, G)
    W_ref = awq_dequantize_ref(qweight, scales, qzeros, G)
    qw, st, bt, pb = convert_awq_tensor(qweight, qzeros, scales, G, unpack="pair")
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    y_ref = np.asarray(x, np.float32) @ W_ref
    qw3, s3, b3 = (jnp.asarray(a)[None] for a in (qw, st, bt))
    y = np.asarray(
        awq_matmul_xla(
            x, qw3, s3, b3, 0, group_size=G, pack_block=pb,
            out_dtype=jnp.float32, unpack="pair",
        )
    )
    scale = np.abs(y_ref).max() + 1e-9
    assert np.abs(y - y_ref).max() / scale < 0.02


def test_choose_pack_block():
    # largest block keeping >= 4 k-tiles (see kernel sweet-spot note)
    assert choose_pack_block(4096, 128) == 1024
    assert choose_pack_block(14336, 128) == 2048
    assert choose_pack_block(5632, 128) == 512
    assert choose_pack_block(256, 256) == 128  # only G-divisor available
    assert choose_pack_block(2048, 64) == 512
