"""Fused AWQ MLP megakernel semantics (interpret mode on CPU).

Reference: the gate_up GEMM + SiluAndMul + down GEMM sequence
(`/root/reference/python/sglang/srt/models/llama.py:61` LlamaMLP).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.ops.awq_matmul import convert_awq_tensor
from sglang_awq_tpu.ops.awq_mlp import awq_mlp_fused
from sglang_awq_tpu.quantization.awq_config import (
    awq_dequantize_ref,
    pack_awq_reference,
)


def _mk(rng, K, N, G):
    wq = rng.integers(0, 16, (K, N)).astype(np.int32)
    zq = rng.integers(0, 16, (K // G, N)).astype(np.int32)
    sc = (rng.standard_normal((K // G, N)) * 0.02 + 0.03).astype(np.float16)
    return pack_awq_reference(wq), pack_awq_reference(zq), sc


@pytest.mark.parametrize(
    "K,I,G,M,ci,act",
    [
        (256, 512, 128, 5, 256, "silu"),
        (512, 256, 128, 16, 256, "silu"),
        (256, 512, 64, 3, 512, "gelu"),
    ],
)
def test_mlp_fused_matches_reference(K, I, G, M, ci, act):
    rng = np.random.default_rng(41)
    gw, gz, gsc = _mk(rng, K, 2 * I, G)
    dw, dz, dsc = _mk(rng, I, K, G)
    Wg = awq_dequantize_ref(gw, gsc, gz, G)
    Wd = awq_dequantize_ref(dw, dsc, dz, G)
    qg, sg, bg, pbg = convert_awq_tensor(gw, gz, gsc, G, unpack="pair")
    qd, sd, bd, pbd = convert_awq_tensor(dw, dz, dsc, G, unpack="pair")
    if ci % pbd:
        pytest.skip("chunk below pack block")

    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
    xf = np.asarray(x, np.float32)
    gu = xf @ Wg
    g, u = gu[:, :I], gu[:, I:]
    if act == "silu":
        a = g / (1.0 + np.exp(-g)) * u
    else:
        a = (
            0.5 * g
            * (1.0 + np.tanh(0.7978845608028654 * (g + 0.044715 * g**3)))
            * u
        )
    y_ref = a @ Wd

    y = np.asarray(
        awq_mlp_fused(
            x,
            jnp.asarray(qg)[None], jnp.asarray(sg)[None], jnp.asarray(bg)[None],
            jnp.asarray(qd)[None], jnp.asarray(sd)[None], jnp.asarray(bd)[None],
            0,
            group_size=G, pb_gu=pbg, pb_d=pbd, chunk_i=ci, act=act,
            out_dtype=jnp.float32, interpret=True,
        )
    )
    scale = np.abs(y_ref).max() + 1e-9
    # bf16 rounding of the intermediate activation bounds the error
    assert np.abs(y - y_ref).max() / scale < 0.02


def test_mlp_fused_layer_indexing():
    rng = np.random.default_rng(42)
    K, I, G, M, L = 256, 256, 128, 4, 2
    stacks_g, stacks_d, refs = [], [], []
    for _ in range(L):
        gw, gz, gsc = _mk(rng, K, 2 * I, G)
        dw, dz, dsc = _mk(rng, I, K, G)
        refs.append((awq_dequantize_ref(gw, gsc, gz, G),
                     awq_dequantize_ref(dw, dsc, dz, G)))
        stacks_g.append(convert_awq_tensor(gw, gz, gsc, G, unpack="pair"))
        stacks_d.append(convert_awq_tensor(dw, dz, dsc, G, unpack="pair"))
    pbg, pbd = stacks_g[0][3], stacks_d[0][3]
    qg = jnp.asarray(np.stack([s[0] for s in stacks_g]))
    sg = jnp.asarray(np.stack([s[1] for s in stacks_g]))
    bg = jnp.asarray(np.stack([s[2] for s in stacks_g]))
    qd = jnp.asarray(np.stack([s[0] for s in stacks_d]))
    sd = jnp.asarray(np.stack([s[1] for s in stacks_d]))
    bd = jnp.asarray(np.stack([s[2] for s in stacks_d]))
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.3, jnp.bfloat16)
    xf = np.asarray(x, np.float32)
    for l in range(L):
        Wg, Wd = refs[l]
        gu = xf @ Wg
        g, u = gu[:, :I], gu[:, I:]
        y_ref = (g / (1.0 + np.exp(-g)) * u) @ Wd
        y = np.asarray(
            awq_mlp_fused(
                x, qg, sg, bg, qd, sd, bd, l,
                group_size=G, pb_gu=pbg, pb_d=pbd, chunk_i=256,
                out_dtype=jnp.float32, interpret=True,
            )
        )
        scale = np.abs(y_ref).max() + 1e-9
        assert np.abs(y - y_ref).max() / scale < 0.02, f"layer {l}"
