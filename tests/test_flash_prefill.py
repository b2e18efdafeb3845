"""Flash prefill/extend kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.ops.flash_prefill import flash_prefill, flash_prefill_xla


@pytest.mark.parametrize(
    "QH,KVH,prefix,q_len,T_pad,S_pad",
    [
        (8, 2, 0, 100, 128, 128),  # fresh prefill
        (8, 2, 70, 57, 128, 256),  # chunk with cached prefix
        (4, 4, 0, 128, 128, 128),  # MHA exact fit
        (16, 2, 200, 1, 128, 512),  # single-token extend
    ],
)
def test_flash_prefill_matches_xla(QH, KVH, prefix, q_len, T_pad, S_pad):
    rng = np.random.default_rng(0)
    D = 128
    kv_len = prefix + q_len
    assert kv_len <= S_pad
    q = jnp.asarray(rng.standard_normal((QH, T_pad, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((KVH, S_pad, D)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((KVH, S_pad, D)) * 0.5, jnp.bfloat16)
    sm = 1.0 / np.sqrt(D)
    ref = np.asarray(
        flash_prefill_xla(q, k, v, prefix, q_len, kv_len, sm_scale=sm)
    )
    out = np.asarray(
        flash_prefill(
            q, k, v, prefix, q_len, kv_len, sm_scale=sm, block_q=128, block_k=128
        )
    )
    np.testing.assert_allclose(out[:, :q_len], ref[:, :q_len], atol=3e-2, rtol=3e-2)
