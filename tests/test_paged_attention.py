"""Paged decode attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_awq_tpu.ops.paged_attention import paged_attention, paged_attention_xla


def make_case(rng, B, QH, KVH, D, L, n_pages, ps, pmax, lengths):
    q = jnp.asarray(rng.standard_normal((B, QH, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((L, KVH, n_pages, ps, D)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, KVH, n_pages, ps, D)) * 0.5, jnp.bfloat16)
    # distinct random pages per row (simulate allocator)
    pt = np.zeros((B, pmax), np.int32)
    perm = rng.permutation(n_pages)
    idx = 0
    for b in range(B):
        need = -(-int(lengths[b]) // ps) if lengths[b] else 0
        pt[b, :need] = perm[idx : idx + need]
        idx += need
    return q, k, v, jnp.asarray(pt), jnp.asarray(lengths, jnp.int32)


@pytest.mark.parametrize(
    "B,QH,KVH,lengths",
    [
        (2, 8, 2, [37, 64]),
        (4, 4, 4, [1, 130, 0, 17]),  # includes a padded (zero-length) row
        (3, 16, 2, [256, 3, 129]),
        (1, 8, 1, [5]),
    ],
)
def test_paged_attention_matches_xla(B, QH, KVH, lengths):
    rng = np.random.default_rng(0)
    D, L, ps, pmax = 128, 3, 16, 16
    n_pages = 128
    q, k, v, pt, lens = make_case(rng, B, QH, KVH, D, L, n_pages, ps, pmax, lengths)
    sm = 1.0 / np.sqrt(D)
    for layer in (0, L - 1):
        ref = np.asarray(paged_attention_xla(q, k, v, pt, lens, layer, sm_scale=sm))
        out = np.asarray(
            paged_attention(q, k, v, pt, lens, layer, sm_scale=sm, pages_per_chunk=4)
        )
        live = np.asarray(lens) > 0
        np.testing.assert_allclose(out[live], ref[live], atol=3e-2, rtol=3e-2)


def test_paged_attention_single_chunk():
    """Sequences shorter than one chunk."""
    rng = np.random.default_rng(1)
    B, QH, KVH, D, L, ps, pmax = 2, 8, 8, 128, 1, 16, 4
    q, k, v, pt, lens = make_case(rng, B, QH, KVH, D, L, 32, ps, pmax, [2, 9])
    sm = 0.1
    ref = np.asarray(paged_attention_xla(q, k, v, pt, lens, 0, sm_scale=sm))
    out = np.asarray(paged_attention(q, k, v, pt, lens, 0, sm_scale=sm, pages_per_chunk=8))
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)
