"""Rotary position embeddings.

Reference: `python/sglang/srt/layers/rotary_embedding.py` (`get_rope` with
HF scaling types).  Supported here: none / linear / llama3 / dynamic-ntk
(yarn and mrope arrive with the models that need them).

Uses the NEOX (rotate-half) convention that Llama/Qwen checkpoints use.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def compute_inv_freq(head_dim: int, rope_theta: float, rope_scaling: Optional[Dict[str, Any]]) -> np.ndarray:
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if not rope_scaling:
        return inv_freq.astype(np.float32)
    rtype = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
    if rtype in ("default", "mrope"):
        return inv_freq.astype(np.float32)
    if rtype == "linear":
        return (inv_freq / float(rope_scaling["factor"])).astype(np.float32)
    if rtype == "llama3":
        # HF Llama-3.1 frequency-dependent scaling
        factor = float(rope_scaling["factor"])
        low = float(rope_scaling["low_freq_factor"])
        high = float(rope_scaling["high_freq_factor"])
        orig_ctx = float(rope_scaling["original_max_position_embeddings"])
        wavelen = 2 * np.pi / inv_freq
        low_wl = orig_ctx / low
        high_wl = orig_ctx / high
        scaled = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
        smooth = (orig_ctx / wavelen - low) / (high - low)
        mid = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
        return np.where(is_mid, mid, scaled).astype(np.float32)
    raise NotImplementedError(f"rope scaling type {rtype!r}")


def rope_table(
    max_positions: int,
    head_dim: int,
    rope_theta: float,
    rope_scaling: Optional[Dict[str, Any]] = None,
) -> jax.Array:
    """Precomputed [max_positions, head_dim] table: [cos | sin] halves."""
    inv_freq = compute_inv_freq(head_dim, rope_theta, rope_scaling)
    t = np.arange(max_positions, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # [P, D/2]
    return jnp.asarray(
        np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1), jnp.float32
    )


def apply_rope(
    q: jax.Array,  # [T, QH, D]
    k: jax.Array,  # [T, KVH, D]
    positions: jax.Array,  # [T] int32
    table: jax.Array,  # [P, D] ([cos | sin])
):
    cs = table[positions]  # [T, D]
    d2 = q.shape[-1] // 2
    cos = cs[:, None, :d2]
    sin = cs[:, None, d2:]

    def rot(x):
        xf = x.astype(jnp.float32)
        x1, x2 = xf[..., :d2], xf[..., d2:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(x.dtype)

    return rot(q), rot(k)
