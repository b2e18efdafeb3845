"""Rotary position embeddings.

Reference: `python/sglang/srt/layers/rotary_embedding.py` (`get_rope` with
HF scaling types).  Supported here: none / linear / llama3 / yarn /
dynamic-NTK (mrope arrives with the VLM models that need it).

Uses the NEOX (rotate-half) convention that Llama/Qwen checkpoints use.
Yarn's attention-temperature mscale folds into the cos/sin table;
dynamic NTK precomputes for the serving context length (the standard
static worst-case approximation — positions inside the original window
use the unscaled base exactly as HF does once the cache has grown).
"""

from __future__ import annotations

from math import ceil, floor, log, sqrt
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _yarn_correction_dim(num_rot: float, dim: int, base: float,
                         max_pos: float) -> float:
    return (dim * log(max_pos / (num_rot * 2 * np.pi))) / (2 * log(base))


def compute_inv_freq(
    head_dim: int,
    rope_theta: float,
    rope_scaling: Optional[Dict[str, Any]],
    max_positions: int = 0,
    trained_max: int = 0,  # config max_position_embeddings (dynamic NTK)
) -> Tuple[np.ndarray, float]:
    """-> (inv_freq [D/2], mscale applied to cos/sin)."""
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if not rope_scaling:
        return inv_freq.astype(np.float32), 1.0
    rtype = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
    if rtype in ("default", "mrope"):
        return inv_freq.astype(np.float32), 1.0
    if rtype == "linear":
        return (inv_freq / float(rope_scaling["factor"])).astype(np.float32), 1.0
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
        return np.where(is_mid, mid, scaled).astype(np.float32), 1.0
    if rtype == "yarn":
        factor = float(rope_scaling["factor"])
        orig_max = float(
            rope_scaling.get("original_max_position_embeddings", 4096)
        )
        beta_fast = float(rope_scaling.get("beta_fast", 32))
        beta_slow = float(rope_scaling.get("beta_slow", 1))
        attn_factor = float(rope_scaling.get("attention_factor")
                            or rope_scaling.get("attn_factor") or 1.0)
        extrap = inv_freq
        interp = inv_freq / factor
        lo = floor(_yarn_correction_dim(beta_fast, head_dim, rope_theta,
                                        orig_max))
        hi = ceil(_yarn_correction_dim(beta_slow, head_dim, rope_theta,
                                       orig_max))
        lo, hi = max(lo, 0), min(hi, head_dim - 1)
        ramp = np.clip(
            (np.arange(head_dim // 2, dtype=np.float64) - lo)
            / max(hi - lo, 0.001),
            0, 1,
        )
        mask = 1.0 - ramp  # 1 -> extrapolate (high freq), 0 -> interpolate
        out = interp * (1 - mask) + extrap * mask
        mscale = (0.1 * log(factor) + 1.0) if factor > 1.0 else 1.0
        return out.astype(np.float32), float(mscale * attn_factor)
    if rtype == "dynamic":
        # dynamic NTK, precomputed for the serving context (vLLM-style):
        # scale the base for max_positions, exact beyond the original window
        factor = float(rope_scaling["factor"])
        # HF semantics: the trained window is config.max_position_embeddings
        orig_max = float(
            rope_scaling.get("original_max_position_embeddings")
            or trained_max or 4096
        )
        seq_len = max(float(max_positions), orig_max)
        base = rope_theta * (
            (factor * seq_len / orig_max) - (factor - 1)
        ) ** (head_dim / (head_dim - 2))
        inv_freq = 1.0 / (
            base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
        )
        return inv_freq.astype(np.float32), 1.0
    if rtype == "longrope":
        # LongRoPE (Phi-3; HF _compute_longrope_parameters): per-dim factor
        # lists.  HF switches short->long factors at runtime when the seq
        # crosses original_max; for serving we pick STATICALLY from the
        # table length (vLLM-style su-rope) so cached prefixes never change.
        orig_max = float(
            rope_scaling.get("original_max_position_embeddings")
            or trained_max or 4096
        )
        target = float(trained_max or max_positions or orig_max)
        factor = float(rope_scaling.get("factor") or (target / orig_max))
        attn_factor = rope_scaling.get("attention_factor")
        if attn_factor is None:
            attn_factor = (
                1.0 if factor <= 1.0
                else sqrt(1.0 + log(factor) / log(orig_max))
            )
        use_long = max(float(max_positions), target) > orig_max
        ext = np.asarray(
            rope_scaling["long_factor"] if use_long
            else rope_scaling["short_factor"],
            np.float64,
        )
        assert ext.shape == (head_dim // 2,), (ext.shape, head_dim)
        return (inv_freq / ext).astype(np.float32), float(attn_factor)
    raise NotImplementedError(f"rope scaling type {rtype!r}")


def rope_table(
    max_positions: int,
    head_dim: int,
    rope_theta: float,
    rope_scaling: Optional[Dict[str, Any]] = None,
    trained_max: int = 0,
) -> jax.Array:
    """Precomputed [max_positions, head_dim] table: [cos | sin] halves."""
    inv_freq, mscale = compute_inv_freq(
        head_dim, rope_theta, rope_scaling, max_positions, trained_max
    )
    t = np.arange(max_positions, dtype=np.float32)
    freqs = np.outer(t, inv_freq)  # [P, D/2]
    return jnp.asarray(
        np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1) * mscale,
        jnp.float32,
    )


def apply_rope(
    q: jax.Array,  # [T, QH, D]
    k: jax.Array,  # [T, KVH, D]
    positions: jax.Array,  # [T] int32, or [3, T] for mrope
    table: jax.Array,  # [P, rot_dim] ([cos | sin])
    mrope_section=None,  # tuple of D/2 section sizes over (t, h, w) axes
):
    """Half-split rotation.  A table narrower than the head dim means
    PARTIAL rotary (partial_rotary_factor — Nemotron/Phi/StableLM): only
    the first rot_dim features rotate, the tail passes through.

    mrope (Qwen2-VL family, reference `rotary_embedding.py`
    MRotaryEmbedding): positions carry THREE streams (temporal, height,
    width); frequency dim d takes its cos/sin from the stream its section
    covers.  Decode steps pass 1-D positions (all streams equal after the
    prompt — the per-request mrope_position_delta offset), which falls
    through to the standard path.
    """
    if positions.ndim == 2:
        assert mrope_section is not None
        cs3 = table[positions]  # [3, T, rot_dim]
        d2 = cs3.shape[-1] // 2
        sec_axis = np.repeat(
            np.arange(len(mrope_section)), np.asarray(mrope_section)
        )
        assert sec_axis.shape[0] == d2, (mrope_section, d2)
        sel = jnp.asarray(
            np.eye(3, dtype=np.float32)[sec_axis]
        )  # [d2, 3]
        half = jnp.einsum("std,ds->td", cs3.astype(jnp.float32),
                          jnp.concatenate([sel, sel], axis=0))
        cs = half  # [T, rot_dim] with per-dim stream selection
    else:
        cs = table[positions]  # [T, rot_dim]
    rot_dim = cs.shape[-1]
    d2 = rot_dim // 2
    cos = cs[:, None, :d2]
    sin = cs[:, None, d2:]

    def rot(x):
        xf = x.astype(jnp.float32)
        xr, xp = xf[..., :rot_dim], xf[..., rot_dim:]
        x1, x2 = xr[..., :d2], xr[..., d2:]
        out = jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )
        if xp.shape[-1]:
            out = jnp.concatenate([out, xp], axis=-1)
        return out.astype(x.dtype)

    return rot(q), rot(k)
