"""RMSNorm (reference `python/sglang/srt/layers/layernorm.py` semantics).

Plain jnp — XLA fuses the reduce+scale into neighbors on TPU; no Pallas
needed (SURVEY.md §2.7: "XLA fusions usually suffice").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """x: [..., H] bf16; weight: [H]. Compute in f32, return x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def fused_add_rms_norm(x, residual, weight, eps: float):
    """Returns (normed(x + residual), x + residual) like the reference's
    fused_add_rmsnorm (layernorm.py)."""
    s = (x.astype(jnp.float32) + residual.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(s, weight, eps), s


def layer_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """Mean-centered LayerNorm, weight only (Cohere's CohereLayerNorm:
    no bias).  Compute in f32, return x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm_bias(x: jax.Array, weight: jax.Array, bias: jax.Array,
                    eps: float) -> jax.Array:
    """Full nn.LayerNorm (weight + bias), f32 compute (StarCoder2)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = (
        xc * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
        + bias.astype(jnp.float32)
    )
    return out.astype(x.dtype)
