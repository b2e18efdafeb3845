"""Activations (reference `python/sglang/srt/layers/activation.py`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(gate_up: jax.Array) -> jax.Array:
    """[..., 2I] -> [..., I]: silu(gate) * up (SwiGLU).

    Matches the reference's SiluAndMul: first half is the gate.
    """
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(
        gate_up.dtype
    )


def gelu_and_mul(gate_up: jax.Array) -> jax.Array:
    gate, up = jnp.split(gate_up, 2, axis=-1)
    return (jax.nn.gelu(gate.astype(jnp.float32), approximate=True) * up.astype(jnp.float32)).astype(
        gate_up.dtype
    )
