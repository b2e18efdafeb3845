"""Spike: bf16 pair-extraction unpack for the AWQ kernel.

Checks, on the real device:
  1. the sublane order of pltpu.bitcast(i32[R, C] -> bf16[2R, C])
     (which half of each i32 lands on which bf16 sublane);
  2. that ((x32 >> s) & 0x000F000F) | 0x43004300 bitcast to bf16 yields
     exactly (128 + nib_lo, 128 + nib_hi) pairs.

This is the unpack that produces TWO bf16 weights per ~1.5 VPU ops
(shift+and+or -> 2 outputs) vs the round-2 magic path's ~4 ops/output.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bitcast_order_kernel(x_ref, o_ref):
    # x_ref: i32 [8, 128]; o_ref: bf16 [16, 128]
    o_ref[:] = pltpu.bitcast(x_ref[:], jnp.bfloat16)


def pair_extract_kernel(x_ref, o_ref):
    # x_ref: i32 [8, 128] of packed nibbles; o_ref: bf16 [4, 16, 128]
    x32 = x_ref[:]
    for i, s in enumerate((0, 4, 8, 12)):
        y = ((x32 >> s) & 0x000F000F) | 0x43004300
        o_ref[i] = pltpu.bitcast(y, jnp.bfloat16)


def main():
    print("devices:", jax.devices(), flush=True)

    # --- 1. bitcast order ---
    x = np.zeros((8, 128), np.int32)
    # i32 row r, col c: low half = 1000 + r, high half = 2000 + r (as bf16 bits)
    for r in range(8):
        lo = np.float32(100 + r)
        hi = np.float32(200 + r)
        lo16 = np.frombuffer(np.asarray(lo, "<f4").tobytes(), "<u2")[1]
        hi16 = np.frombuffer(np.asarray(hi, "<f4").tobytes(), "<u2")[1]
        x[r, :] = np.int32(np.uint32(lo16) | (np.uint32(hi16) << 16))
    out = pl.pallas_call(
        bitcast_order_kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x))
    out = np.asarray(jax.device_get(out))
    print("bitcast i32->bf16 rows (col 0):", out[:, 0].tolist(), flush=True)
    # Expect either [100,200,101,201,...] (low half -> even sublane) or
    # [200,100,201,101,...]

    # --- 2. pair extraction ---
    rng = np.random.default_rng(0)
    nibs = rng.integers(0, 16, size=(8, 8, 128), dtype=np.int64)  # [pos, r, c]
    x32 = np.zeros((8, 128), np.int64)
    for p in range(8):
        x32 |= nibs[p] << (4 * p)
    x32 = x32.astype(np.uint32).view(np.int32)
    out = pl.pallas_call(
        pair_extract_kernel,
        out_shape=jax.ShapeDtypeStruct((4, 16, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x32))
    out = np.asarray(jax.device_get(out)).astype(np.float32)
    ok = True
    for i, s in enumerate((0, 4, 8, 12)):
        nlo, nhi = s // 4, s // 4 + 4
        for r in range(8):
            # try low->even first
            exp_even = 128 + nibs[nlo, r]
            exp_odd = 128 + nibs[nhi, r]
            got_even, got_odd = out[i, 2 * r], out[i, 2 * r + 1]
            if np.array_equal(got_even, exp_even) and np.array_equal(got_odd, exp_odd):
                order = "lo->even"
            elif np.array_equal(got_even, exp_odd) and np.array_equal(got_odd, exp_even):
                order = "hi->even"
            else:
                order = "MISMATCH"
                ok = False
            if r == 0:
                print(f"pass s={s:2d}: {order}", flush=True)
    print("pair extraction:", "OK" if ok else "FAILED", flush=True)


if __name__ == "__main__":
    main()
