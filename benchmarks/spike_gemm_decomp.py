"""Decompose the fused AWQ pair-GEMM's cost on-chip (M=64 decode regime).

The kernel runs ~460 GB/s of the ~820 GB/s HBM peak at M=64 while the
M=8 regime hits ~860 (≈ roofline), so ~half the time is COMPUTE added by
the batch dimension.  Candidate explanations: (a) the 16 per-group K=128
dots' MXU streaming, (b) the f32 epilogue (scale-mult + accumulate per
group), (c) poor VPU(unpack)/MXU overlap.  Rather than theorize, measure
ablations that keep DMA identical:

  full        current pair kernel (baseline)
  nounpack    same dots + epilogue on junk bf16 (bitcast) weights — NO
              shift/and/or unpack ops
  noepi       unpack + dots, but accumulate unscaled (one scale at end)
  onedot      unpack + weight-side scaling (repeat rows) + ONE K=PB/4 dot
              per quarter — 4 dots/block instead of PB/G, no epilogue
  m8          full kernel fed an M=8 x (the known-roofline regime)

Run on the real TPU: python benchmarks/spike_gemm_decomp.py
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.ops.awq_matmul import scale_rows_per_tile
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from microbench import bench_matmul_like  # noqa: E402

M, K, N = 64, 4096, 14336
PB, G = 1024, 128
BN = 2048
L = 8


def _kernel(layer_ref, x_ref, qw_ref, s_ref, b_ref, o_ref, acc_ref,
            *, variant, k_tiles):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    sr, _ = scale_rows_per_tile(PB, G)
    q4 = PB // 4
    x32 = pltpu.bitcast(qw_ref[0], jnp.int32)
    s = s_ref[0]
    b = b_ref[0]
    gpp = q4 // G

    if variant in ("noepi4", "noepi1"):
        # dot-granularity probe (numerics wrong: no per-group scaling)
        parts = []
        for i in range(4):
            y = (x32 >> (4 * i)) if i else x32
            y = (y & 0x000F000F) | 0x43004300
            parts.append(pltpu.bitcast(y, jnp.bfloat16))
        if variant == "noepi4":
            acc = None
            for i in range(4):
                p = jnp.dot(x[:, i * q4:(i + 1) * q4], parts[i],
                            preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
        else:
            wb = jnp.concatenate(parts, axis=0)  # [PB, BN]
            acc = jnp.dot(x, wb, preferred_element_type=jnp.float32)
        acc_ref[:] += acc * s[:1, :]
    elif variant == "nounpack":
        junk = pltpu.bitcast(qw_ref[0], jnp.bfloat16)  # [PB/4, BN]
        acc = None
        for i in range(4):
            for g in range(gpp):
                part = jnp.dot(
                    x[:, i * q4 + g * G: i * q4 + (g + 1) * G],
                    junk[g * G:(g + 1) * G, :],
                    preferred_element_type=jnp.float32,
                )
                term = part * s[i * gpp + g: i * gpp + g + 1, :]
                acc = term if acc is None else acc + term
        acc_ref[:] += acc
    elif variant in ("full", "noepi", "m8", "m128"):
        acc = None
        for i in range(4):
            y = (x32 >> (4 * i)) if i else x32
            y = (y & 0x000F000F) | 0x43004300
            wb = pltpu.bitcast(y, jnp.bfloat16)
            for g in range(gpp):
                part = jnp.dot(
                    x[:, i * q4 + g * G: i * q4 + (g + 1) * G],
                    wb[g * G:(g + 1) * G, :],
                    preferred_element_type=jnp.float32,
                )
                if variant != "noepi":
                    part = part * s[i * gpp + g: i * gpp + g + 1, :]
                acc = part if acc is None else acc + part
        if variant == "noepi":
            acc = acc * s[:1, :]
        acc_ref[:] += acc
    elif variant == "onedot":
        acc = None
        for i in range(4):
            y = (x32 >> (4 * i)) if i else x32
            y = (y & 0x000F000F) | 0x43004300
            wb = pltpu.bitcast(y, jnp.bfloat16)  # [q4, BN]
            srep = jnp.repeat(
                s[i * gpp:(i + 1) * gpp, :], G, axis=0
            ).astype(jnp.bfloat16)  # [q4, BN]
            part = jnp.dot(
                x[:, i * q4:(i + 1) * q4], wb * srep,
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        acc_ref[:] += acc
    else:
        raise ValueError(variant)

    # zero-correction (identical across variants; cheap)
    gs = PB // sr
    xs = jnp.concatenate(
        [jnp.sum(x[:, t * gs:(t + 1) * gs].astype(jnp.float32), axis=1,
                 keepdims=True) for t in range(sr)], axis=1)
    acc_ref[:] -= jnp.dot(xs, b[:sr, :], preferred_element_type=jnp.float32)

    @pl.when(k == k_tiles - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(x, qw, s, b, layer, *, variant):
    m = x.shape[0]
    k_tiles = K // PB
    _, sr_pad = scale_rows_per_tile(PB, G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, N // BN, k_tiles),
        in_specs=[
            pl.BlockSpec((m, PB), lambda mm, n, k, lr: (mm, k)),
            pl.BlockSpec((1, PB // 2, BN), lambda mm, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, BN), lambda mm, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, BN), lambda mm, n, k, lr: (lr[0], k, n)),
        ],
        out_specs=pl.BlockSpec((m, BN), lambda mm, n, k, lr: (mm, n)),
        scratch_shapes=[pltpu.VMEM((m, BN), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant, k_tiles=k_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(layer, x, qw, s, b)


def main():
    rng = np.random.default_rng(0)
    k_tiles = K // PB
    _, sr_pad = scale_rows_per_tile(PB, G)
    qw = jnp.asarray(rng.integers(0, 256, (L, K // 2, N)), jnp.uint8)
    s = jnp.asarray(rng.standard_normal((L, k_tiles * sr_pad, N)) * 1e-2,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((L, k_tiles * sr_pad, N)) * 1e-2,
                    jnp.float32)
    bytes_per = K * N // 2 + 2 * k_tiles * sr_pad * N * 4

    wdq = jnp.asarray(rng.standard_normal((L, K, N)) * 1e-2,
                      jnp.bfloat16)  # pre-dequantized frontier probe

    variants = sys.argv[1:] or ["full", "noepi4", "noepi1", "m128", "xla_bf16"]
    for variant in variants:
        m = {"m8": 8, "m128": 128}.get(variant, M)
        x0 = jnp.asarray(rng.standard_normal((m, K)) * 0.1, jnp.bfloat16)

        if variant == "xla_bf16":
            def f(xc, i, wdq):
                w = jax.lax.dynamic_index_in_dim(wdq, i % L, 0, keepdims=False)
                return jnp.dot(xc, w, preferred_element_type=jnp.float32)

            t = bench_matmul_like(f, x0, wdq, iters_pair=(256, 2048))
        else:
            def f(xc, i, qw, s, b, variant=variant):
                return run(xc, qw, s, b,
                           jnp.asarray(i % L, jnp.int32).reshape(1),
                           variant=variant)

            t = bench_matmul_like(f, x0, qw, s, b, iters_pair=(256, 2048))
        print(f"{variant:10s} M={m:3d}  {t * 1e6:8.1f} us/iter  "
              f"{bytes_per / t / 1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
