"""Structural variants of the pair AWQ kernel at decode M=64 (all 4 shapes).

Probes where the non-DMA time goes in `awq_matmul_pair_fused` and which
restructure recovers it.  Variants (numerics-exact unless marked):

  base      production structure: per-group dots + scale epilogue,
            HIGHEST-precision correction dot with (z+128)*s bias
  corrdef   same but correction at DEFAULT precision (WRONG numerics —
            isolates the HIGHEST 6-pass tax)
  nocorr    no correction dot at all (WRONG numerics — isolates all corr)
  epi128    fold the 128-term into the per-group epilogue as an [M,1]
            broadcast subtract: term = (part - 128*xs_g) * s_g; the
            remaining correction (zero*s bias) runs at DEFAULT precision.
            EXACT numerics (the 128 cancellation is f32-exact).
  pipe      epi128 + software-pipelined unpack: quarter-block i+1's VPU
            unpack is issued before quarter-block i's dots so Mosaic can
            overlap VPU with MXU.

Run: python benchmarks/spike_pair_opt.py [variants...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from microbench import bench_loop_fn
from sglang_awq_tpu.ops.awq_matmul import scale_rows_per_tile

SHAPES = {
    # name: (K, N, PB, BN) — production pb/bn choices at tp=1
    "qkv": (4096, 6144, 1024, 2048),
    "o": (4096, 4096, 1024, 2048),
    "gate_up": (4096, 28672, 2048, 4096),
    "down": (14336, 4096, 2048, 2048),
}
M, G, L = 64, 128, 4


def _tile(x, x32, s, b, *, PB, variant):
    """One k-superblock; x [M, PB] bf16, x32 [PB/8, BN] i32, strips [sr, BN]."""
    sr, _ = scale_rows_per_tile(PB, G)
    q4 = PB // 4
    gpp = q4 // G

    # per-group f32 sums of x (used by every correction flavor)
    xs = jnp.concatenate(
        [jnp.sum(x[:, g * G:(g + 1) * G].astype(jnp.float32), axis=1,
                 keepdims=True) for g in range(sr)], axis=1)  # [M, sr]

    def unpack(i):
        y = (x32 >> (4 * i)) if i else x32
        y = (y & 0x000F000F) | 0x43004300
        return pltpu.bitcast(y, jnp.bfloat16)  # [q4, BN]

    acc = [None, None]
    if variant == "pipe":
        wb = unpack(0)
        for i in range(4):
            wb_next = unpack(i + 1) if i < 3 else None
            for g in range(gpp):
                gi = i * gpp + g
                part = jnp.dot(
                    x[:, gi * G:(gi + 1) * G],
                    wb[g * G:(g + 1) * G, :],
                    preferred_element_type=jnp.float32,
                )
                term = (part - 128.0 * xs[:, gi:gi + 1]) * s[gi:gi + 1, :]
                acc[gi % 2] = term if acc[gi % 2] is None else acc[gi % 2] + term
            wb = wb_next
    else:
        for i in range(4):
            wb = unpack(i)
            for g in range(gpp):
                gi = i * gpp + g
                part = jnp.dot(
                    x[:, gi * G:(gi + 1) * G],
                    wb[g * G:(g + 1) * G, :],
                    preferred_element_type=jnp.float32,
                )
                if variant == "epi128":
                    term = (part - 128.0 * xs[:, gi:gi + 1]) * s[gi:gi + 1, :]
                elif variant == "epifull":
                    # b strip plays the role of c = (z+128)*s; f32-exact,
                    # NO correction dot at all
                    term = part * s[gi:gi + 1, :] - xs[:, gi:gi + 1] * b[gi:gi + 1, :]
                else:
                    term = part * s[gi:gi + 1, :]
                acc[gi % 2] = term if acc[gi % 2] is None else acc[gi % 2] + term
    total = acc[0] if acc[1] is None else acc[0] + acc[1]

    if variant == "base":
        corr = jnp.dot(xs, b[:sr, :], preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    elif variant in ("corrdef", "epi128", "pipe"):
        corr = jnp.dot(xs, b[:sr, :], preferred_element_type=jnp.float32)
    elif variant == "epifull":
        corr = None
    else:  # nocorr
        corr = None
    return total - corr if corr is not None else total


def _kernel(layer_ref, x_ref, qw_ref, s_ref, b_ref, o_ref, acc_ref,
            *, PB, k_tiles, variant):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x32 = pltpu.bitcast(qw_ref[0], jnp.int32)
    acc_ref[:] += _tile(x_ref[:], x32, s_ref[0], b_ref[0], PB=PB,
                        variant=variant)

    @pl.when(k == k_tiles - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("K", "N", "PB", "BN", "variant"))
def run(x, qw, s, b, layer, *, K, N, PB, BN, variant):
    k_tiles = K // PB
    _, sr_pad = scale_rows_per_tile(PB, G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, N // BN, k_tiles),
        in_specs=[
            pl.BlockSpec((M, PB), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, PB // 2, BN), lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, BN), lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, BN), lambda m, n, k, lr: (lr[0], k, n)),
        ],
        out_specs=pl.BlockSpec((M, BN), lambda m, n, k, lr: (m, n)),
        scratch_shapes=[pltpu.VMEM((M, BN), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, PB=PB, k_tiles=k_tiles, variant=variant),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(layer, x, qw, s, b)


def main():
    rng = np.random.default_rng(0)
    variants = sys.argv[1:] or ["base", "epi128", "epifull", "pipe"]
    totals = {v: 0.0 for v in variants}
    for name, (K, N, PB, BN) in SHAPES.items():
        kt = K // PB
        _, sr_pad = scale_rows_per_tile(PB, G)
        qw = jnp.asarray(rng.integers(0, 256, (L, K // 2, N)), jnp.uint8)
        s = jnp.asarray(rng.standard_normal((L, kt * sr_pad, N)) * 1e-2,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((L, kt * sr_pad, N)) * 1e-1,
                        jnp.float32)
        x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        for variant in variants:
            def f(xc, qw, s, b, iters, variant=variant, K=K, N=N, PB=PB, BN=BN):
                @functools.partial(jax.jit, static_argnames=("iters",))
                def loop(x, qw, s, b, *, iters):
                    def body(i, xc):
                        y = run(xc, qw, s, b,
                                jnp.asarray(i % L, jnp.int32).reshape(1),
                                K=K, N=N, PB=PB, BN=BN, variant=variant)
                        ff = jnp.tanh(y[:, :K] if N >= K else
                                      jnp.pad(y, ((0, 0), (0, K - N))))
                        return (xc + ff * jnp.asarray(1e-3, xc.dtype)).astype(
                            xc.dtype)
                    return jax.lax.fori_loop(0, iters, body, x)[:8, :128]
                return loop(xc, qw, s, b, iters=iters)

            sec = bench_loop_fn(f, x0, qw, s, b, iters_pair=(2048, 16384))
            gbs = (K * N / 2) / sec / 1e9
            totals[variant] += sec * 1e6
            print(f"{name:8s} {variant:8s} {sec * 1e6:8.1f} us  "
                  f"{gbs:6.0f} GB/s packed", flush=True)
    print("---- layer totals (x32 = per-step ms) ----")
    for v, t in totals.items():
        print(f"{v:8s} {t:8.1f} us/layer  -> {t * 32 / 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
