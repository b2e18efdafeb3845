"""Pure-MXU M-scaling law probe (no DMA in the timed loop).

Question the round-3 numbers left open: at decode batch (M=64), is the AWQ
kernel's remaining 2x-over-DMA-floor time an MXU *law* (each 128x128 weight
tile costs max(M, ~128) cycles, i.e. M=64 wastes half the array) or a
schedule artifact (VPU unpack serializing with the dots)?

Method: weights [K, N] bf16 stay VMEM-resident across the whole grid (every
grid step maps to block (0, 0) -> Mosaic keeps them in VMEM, no HBM traffic
after step 0); each step does acc += (x * f(step)) @ w.  Time/step ->
effective TF/s at each M.  If TF/s(64) ~= TF/s(128)/1 the MXU streams M rows
at full rate and the AWQ gap is schedule; if TF/s(64) ~= half of TF/s(128),
the M=64 law is real and the fix must reduce MXU passes (or raise M).

Variants:
  one   single [M, K] @ [K, N] dot per step
  grp   per-group dots ([M, G] @ [G, N] x K/G) + f32 scale epilogue, the AWQ
        kernel's dot structure without the unpack

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/spike_mxu_m.py
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from microbench import bench_matmul_like  # noqa: E402

K, N = 4096, 4096
G = 128
NSTEPS = 64


def _kernel(x_ref, w_ref, s_ref, o_ref, *, variant, nsteps):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    # cheap per-step perturbation so no two grid steps compute the same dot
    pert = 1.0 + k.astype(jnp.float32) * 1e-6
    x = (x_ref[:].astype(jnp.float32) * pert).astype(jnp.bfloat16)
    if variant == "one":
        o_ref[:] += jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    else:  # grp: AWQ dot structure (per-group K=G dots + scale epilogue)
        acc = [None, None]
        for g in range(K // G):
            part = jnp.dot(
                x[:, g * G : (g + 1) * G],
                w_ref[g * G : (g + 1) * G, :],
                preferred_element_type=jnp.float32,
            )
            term = part * s_ref[g : g + 1, :]
            j = g % 2
            acc[j] = term if acc[j] is None else acc[j] + term
        o_ref[:] += acc[0] + acc[1]


@functools.partial(jax.jit, static_argnames=("variant",))
def run(x, w, s, *, variant):
    m = x.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, variant=variant, nsteps=NSTEPS),
        grid=(NSTEPS,),
        in_specs=[
            pl.BlockSpec((m, K), lambda k: (0, 0)),
            pl.BlockSpec((K, N), lambda k: (0, 0)),
            pl.BlockSpec((K // G, N), lambda k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m, N), lambda k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((m, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, w, s)


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((K // G, N)) * 1e-2, jnp.float32)
    for variant in sys.argv[1:] or ["one", "grp"]:
        for m in (8, 64, 128, 256):
            x0 = jnp.asarray(rng.standard_normal((m, K)) * 0.1, jnp.bfloat16)

            def f(xc, i, w, s, variant=variant):
                return run(xc, w, s, variant=variant)[:, :K]

            t = bench_matmul_like(f, x0, w, s, iters_pair=(2, 16))
            per_step = t / NSTEPS
            tf = 2 * m * K * N / per_step / 1e12
            print(
                f"{variant:4s} M={m:3d}  {per_step * 1e6:8.2f} us/step  "
                f"{tf:6.1f} TF/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
