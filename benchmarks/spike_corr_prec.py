"""A/B the pair-kernel zero-correction numerics (SGLT_AWQ_SUB128).

Benches the PRODUCTION `awq_matmul` (pair fused, in-kernel correction) at
the four Llama-3-8B decode shapes, M=64.  Run twice:

  SGLT_AWQ_SUB128=0 python benchmarks/spike_corr_prec.py   # round-3 numerics
  SGLT_AWQ_SUB128=1 python benchmarks/spike_corr_prec.py   # re-centered

The hypothesis: the HIGHEST (6-pass) correction dot required by the folded
+128*scale bias is a large slice of kernel time; re-centering the weights
in-kernel (1 bf16 sub per quarter-block) lets the correction run 1-pass.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from microbench import bench_loop_fn
from sglang_awq_tpu.layers.linear import LinearSpec, random_awq_weights_np
from sglang_awq_tpu.ops.awq_matmul import awq_matmul
from sglang_awq_tpu.quantization.awq_config import AWQConfig

SHAPES = {
    "qkv": (4096, 6144),
    "o": (4096, 4096),
    "gate_up": (4096, 28672),
    "down": (14336, 4096),
}

M, L = int(os.environ.get("SPIKE_M", "64")), 4


def main():
    rng = np.random.default_rng(0)
    quant = AWQConfig(group_size=128)
    print(f"SGLT_AWQ_SUB128={os.environ.get('SGLT_AWQ_SUB128', '0')}  M={M}")
    total_us = 0.0
    for name, (K, N) in SHAPES.items():
        spec = LinearSpec.make(name, K, N, quant, None)
        p = {k: jnp.asarray(v) for k, v in
             random_awq_weights_np(spec, rng, L).items()}
        x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x, qw, sc, zb, *, iters, spec=spec, K=K, N=N):
            def body(i, xc):
                y = awq_matmul(
                    xc, qw, sc, zb, i % L,
                    group_size=spec.group_size, pack_block=spec.pack_block,
                    unpack=spec.unpack,
                    **({"block_n": spec.block_n} if spec.block_n else {}),
                )
                f = jnp.tanh(y[:, :K] if N >= K else
                             jnp.pad(y, ((0, 0), (0, K - N))))
                return (xc + f * jnp.asarray(1e-3, xc.dtype)).astype(xc.dtype)

            return jax.lax.fori_loop(0, iters, body, x)[:8, :128]

        sec = bench_loop_fn(
            lambda x, qw, sc, zb, iters: loop(x, qw, sc, zb, iters=iters),
            x0, p["qweight"], p["scales"], p["zbias"], iters_pair=(512, 4096),
        )
        gbs = (K * N / 2) / sec / 1e9
        total_us += sec * 1e6
        print(f"{name:8s} pb={spec.pack_block:5d} bn={spec.block_n or 2048:5d} "
              f"{sec * 1e6:8.1f} us  {gbs:6.0f} GB/s packed", flush=True)
    print(f"layer GEMM total {total_us:.1f} us -> x32 = {total_us * 32 / 1e3:.2f} ms")


if __name__ == "__main__":
    main()
