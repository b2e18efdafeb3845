"""Ablation: dense all-expert vs grouped (megablocks-style) MoE prefill.

64-expert toy config (qwen3-moe-like shapes), chunked-prefill T.  Reports
per-layer MLP ms and the implied FLOPs ratio vs ideal (topk/E of dense).

Usage: python benchmarks/abl_moe_grouped.py [--t 2048] [--e 64] [--k 8]
       [--i 768] [--h 2048] [--quant]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from microbench import bench_loop_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--e", type=int, default=64)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--i", type=int, default=768)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--quant", action="store_true")
    ap.add_argument("--iters", type=int, nargs=2, default=[2, 8])
    args = ap.parse_args()
    T, E, K, I, H = args.t, args.e, args.k, args.i, args.hidden

    from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
    from sglang_awq_tpu.layers.activation import silu_and_mul
    from sglang_awq_tpu.ops.moe_grouped import moe_grouped_mlp
    from sglang_awq_tpu.quantization.awq_config import AWQConfig

    rng = np.random.default_rng(0)
    q = AWQConfig(weight_bits=4, group_size=128) if args.quant else None
    spec_gu = LinearSpec.make("gate_up", H, E * 2 * I, q, "column")
    spec_d = LinearSpec.make("down", E * I, H, q, "row", k_align=I)

    if args.quant:
        from sglang_awq_tpu.ops.awq_matmul import convert_awq_tensor
        from sglang_awq_tpu.quantization.awq_config import pack_awq_reference

        def mk(Kd, Nd, pb=None):
            wq = rng.integers(0, 16, (Kd, Nd)).astype(np.int32)
            zq = rng.integers(0, 16, (Kd // 128, Nd)).astype(np.int32)
            sc = (rng.standard_normal((Kd // 128, Nd)) * 0.02).astype(np.float16)
            qw, st, bf, _ = convert_awq_tensor(
                pack_awq_reference(wq), pack_awq_reference(zq), sc, 128,
                pack_block=pb, unpack="pair")
            return {"qweight": jnp.asarray(qw)[None],
                    "scales": jnp.asarray(st)[None],
                    "zbias": jnp.asarray(bf)[None]}

        p_gu = mk(H, E * 2 * I, spec_gu.pack_block)
        p_d = mk(E * I, H, spec_d.pack_block)
    else:
        p_gu = {"weight": jnp.asarray(
            rng.standard_normal((1, H, E * 2 * I)) * 0.05, jnp.bfloat16)}
        p_d = {"weight": jnp.asarray(
            rng.standard_normal((1, E * I, H)) * 0.05, jnp.bfloat16)}

    x0 = jnp.asarray(rng.standard_normal((T, H)) * 0.3, jnp.bfloat16)
    router = jnp.asarray(rng.standard_normal((H, E)) * 0.1, jnp.bfloat16)

    def route(h2):
        logits = jnp.dot(h2, router, preferred_element_type=jnp.float32)
        topv, topi = jax.lax.top_k(jax.nn.softmax(logits, axis=-1), K)
        return topi, topv / jnp.sum(topv, axis=-1, keepdims=True)

    def dense_mlp(h2):
        topi, topv = route(h2)
        w = jnp.sum(jax.nn.one_hot(topi, E, dtype=topv.dtype)
                    * topv[..., None], axis=1)
        gu = linear_apply(spec_gu, p_gu, h2, 0)
        act = silu_and_mul(gu.reshape(T, E, 2 * I))
        act = (act.astype(jnp.float32) * w[..., None]).astype(gu.dtype)
        return linear_apply(spec_d, p_d, act.reshape(T, E * I), 0)

    def grouped(h2):
        topi, topv = route(h2)
        return moe_grouped_mlp(spec_gu, p_gu, spec_d, p_d, h2, topi, topv, 0,
                               e0=0, n_local=E, inter=I)

    for name, fn in [("grouped", grouped), ("dense", dense_mlp)]:
        @functools.partial(jax.jit, static_argnames=("iters",))
        def loop(x, *, iters, fn=fn):
            def body(i, xc):
                y = fn(xc)
                return (xc + y.astype(xc.dtype)
                        * jnp.asarray(1e-3, xc.dtype)).astype(xc.dtype)
            return jax.lax.fori_loop(0, iters, body, x)[:8, :128]

        try:
            sec = bench_loop_fn(
                lambda x, iters: loop(x, iters=iters), x0,
                iters_pair=tuple(args.iters))
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAILED {repr(e)[:160]}", flush=True)
            continue
        dense_gf = 2 * T * H * E * 2 * I + 2 * T * E * I * H
        ideal_gf = dense_gf * K / E
        print(f"{name:8s} {sec*1e3:8.2f} ms/layer  "
              f"dense-flops {dense_gf/sec/1e12:6.1f} TF/s-equiv  "
              f"(ideal minimum {ideal_gf/1e9:.1f} GF)", flush=True)


if __name__ == "__main__":
    main()
