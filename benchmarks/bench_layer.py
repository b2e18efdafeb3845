"""Decompose the decode step: per-layer cost of attention-path vs gemm-path.

Builds the bench ModelRunner (random AWQ 8B weights), then slope-times
three scan-over-layers variants at the bench decode geometry:

  gemm : norms + qkv/o/gate_up/down linears only (no attention, no writes)
  attn : rope + write_kv + ragged_decode + residual only (no linears)
  full : the real _layer

Usage: python benchmarks/bench_layer.py [--variants gemm attn full]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from microbench import fetch_sync


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--ps", type=int, default=64)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, nargs=2, default=[4, 16])
    ap.add_argument("--variants", nargs="+", default=["gemm", "attn", "full"])
    args = ap.parse_args()

    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.model_executor.model_runner import ModelRunner
    from sglang_awq_tpu.server_args import ServerArgs
    from sglang_awq_tpu.layers.linear import linear_apply, mlp_apply
    from sglang_awq_tpu.layers.norm import rms_norm
    from sglang_awq_tpu.layers.activation import silu_and_mul
    from sglang_awq_tpu.layers.rotary import apply_rope
    from sglang_awq_tpu.mem_cache.kv_pool import write_kv
    from sglang_awq_tpu.ops.ragged_attention import ragged_decode

    hf_cfg = dict(
        architectures=["LlamaForCausalLM"],
        vocab_size=128256, hidden_size=4096,
        num_hidden_layers=args.layers,
        num_attention_heads=32, num_key_value_heads=8, intermediate_size=14336,
        rms_norm_eps=1e-5, rope_theta=500000.0, max_position_embeddings=4096,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        quantization_config={
            "quant_method": "awq", "bits": 4, "group_size": 128,
            "zero_point": True,
        },
    )
    mc = ModelConfig(model_path="", hf_config=hf_cfg, context_length=4096)
    sa = ServerArgs(
        model_path="bench", random_weights=True, page_size=args.ps,
        max_running_requests=args.bs, mem_fraction_static=0.80,
    )
    print("building runner...", flush=True)
    runner = ModelRunner(sa, model_config=mc)
    model = runner.model
    c = model.config
    B, CTX, PS = args.bs, args.ctx, args.ps
    L = args.layers
    D = model.head_dim

    pages_per_seq = (CTX + PS - 1) // PS
    rng = np.random.default_rng(0)
    pt = jnp.asarray(
        rng.permutation(B * pages_per_seq).reshape(B, pages_per_seq).astype(np.int32)
    )
    lengths = jnp.full((B,), CTX, jnp.int32)
    positions = lengths - 1
    page = pt[jnp.arange(B), positions // PS]
    slots = page * PS + positions % PS

    def layer_fn(variant):
        lp_specs = model.specs

        def one_layer(params, kv, rope_tab, x, l):
            lp = params["layers"]
            if variant in ("gemm", "full"):
                h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
                qkv = linear_apply(lp_specs["qkv"], lp["qkv"], h, l)
                q, k, v = jnp.split(
                    qkv, [model.qh * D, (model.qh + model.kvh) * D], axis=-1
                )
                q = q.reshape(B, model.qh, D)
                k = k.reshape(B, model.kvh, D)
                v = v.reshape(B, model.kvh, D)
            else:
                h = x
                q = jnp.zeros((B, model.qh, D), jnp.bfloat16) + h[:, None, :D]
                k = jnp.zeros((B, model.kvh, D), jnp.bfloat16) + h[:, None, :D]
                v = k
            if variant == "attnpal":
                qg = jnp.zeros((B, model.kvh, 8, D), jnp.bfloat16) + h[:, None, None, :D]
                attn = ragged_decode(
                    qg, kv, pt, lengths, l, sm_scale=model.sm_scale,
                    raw_layout=True,
                )
                x = x + attn.reshape(B, -1)[:, : c.hidden_size].astype(x.dtype) * 1e-3
                return kv, x
            if variant in ("attn", "full", "attnraw", "kvw", "rope"):
                if variant in ("attn", "full", "rope"):
                    q, k = apply_rope(q, k, positions, rope_tab)
                if variant in ("attn", "full", "kvw"):
                    kv = write_kv(kv, k, v, slots, l, mode="decode")
                if variant in ("attn", "full", "attnraw"):
                    attn = ragged_decode(
                        q[:, None], kv, pt, lengths, l, sm_scale=model.sm_scale
                    )[:, 0]
                    attn = attn.reshape(B, model.qh * D).astype(jnp.bfloat16)
                else:
                    attn = q.reshape(B, model.qh * D)
            else:
                attn = q.reshape(B, model.qh * D)
            if variant in ("gemm", "full"):
                o = linear_apply(lp_specs["o"], lp["o"], attn, l)
                x = x + o
                h2 = rms_norm(x, lp["post_norm"][l], c.rms_norm_eps)
                d = mlp_apply(
                    lp_specs["gate_up"], lp["gate_up"],
                    lp_specs["down"], lp["down"], h2, l,
                )
                x = x + d
            else:
                x = x + attn.astype(x.dtype) * 1e-3
            return kv, x

        return one_layer

    for variant in args.variants:
        one_layer = layer_fn(variant)

        def steps_fn(params, kv, rope_tab, x0, n_steps):
            def body(carry, s):
                x, kv = carry

                def lbody(inner, l):
                    x, kv = inner
                    kv, x = one_layer(params, kv, rope_tab, x, l)
                    return (x, kv), None

                (x, kv), _ = jax.lax.scan(
                    lbody, (x, kv), jnp.arange(L)
                )
                # small data dependence between steps
                x = x * (1.0 + 1e-6 * s)
                return (x, kv), x[0, :1]

            (x, kv), outs = jax.lax.scan(body, (x0, kv), jnp.arange(n_steps))
            return jnp.sum(outs.astype(jnp.float32)), kv

        jfn = jax.jit(steps_fn, static_argnums=(4,), donate_argnums=(1,))

        x0 = jnp.ones((B, c.hidden_size), jnp.bfloat16) * 0.01
        lo, hi = args.steps
        mins = {}
        for n in (lo, hi):
            out, runner.kv_cache = jfn(
                runner.params, runner.kv_cache, runner.rope_tab, x0, n
            )
            fetch_sync(out)  # compile+warm
            ts = []
            for t in range(3):
                xv = x0 * (1.0 + 1e-3 * t)
                t0 = time.perf_counter()
                out, runner.kv_cache = jfn(
                    runner.params, runner.kv_cache, runner.rope_tab, xv, n
                )
                fetch_sync(out)
                ts.append(time.perf_counter() - t0)
            mins[n] = min(ts)
        per_step = (mins[hi] - mins[lo]) / (hi - lo)
        print(
            f"{variant}: {per_step*1e3:.3f} ms/step over {L} layers = "
            f"{per_step*1e3/L:.4f} ms/layer (lo={mins[lo]:.3f} hi={mins[hi]:.3f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
