"""On-chip A/B: whole-stack decode megakernel vs the per-op decode path.

Builds the bench-geometry model (random 8B AWQ llama), checks logits
agreement between the two paths on one step (at a reduced context so two
pool copies + params fit in HBM), then slope-times a multi-step scan of
each at the full bench geometry (donated pool — one copy alive).

Usage: python benchmarks/bench_stack.py [--skip-check] [--variants mega ops]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from microbench import fetch_sync

KVH, D = 8, 128


def make_setup(B, ctx, ps, layers, seed=0, zeros=False):
    rng = np.random.default_rng(seed)
    pages_per_seq = (ctx + 256) // ps
    pages = B * pages_per_seq + 8
    shape = (layers, pages, 2, ps, 2, KVH * D // 2)
    if zeros:
        # timing only cares about DMA traffic, and the PRNG's transient
        # bits buffer (2 bytes/elem u32) OOMs next to 6 GB params
        pool = jnp.zeros(shape, jnp.bfloat16)
    else:
        pool = (
            jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.bfloat16)
            * 0.1
        )
    ptn = rng.permutation(B * pages_per_seq).reshape(B, pages_per_seq)
    ptn = ptn.astype(np.int32)
    lengths = np.full(B, ctx, np.int32)
    positions = lengths - 1
    slots = (
        ptn[np.arange(B), positions // ps] * ps + positions % ps
    ).astype(np.int32)
    tokens = rng.integers(3, 100000, size=B).astype(np.int32)
    return pool, dict(
        tokens=jnp.asarray(tokens),
        positions=jnp.asarray(positions),
        slots=jnp.asarray(slots),
        page_table=jnp.asarray(ptn),
        lengths=jnp.asarray(lengths),
    ), ptn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--ps", type=int, default=64)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--steps", type=int, nargs=2, default=[4, 16])
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--variants", nargs="+", default=["ops", "mega"])
    args = ap.parse_args()

    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.model_loader.loader import load_model

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
    print("building model (random weights)...", flush=True)
    t0 = time.time()
    model, params = load_model(mc, random_weights=True)
    params = jax.device_put(params)
    print(f"  params on device in {time.time() - t0:.1f}s", flush=True)
    rope_tab = model.rope()
    B, PS = args.bs, args.ps

    def one_step(pool, inp, mega):
        os.environ["SGLT_DECODE_MEGA"] = "1" if mega else "0"
        try:
            return model.decode_step(
                params, pool, rope_tab, inp["tokens"], inp["positions"],
                inp["slots"], inp["page_table"], inp["lengths"],
            )
        finally:
            os.environ.pop("SGLT_DECODE_MEGA", None)

    if not args.skip_check:
        ctx_chk = min(args.ctx, 256)
        pool, inp, ptn = make_setup(B, ctx_chk, PS, args.layers)
        slots = np.asarray(inp["slots"])
        print(f"correctness at ctx={ctx_chk}...", flush=True)
        t0 = time.time()
        lo, kvo = one_step(pool, inp, False)
        lo = fetch_sync(lo)
        so = np.stack([
            fetch_sync(kvo[:, int(s) // PS, :, int(s) % PS].astype(jnp.float32))
            for s in slots[:4]
        ])
        del kvo
        print(f"  ops path done in {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        lm, kvm = one_step(pool, inp, True)
        lm = fetch_sync(lm)
        sm = np.stack([
            fetch_sync(kvm[:, int(s) // PS, :, int(s) % PS].astype(jnp.float32))
            for s in slots[:4]
        ])
        del kvm, pool
        print(f"  mega path done in {time.time() - t0:.1f}s", flush=True)
        agree = (lo.argmax(-1) == lm.argmax(-1)).mean()
        ad = np.abs(lm - lo)
        rel = ad.max() / (np.abs(lo).max() + 1e-9)
        print(f"  argmax agreement {agree:.4f}  max|dlogit| {ad.max():.4f} "
              f"(rel {rel:.5f})", flush=True)
        print(f"  written-row max|d| {np.abs(so - sm).max():.5f}", flush=True)

    pool, inp, ptn = make_setup(B, args.ctx, PS, args.layers, zeros=True)
    pt = inp["page_table"]
    rng = np.random.default_rng(42)

    def make_loop(mega):
        os.environ["SGLT_DECODE_MEGA"] = "1" if mega else "0"

        @functools.partial(
            jax.jit, static_argnames=("steps",), donate_argnums=(2,)
        )
        def loop(params, tok0, kv, steps):
            def body(carry, _):
                tok, kv, lens, pos, slots = carry
                logits, kv = model.decode_step(
                    params, kv, rope_tab, tok, pos, slots, pt, lens
                )
                ntok = jnp.argmax(logits, -1).astype(jnp.int32)
                lens = lens + 1
                pos = pos + 1
                slots = pt[jnp.arange(B), pos // PS] * PS + pos % PS
                return (ntok, kv, lens, pos, slots), ntok[0]

            (tok, kv, *_), trace = jax.lax.scan(
                body,
                (tok0, kv, inp["lengths"], inp["positions"], inp["slots"]),
                None, length=steps,
            )
            return jnp.sum(trace) + tok[1], kv

        return loop

    lo_steps, hi_steps = args.steps
    kv_work = pool  # donated through every loop — one copy alive, mutation
    del pool        # is irrelevant to timing
    for variant in args.variants:
        mega = variant == "mega"
        loop = make_loop(mega)
        t0 = time.time()
        out, kv_work = loop(params, inp["tokens"], kv_work, steps=lo_steps)
        fetch_sync(out)
        print(f"{variant}: compile+{lo_steps} steps {time.time() - t0:.1f}s",
              flush=True)
        times = {}
        for it in (lo_steps, hi_steps):
            ts = []
            for t in range(3):
                tk = jnp.asarray(
                    rng.integers(3, 100000, size=B).astype(np.int32)
                )
                t0 = time.perf_counter()
                out, kv_work = loop(params, tk, kv_work, steps=it)
                fetch_sync(out)
                ts.append(time.perf_counter() - t0)
            ts.sort()
            times[it] = ts[1]
        per = (times[hi_steps] - times[lo_steps]) / (hi_steps - lo_steps)
        print(
            f"{variant}: {per * 1e3:.3f} ms/step -> "
            f"{B / per:.0f} tok/s (lo={times[lo_steps]:.3f} hi={times[hi_steps]:.3f})",
            flush=True,
        )
        os.environ.pop("SGLT_DECODE_MEGA", None)


if __name__ == "__main__":
    main()
