"""Ablate the full decode step (bench.py geometry): where the non-layer
time goes.  Variants build increasingly complete step bodies around the
same lax.scan-over-steps skeleton as ModelRunner._decode_multi_fn:

  layers  - embed-free scan over layers only (bench_layer 'full' + step feed)
  embed   - + token embedding lookup (feeding sampled-ish ids)
  logits  - + final norm + lm_head matmul
  sample  - + greedy sample()
  real    - runner.forward_decode_multi (the shipped path)

Usage: python benchmarks/abl_step.py [--variants ...]
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
    ap.add_argument(
        "--variants", nargs="+",
        default=["layers", "embed", "logits", "sample", "real"],
    )
    ap.add_argument("--ptw", type=int, default=0, help="page table width override")
    args = ap.parse_args()

    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.layers.sampler import sample
    from sglang_awq_tpu.model_executor.forward_batch import DecodeInput, SamplingRow
    from sglang_awq_tpu.model_executor.model_runner import ModelRunner
    from sglang_awq_tpu.server_args import ServerArgs

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

    # match bench.py: +256 tokens of page headroom, bucketed pt width
    pages_per_seq = (CTX + 256) // PS
    if args.ptw:
        pages_per_seq = args.ptw
    rng = np.random.default_rng(0)
    pt = jnp.asarray(
        rng.permutation(B * pages_per_seq).reshape(B, pages_per_seq).astype(np.int32)
    )
    lengths0 = jnp.full((B,), CTX, jnp.int32)
    info = runner.sampling_state  # for rows; use direct SamplingInfo instead
    from sglang_awq_tpu.layers.sampler import SamplingInfo

    sinfo = SamplingInfo(
        temperatures=jnp.zeros(B), top_ps=jnp.ones(B),
        top_ks=jnp.full(B, -1, jnp.int32), min_ps=jnp.zeros(B),
        seeds=jnp.zeros(B, jnp.uint32),
        frequency_penalties=jnp.zeros(B), presence_penalties=jnp.zeros(B),
        repetition_penalties=jnp.ones(B),
        min_new_tokens=jnp.zeros(B, jnp.int32),
    )

    def steps_fn(variant):
        def fn(params, kv, rope_tab, toks0, lens0, n_steps):
            def body(carry, s):
                kv, toks, lens = carry
                live = lens > 0
                pos = jnp.maximum(lens - 1, 0)
                page = pt[jnp.arange(B), pos // PS]
                from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT

                slots = jnp.where(live, page * PS + pos % PS, PAD_SLOT)
                if variant == "layers":
                    x = jnp.zeros((B, c.hidden_size), jnp.bfloat16) + (
                        toks[:, None].astype(jnp.bfloat16) * 1e-4
                    )
                else:
                    x = params["embed"]["weight"][toks]
                use_logits = variant in ("logits", "sample")

                from sglang_awq_tpu.mem_cache.kv_pool import write_kv
                from sglang_awq_tpu.ops.ragged_attention import ragged_decode

                def lbody(inner, l):
                    x, kv = inner

                    def attn(q, k, v, l):
                        st["kv"] = write_kv(st["kv"], k, v, slots, l, mode="decode")
                        out = ragged_decode(
                            q[:, None], st["kv"], pt, lens, l,
                            sm_scale=model.sm_scale,
                        )
                        return out[:, 0]

                    st = {"kv": kv}
                    x2 = model._layer(params, x, l, pos, rope_tab, attn)
                    return (x2, st["kv"]), None

                (x, kv), _ = jax.lax.scan(lbody, (x, kv), jnp.arange(L))
                if use_logits:
                    logits = model._logits(params, x)
                    if variant == "sample":
                        ids = sample(logits, sinfo, s, all_greedy=True)
                    else:
                        ids = jnp.argmin(
                            jnp.abs(logits[:, 0] - 0.5).astype(jnp.float32)
                        ).astype(jnp.int32) + jnp.zeros(B, jnp.int32)
                else:
                    ids = (jnp.sum(x.astype(jnp.float32), axis=-1) * 1e3).astype(
                        jnp.int32
                    ) % 1000
                lens = jnp.where(live, lens + 1, lens)
                return (kv, ids, lens), ids[:1]

            (kv, _, _), outs = jax.lax.scan(
                body, (kv, toks0, lens0), jnp.arange(n_steps)
            )
            return jnp.sum(outs), kv

        return jax.jit(fn, static_argnums=(5,), donate_argnums=(1,))

    lo, hi = args.steps
    for variant in args.variants:
        if variant == "real":
            d = DecodeInput(
                tokens=np.arange(B).astype(np.int32) + 10,
                positions=np.asarray(lengths0) - 1,
                slots=np.zeros(B, np.int32),
                page_table=np.asarray(pt),
                lengths=np.asarray(lengths0),
                sample_steps=np.zeros(B, np.int32),
                sampling=[SamplingRow() for _ in range(B)],
            )
            mins = {}
            for n in (lo, hi):
                runner.forward_decode_multi(d, n)
                ts = []
                for t in range(3):
                    dd = DecodeInput(
                        tokens=((d.tokens + t) % 1000).astype(np.int32),
                        positions=d.positions, slots=d.slots,
                        page_table=d.page_table, lengths=d.lengths,
                        sample_steps=d.sample_steps + t, sampling=d.sampling,
                    )
                    t0 = time.perf_counter()
                    out = runner.forward_decode_multi(dd, n)
                    ts.append(time.perf_counter() - t0)
                mins[n] = min(ts)
        else:
            jfn = steps_fn(variant)
            toks0 = jnp.arange(B, dtype=jnp.int32) + 10
            mins = {}
            for n in (lo, hi):
                out, runner.kv_cache = jfn(
                    runner.params, runner.kv_cache, runner.rope_tab, toks0,
                    lengths0, n,
                )
                fetch_sync(out)
                ts = []
                for t in range(3):
                    tv = (toks0 + t) % 1000
                    t0 = time.perf_counter()
                    out, runner.kv_cache = jfn(
                        runner.params, runner.kv_cache, runner.rope_tab, tv,
                        lengths0, n,
                    )
                    fetch_sync(out)
                    ts.append(time.perf_counter() - t0)
                mins[n] = min(ts)
        per_step = (mins[hi] - mins[lo]) / (hi - lo)
        print(
            f"{variant}: {per_step*1e3:.3f} ms/step "
            f"(lo={mins[lo]:.3f} hi={mins[hi]:.3f})",
            flush=True,
        )


if __name__ == "__main__":
    main()


