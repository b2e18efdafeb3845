"""Capture a device trace of the bench decode step and aggregate op times.

Builds the bench runner (same geometry as bench.py), runs the multi-step
decode under jax.profiler.trace, then parses the xplane protobuf with the
tensorboard profile plugin to print per-op-category device time — the
ground truth for where the 17 ms step actually goes.

Usage: python benchmarks/profile_step.py [--steps 8] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_runner(bs=64, ctx=512, ps=64, layers=32):
    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.model_executor.model_runner import ModelRunner
    from sglang_awq_tpu.server_args import ServerArgs

    hf_cfg = dict(
        architectures=["LlamaForCausalLM"],
        vocab_size=128256, hidden_size=4096, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=8,
        intermediate_size=14336,
        rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=4096,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        quantization_config={
            "quant_method": "awq", "bits": 4, "group_size": 128,
            "zero_point": True,
        },
    )
    mc = ModelConfig(model_path="", hf_config=hf_cfg, context_length=4096)
    sa = ServerArgs(
        model_path="bench", random_weights=True, page_size=ps,
        max_running_requests=bs, mem_fraction_static=0.80,
        lm_head_dtype="int8",
    )
    return ModelRunner(sa, model_config=mc)


def decode_input(runner, bs=64, ctx=512, ps=64, n_steps=8):
    from sglang_awq_tpu.model_executor.forward_batch import (
        DecodeInput, SamplingRow)

    pages_per_seq = (ctx + n_steps + ps) // ps
    rng = np.random.default_rng(0)
    pt = rng.permutation(bs * pages_per_seq).reshape(
        bs, pages_per_seq).astype(np.int32)
    lengths = np.full(bs, ctx, np.int32)
    return DecodeInput(
        tokens=rng.integers(10, 1000, bs).astype(np.int32),
        positions=lengths - 1,
        slots=np.zeros(bs, np.int32),
        page_table=pt,
        lengths=lengths,
        sample_steps=np.zeros(bs, np.int32),
        sampling=[SamplingRow() for _ in range(bs)],
    )


def parse_xplane(logdir, n_steps, top=40):
    from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())

    for plane in xs.planes:
        if "TPU" not in plane.name or "device" in plane.name.lower():
            pass
        # aggregate every event on TPU planes
    agg = defaultdict(float)
    count = defaultdict(int)
    total_span = 0.0
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU:0"):
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        lo, hi = None, None
        for line in plane.lines:
            lname = line.name
            if "XLA Ops" not in lname and "Ops" != lname:
                continue
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e6  # us
                agg[name] += dur
                count[name] += 1
                t0 = line.timestamp_ns * 1e3 + ev.offset_ps / 1.0
                if lo is None or t0 < lo:
                    lo = t0
                t1 = t0 + ev.duration_ps
                if hi is None or t1 > hi:
                    hi = t1
        if lo is not None:
            total_span = max(total_span, (hi - lo) / 1e6)
    busy = sum(agg.values())
    print(f"device span {total_span/1e3:.3f} ms; busy {busy/1e3:.3f} ms; "
          f"idle {(total_span-busy)/1e3:.3f} ms "
          f"({n_steps} steps -> {total_span/1e3/n_steps:.3f} ms/step span)")

    # bucket by op family
    def bucket(name):
        n = name.lower()
        for pat, lab in [
            (r"awq|pair", "awq_gemm"),
            (r"decode_kernel|ragged", "attention"),
            (r"mlp", "mlp_fused"),
            (r"write_kv|kv_write", "kv_write"),
            (r"fusion", "xla_fusion"),
            (r"copy|bitcast|transpose|reshape", "copy/relayout"),
            (r"dot|conv", "xla_dot"),
            (r"dynamic", "dynamic_slice"),
            (r"custom-call", "custom_call"),
        ]:
            if re.search(pat, n):
                return lab
        return "other"

    byb = defaultdict(float)
    for k, v in agg.items():
        byb[bucket(k)] += v
    print("\n-- by bucket (us total, per-step) --")
    for k, v in sorted(byb.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} {v:10.0f} us  {v/n_steps:8.1f} us/step")

    print(f"\n-- top {top} ops --")
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    for k, v in rows:
        print(f"  {v/n_steps:9.1f} us/step  x{count[k]:5d}  {k[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default="/tmp/sglt_prof")
    args = ap.parse_args()

    import jax

    runner = build_runner()
    d = decode_input(runner, n_steps=args.steps)
    print("compiling...", flush=True)
    runner.forward_decode_multi(d, args.steps)  # warm
    runner.forward_decode_multi(d, args.steps)

    os.makedirs(args.logdir, exist_ok=True)
    with jax.profiler.trace(args.logdir):
        out = runner.forward_decode_multi(d, args.steps)
        np.asarray(out)

    parse_xplane(args.logdir, args.steps, args.top)


if __name__ == "__main__":
    main()
