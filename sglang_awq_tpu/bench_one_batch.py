"""Offline one-batch benchmark: prefill + decode latency/throughput.

Role model: reference `python/sglang/bench_one_batch.py` (single static
batch through the engine without the HTTP layer; reports prefill
latency/throughput, median decode latency, overall token throughput).

Usage:
  python -m sglang_awq_tpu.bench_one_batch --model-path <dir> \
      --batch-size 16 --input-len 512 --output-len 64
  python -m sglang_awq_tpu.bench_one_batch --random-8b   # random weights

Prints one JSON line per (batch, input, output) combination.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _bench_cfg():
    return dict(
        architectures=["LlamaForCausalLM"],
        vocab_size=128256, hidden_size=4096, num_hidden_layers=32,
        num_attention_heads=32, num_key_value_heads=8,
        intermediate_size=14336, rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=8192, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
        quantization_config={
            "quant_method": "awq", "bits": 4, "group_size": 128,
            "zero_point": True,
        },
    )


def run_one(engine, bs: int, input_len: int, output_len: int, rng) -> dict:
    vocab = engine.runner.model_config.vocab_size
    prompts = [
        rng.integers(10, min(vocab, 30000), input_len).tolist()
        for _ in range(bs)
    ]
    sp = {"max_new_tokens": output_len, "temperature": 0.0, "ignore_eos": True}

    import threading

    results = [None] * bs
    ttfts = [None] * bs
    t0 = time.perf_counter()

    def run(i):
        first = None
        for chunk in engine.generate(
            input_ids=prompts[i], sampling_params=dict(sp), stream=True
        ):
            if first is None and chunk["output_ids"]:
                first = time.perf_counter()
        ttfts[i] = (first or time.perf_counter()) - t0
        results[i] = chunk

    threads = [threading.Thread(target=run, args=(i,)) for i in range(bs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    total = time.perf_counter() - t0

    out_tokens = sum(r["meta_info"]["completion_tokens"] for r in results)
    prefill_tokens = bs * input_len
    ttft = max(ttfts)  # batch prefill completes when the last row samples
    decode_time = max(total - ttft, 1e-9)
    return {
        "batch_size": bs,
        "input_len": input_len,
        "output_len": output_len,
        "prefill_latency_s": round(ttft, 4),
        "prefill_tok_s": round(prefill_tokens / max(ttft, 1e-9), 1),
        "decode_tok_s": round((out_tokens - bs) / decode_time, 1),
        "total_throughput_tok_s": round(
            (prefill_tokens + out_tokens) / total, 1
        ),
        "total_latency_s": round(total, 4),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--random-8b", action="store_true",
                    help="random-weight Llama-3-8B-AWQ geometry")
    ap.add_argument("--batch-size", type=int, nargs="+", default=[1])
    ap.add_argument("--input-len", type=int, nargs="+", default=[512])
    ap.add_argument("--output-len", type=int, nargs="+", default=[32])
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--max-total-tokens", type=int, default=None)
    ap.add_argument("--tp-size", type=int, default=1)
    args = ap.parse_args(argv)

    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.server_args import ServerArgs

    kw = {}
    if args.random_8b:
        from sglang_awq_tpu.configs.model_config import ModelConfig

        kw["model_config"] = ModelConfig(
            model_path="", hf_config=_bench_cfg(), context_length=8192
        )
        sa = ServerArgs(
            model_path="bench-8b", random_weights=True,
            page_size=args.page_size, tp_size=args.tp_size,
            max_total_tokens=args.max_total_tokens,
            max_running_requests=max(args.batch_size),
        )
        kw["tokenizer"] = None
    else:
        assert args.model_path, "--model-path or --random-8b"
        sa = ServerArgs(
            model_path=args.model_path, page_size=args.page_size,
            tp_size=args.tp_size, max_total_tokens=args.max_total_tokens,
            max_running_requests=max(args.batch_size),
        )
    engine = Engine(server_args=sa, **kw)
    rng = np.random.default_rng(0)
    reports = []
    try:
        for bs in args.batch_size:
            for il in args.input_len:
                for ol in args.output_len:
                    # warmup: SAME geometry (tq/bs buckets key the
                    # executables — a smaller warmup shape leaves the
                    # measured shape cold-compiling)
                    run_one(engine, bs, il, 4, rng)
                    rep = run_one(engine, bs, il, ol, rng)
                    print(json.dumps(rep), flush=True)
                    reports.append(rep)
    finally:
        engine.shutdown()
    return reports


if __name__ == "__main__":
    main()
