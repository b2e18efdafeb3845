"""Online serving benchmark.

Role model: reference `python/sglang/bench_serving.py` (metric definitions
`:98-99,885`: per-request TTFT, per-token ITL, output throughput, percentile
aggregation).  Drives a RUNNING server's /generate streaming endpoint with a
Poisson (or infinite-rate) arrival process of synthetic prompts.

    python -m sglang_awq_tpu.bench_serving --base-url http://127.0.0.1:30000 \
        --num-prompts 200 --request-rate 4 --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import sys
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class ReqResult:
    prompt_len: int
    output_len: int = 0
    ttft: float = 0.0
    itls: List[float] = field(default_factory=list)
    e2e: float = 0.0
    ok: bool = False
    error: str = ""


async def run_one(session, base_url, input_ids, output_len, result: ReqResult):
    payload = {
        "input_ids": input_ids,
        "stream": True,
        "sampling_params": {
            "max_new_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        },
    }
    t0 = time.perf_counter()
    last = t0
    ntokens = 0
    try:
        async with session.post(f"{base_url}/generate", json=payload) as resp:
            if resp.status != 200:
                result.error = f"http {resp.status}"
                return
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data:"):
                    continue
                if line == "data: [DONE]":
                    break
                now = time.perf_counter()
                chunk = json.loads(line[5:])
                new = chunk["meta_info"]["completion_tokens"] - ntokens
                if new <= 0:
                    continue
                if ntokens == 0:
                    result.ttft = now - t0
                else:
                    result.itls.extend([(now - last) / new] * new)
                ntokens = chunk["meta_info"]["completion_tokens"]
                last = now
        result.output_len = ntokens
        result.e2e = time.perf_counter() - t0
        result.ok = ntokens > 0
    except Exception as e:  # noqa: BLE001
        result.error = str(e)


async def run_bench(args):
    rng = random.Random(args.seed)
    prompts = []
    for _ in range(args.num_prompts):
        n = args.input_len
        if args.random_range > 0:
            n = max(4, int(n * rng.uniform(1 - args.random_range, 1 + args.random_range)))
        prompts.append(
            [rng.randrange(10, args.max_token_id) for _ in range(n)])

    results = [ReqResult(prompt_len=len(p)) for p in prompts]
    conn = aiohttp.TCPConnector(limit=0)
    timeout = aiohttp.ClientTimeout(total=args.timeout)
    t_start = time.perf_counter()
    async with aiohttp.ClientSession(connector=conn, timeout=timeout) as session:
        tasks = []
        for p, r in zip(prompts, results):
            tasks.append(
                asyncio.create_task(run_one(session, args.base_url, p, args.output_len, r))
            )
            if args.request_rate > 0:
                await asyncio.sleep(rng.expovariate(args.request_rate))
        await asyncio.gather(*tasks)
    wall = time.perf_counter() - t_start

    done = [r for r in results if r.ok]
    fail = [r for r in results if not r.ok]
    if not done:
        print(json.dumps({"error": "all requests failed", "example": fail[0].error}))
        return

    def pct(vals, q):
        return float(np.percentile(vals, q)) if vals else 0.0

    ttfts = [r.ttft for r in done]
    itls = [i for r in done for i in r.itls]
    e2es = [r.e2e for r in done]
    total_out = sum(r.output_len for r in done)
    total_in = sum(r.prompt_len for r in done)
    report = {
        "completed": len(done),
        "failed": len(fail),
        "duration_s": round(wall, 2),
        "total_input_tokens": total_in,
        "total_output_tokens": total_out,
        "request_throughput_rps": round(len(done) / wall, 3),
        "input_throughput_tok_s": round(total_in / wall, 1),
        "output_throughput_tok_s": round(total_out / wall, 1),
        "ttft_ms": {"mean": round(1e3 * np.mean(ttfts), 1),
                    "p50": round(1e3 * pct(ttfts, 50), 1),
                    "p99": round(1e3 * pct(ttfts, 99), 1)},
        "itl_ms": {"mean": round(1e3 * np.mean(itls), 2) if itls else None,
                   "p50": round(1e3 * pct(itls, 50), 2),
                   "p99": round(1e3 * pct(itls, 99), 2)},
        "e2e_ms": {"p50": round(1e3 * pct(e2es, 50), 1),
                   "p99": round(1e3 * pct(e2es, 99), 1)},
    }
    if args.ttft_breakdown:
        # per-stage TTFT attribution from the server's request traces
        # (reference TimeStats role, srt/metrics/collector.py:43; needs the
        # server launched with --enable-trace)
        try:
            async with aiohttp.ClientSession(connector=aiohttp.TCPConnector()) as s2:
                async with s2.get(
                    f"{args.base_url}/get_trace?n={args.num_prompts}"
                ) as resp:
                    traces = (await resp.json()).get("traces", [])
            stages: dict = {}
            for tr in traces:
                for sl in tr.get("slices", []):
                    if sl["name"] in ("tokenize", "queue", "prefill"):
                        stages.setdefault(sl["name"], []).append(
                            sl["duration_ms"])
            report["ttft_breakdown_ms"] = {
                name: {
                    "p50": round(pct(vals, 50), 1),
                    "p99": round(pct(vals, 99), 1),
                }
                for name, vals in stages.items()
            }
            if stages and ttfts:
                attributed = sum(
                    pct(v, 50) for v in stages.values()
                )
                report["ttft_breakdown_ms"]["other_p50"] = round(
                    max(1e3 * pct(ttfts, 50) - attributed, 0.0), 1
                )  # client RTT + dispatch + detok + SSE
        except Exception as e:  # trace endpoint off -> note, not failure
            report["ttft_breakdown_ms"] = {"error": str(e)}
    print(json.dumps(report, indent=2))
    return report


def main(argv: Optional[List[str]] = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--num-prompts", type=int, default=100)
    ap.add_argument("--request-rate", type=float, default=0.0, help="req/s Poisson; 0 = all at once")
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--random-range", type=float, default=0.25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=3600)
    ap.add_argument("--max-token-id", type=int, default=28000)
    ap.add_argument(
        "--ttft-breakdown", action="store_true",
        help="attribute TTFT per stage from /get_trace "
             "(server must run with --enable-trace)",
    )
    args = ap.parse_args(argv)
    return asyncio.run(run_bench(args))


if __name__ == "__main__":
    main()
