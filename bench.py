"""Round benchmark: Llama-3-8B-AWQ decode throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference's CI throughput floor for
Llama-3.1-8B on an H100-class GPU (>3,800 tok/s offline — BASELINE.md).

Measurement notes (see .claude/skills/verify/SKILL.md): the TPU may sit
behind a high-latency relay where only data fetch synchronizes, so decode
runs as on-device multi-step scans and the rate is taken from the SLOPE
between two scan lengths (cancels fixed dispatch latency).

Env knobs:
  SGLT_BENCH_MODEL = llama3-8b (default) | tiny
  SGLT_BENCH_BS    = decode batch size (default 64)
  SGLT_BENCH_CTX   = context tokens per sequence (default 512)
  SGLT_BENCH_PS    = KV page size (default 16)
  SGLT_BENCH_LAYERS= layer count override (default 32; for base/per-layer splits)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


BOOTED = {"v": False}


def main():
    import jax.numpy as _jnp

    # touching the device proves the relay is alive; a wedged relay hangs
    # right here, which the watchdog's early boot check detects
    float(np.asarray(_jnp.zeros(())))
    BOOTED["v"] = True

    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.model_executor.forward_batch import DecodeInput, SamplingRow
    from sglang_awq_tpu.model_executor.model_runner import ModelRunner
    from sglang_awq_tpu.server_args import ServerArgs

    model_kind = os.environ.get("SGLT_BENCH_MODEL", "llama3-8b")
    bs = int(os.environ.get("SGLT_BENCH_BS", "64"))
    ctx = int(os.environ.get("SGLT_BENCH_CTX", "512"))
    ps = int(os.environ.get("SGLT_BENCH_PS", "64"))

    if model_kind == "tiny":
        cfg = dict(
            vocab_size=2048, hidden_size=1024, num_hidden_layers=4,
            num_attention_heads=8, num_key_value_heads=8, intermediate_size=2816,
        )
    else:
        cfg = dict(
            vocab_size=128256, hidden_size=4096,
            num_hidden_layers=int(os.environ.get("SGLT_BENCH_LAYERS", "32")),
            num_attention_heads=32, num_key_value_heads=8, intermediate_size=14336,
        )
    hf_cfg = dict(
        architectures=["LlamaForCausalLM"],
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        max_position_embeddings=4096,
        tie_word_embeddings=False,
        bos_token_id=1,
        eos_token_id=2,
        quantization_config={
            "quant_method": "awq", "bits": 4, "group_size": 128, "zero_point": True,
        },
        **cfg,
    )
    mc = ModelConfig(model_path="", hf_config=hf_cfg, context_length=4096)
    sa = ServerArgs(
        model_path="bench",
        random_weights=True,
        page_size=ps,
        max_running_requests=bs,
        mem_fraction_static=float(os.environ.get("SGLT_BENCH_MEMFRAC", "0.80")),
        kv_cache_dtype=os.environ.get("SGLT_BENCH_KV", "auto"),
        # int8 per-column lm_head is the engine's default serving config
        # for this geometry (halves the ~1 GB/step [H, V] stream; logits
        # within 1e-2, argmax-stable — tests/test_engine.py); override with
        # SGLT_BENCH_LMHEAD=auto for the bf16 head
        lm_head_dtype=os.environ.get("SGLT_BENCH_LMHEAD", "int8"),
    )
    log(f"bench: building {model_kind} runner (bs={bs}, ctx={ctx})...")
    t0 = time.time()
    runner = ModelRunner(sa, model_config=mc)
    log(f"bench: runner up in {time.time()-t0:.1f}s; pool {runner.max_total_tokens} tokens")

    # synthetic steady-state decode batch: bs sequences at ctx tokens.
    # Every timed call restarts at position ctx-1 and advances n_steps, so
    # headroom beyond ctx is one measurement window + one page of slack.
    n_steps_env = int(os.environ.get("SGLT_BENCH_STEPS", "64"))
    pages_per_seq = (ctx + n_steps_env + ps) // ps
    assert bs * pages_per_seq <= runner.num_pages, "KV pool too small for bench"
    rng = np.random.default_rng(0)
    page_table = rng.permutation(bs * pages_per_seq).reshape(bs, pages_per_seq).astype(np.int32)
    lengths = np.full(bs, ctx, np.int32)
    d = DecodeInput(
        tokens=rng.integers(10, 1000, bs).astype(np.int32),
        positions=lengths - 1,
        slots=np.zeros(bs, np.int32),  # unused by decode_multi
        page_table=page_table,
        lengths=lengths,
        sample_steps=np.zeros(bs, np.int32),
        sampling=[SamplingRow() for _ in range(bs)],
    )

    # ONE executable (remote compiles run minutes each through the relay;
    # a second executable for the classic two-point slope doubled the cold
    # bench time).  Slope between 1 call and 3 consecutive calls of the
    # SAME executable cancels per-run Python overhead; the per-call
    # dispatch latency (~45 ms) does not cancel and biases the result
    # CONSERVATIVELY by ~dispatch/(n_steps) per step (<1 ms at 64 steps).
    n_steps = n_steps_env
    log("bench: compiling multi-step decode...")
    t0 = time.time()
    runner.forward_decode_multi(d, n_steps)
    log(f"bench: compile+run {time.time()-t0:.1f}s; measuring...")

    def one_call(trial):
        dd = DecodeInput(
            tokens=((d.tokens + trial) % 1000).astype(np.int32),
            positions=d.positions,
            slots=d.slots,
            page_table=d.page_table,
            lengths=d.lengths,
            sample_steps=d.sample_steps + trial,
            sampling=d.sampling,
        )
        out = runner.forward_decode_multi(dd, n_steps)
        assert out.shape[0] == n_steps

    def timed(calls, trial):
        t0 = time.perf_counter()
        for c in range(calls):
            one_call(trial * 10 + c)
        return time.perf_counter() - t0

    t1 = min(timed(1, t) for t in range(3))
    t3 = min(timed(3, t) for t in range(3, 5))
    per_step = (t3 - t1) / (2 * n_steps)
    tok_s = bs / per_step
    mins = {1: t1, 3: t3}
    lo_steps, hi_steps = 1, 3
    log(
        f"bench: per-step {per_step*1e3:.2f} ms @ bs={bs} -> {tok_s:.0f} tok/s "
        f"(lo={mins[lo_steps]:.3f}s hi={mins[hi_steps]:.3f}s)"
    )

    baseline = 3800.0  # reference CI floor, Llama-3.1-8B, 1x H100-class GPU
    print(
        json.dumps(
            {
                "metric": f"decode_throughput_{model_kind}_awq_bs{bs}_ctx{ctx}_ps{ps}",
                "value": round(tok_s, 1),
                "unit": "tok/s/chip",
                "vs_baseline": round(tok_s / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    # The axon relay can wedge hard (even jnp.arange hangs); make sure the
    # driver still records a parseable line instead of an empty file.
    import threading

    _deadline = float(os.environ.get("SGLT_BENCH_DEADLINE", "1800"))

    def _fail_line(err: str):
        print(
            json.dumps(
                {
                    "metric": "decode_throughput_llama3-8b_awq",
                    "value": 0,
                    "unit": "tok/s/chip",
                    "vs_baseline": 0.0,
                    "error": err,
                }
            ),
            flush=True,
        )

    def _watchdog():
        # early check: backend init takes <60s when the relay is healthy;
        # 300s without a live device means the relay is wedged — report
        # before any external timeout can kill us silently
        time.sleep(min(300.0, _deadline))
        if not BOOTED["v"]:
            _fail_line("TPU backend failed to initialize within 300s "
                       "(relay wedged)")
            os._exit(2)
        time.sleep(max(_deadline - 300.0, 0.0))
        _fail_line(f"bench exceeded {_deadline:.0f}s (TPU relay hang?)")
        os._exit(2)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        main()
    except Exception as e:  # noqa: BLE001
        _fail_line(repr(e)[:300])
        raise SystemExit(1)
