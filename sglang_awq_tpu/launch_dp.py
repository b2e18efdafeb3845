"""Data-parallel serving launcher: N engine replicas behind the gateway.

Role model: reference `DataParallelController`
(`python/sglang/srt/managers/data_parallel_controller.py`) — one scheduler
per DP rank with round-robin request dispatch.  TPU-architecture form: DP
replicas are full server PROCESSES (each owns its chips via
--nnodes/--node-rank or per-process device visibility), and the C++
gateway (gateway/csrc) is the dispatch layer: round-robin, health-gated,
with worker add/remove for elastic scaling.

    python -m sglang_awq_tpu.launch_dp --dp-size 2 --port 8080 \
        --model-path <dir> [any launch_server args...]

Ports: replica i serves on base_port + 1 + i; the gateway serves --port.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _child_preexec():
    """Best-effort: kill the replica if this launcher dies (even SIGKILL)."""
    try:
        import ctypes

        PR_SET_PDEATHSIG = 1
        ctypes.CDLL("libc.so.6").prctl(PR_SET_PDEATHSIG, signal.SIGTERM)
    except Exception:  # noqa: BLE001
        pass


def main(argv=None):
    # SIGTERM's default action skips the finally clause below and leaks the
    # replica processes (observed: stranded test servers across CI runs);
    # route it through SystemExit so teardown runs.
    signal.signal(signal.SIGTERM, lambda s, f: sys.exit(0))
    ap = argparse.ArgumentParser()
    ap.add_argument("--dp-size", type=int, required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--worker-base-port", type=int, default=None)
    ap.add_argument("--policy", default="cache_aware",
                    choices=["rr", "p2c", "cache_aware"],
                    help="gateway routing (reference sgl-model-gateway "
                         "policies: cache_aware approximates radix-affinity "
                         "routing with a power-of-two load escape)")
    args, rest = ap.parse_known_args(argv)

    base = args.worker_base_port or (args.port + 1)
    workers = []
    procs = []
    try:
        for i in range(args.dp_size):
            port = base + i
            cmd = [
                sys.executable, "-m", "sglang_awq_tpu.launch_server",
                "--port", str(port),
            ] + rest
            env = dict(os.environ)
            env["SGLT_DP_RANK"] = str(i)
            procs.append(subprocess.Popen(cmd, env=env, preexec_fn=_child_preexec))
            workers.append(f"127.0.0.1:{port}")
            time.sleep(0.2)

        from sglang_awq_tpu.gateway import ensure_binary

        gw = subprocess.Popen(
            [ensure_binary(), "--port", str(args.port),
             "--workers", ",".join(workers),
             "--policy", args.policy],
            preexec_fn=_child_preexec,
        )
        procs.append(gw)
        print(
            f"dp={args.dp_size}: gateway :{args.port} -> {workers}",
            flush=True,
        )
        # supervise: exit when any child dies (systemd-style restart is the
        # operator's policy decision)
        while True:
            for p in procs:
                rc = p.poll()
                if rc is not None:
                    raise SystemExit(f"child {p.args[:3]} exited rc={rc}")
            time.sleep(1.0)
    finally:
        for p in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        deadline = time.time() + 10
        for p in procs:
            try:
                p.wait(timeout=max(deadline - time.time(), 0.1))
            except subprocess.TimeoutExpired:
                p.kill()


if __name__ == "__main__":
    main()
