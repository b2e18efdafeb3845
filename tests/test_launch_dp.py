"""DP launcher: N server replicas behind the gateway (reference
DataParallelController role in process form)."""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import httpx
import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_dp2_round_robin(tmp_path):
    from safetensors.numpy import save_file

    # synthetic checkpoint on disk (zero egress)
    _, tensors = tiny_hf_model_and_tensors()
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              os.path.join(ckpt, "model.safetensors"))
    ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG)).save(ckpt)

    gport = _free_port()
    wbase = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env["SGLT_TEST_MODE"] = "1"
    env["SGLT_PLATFORM"] = "cpu"
    env["HF_HUB_OFFLINE"] = "1"
    env["TRANSFORMERS_OFFLINE"] = "1"
    proc = subprocess.Popen(
        [sys.executable, "-m", "sglang_awq_tpu.launch_dp",
         "--dp-size", "2", "--port", str(gport),
         "--worker-base-port", str(wbase),
         "--model-path", ckpt, "--page-size", "8",
         "--max-total-tokens", "1024", "--skip-server-warmup"],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    base = f"http://127.0.0.1:{gport}"
    try:
        ok = False
        for _ in range(240):  # two engine boots
            try:
                w = httpx.get(base + "/gateway/workers", timeout=2).json()
                if len(w["workers"]) == 2 and all(x["up"] for x in w["workers"]):
                    # workers up-state flips only after real /health passes
                    r = httpx.post(
                        base + "/generate",
                        json={"input_ids": [5, 6, 7],
                              "sampling_params": {"max_new_tokens": 2,
                                                  "temperature": 0.0,
                                                  "ignore_eos": True}},
                        timeout=120,
                    )
                    if r.status_code == 200:
                        ok = True
                        break
            except Exception:
                pass
            time.sleep(1)
        assert ok, "dp stack never became ready"
        for _ in range(5):
            r = httpx.post(
                base + "/generate",
                json={"input_ids": [9, 10, 11],
                      "sampling_params": {"max_new_tokens": 2,
                                          "temperature": 0.0,
                                          "ignore_eos": True}},
                timeout=120,
            )
            assert r.status_code == 200
            assert len(r.json()["output_ids"]) == 2
        w = httpx.get(base + "/gateway/workers", timeout=5).json()["workers"]
        served = sorted(x["served"] for x in w)
        assert sum(served) >= 6
        assert served[0] >= 1, served  # both replicas took traffic
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
