"""Multi-host lockstep serving: 2-process CPU-mesh integration.

Reference role: multi-node launch (`engine.py:116-137`) — rank 0 serves,
rank 1 executes mirrored steps.  Here each process gets 4 virtual CPU
devices; the tp=8 mesh spans both, so every forward's collectives REQUIRE
both processes to be in lockstep (a divergence deadlocks, a missed mirror
corrupts rank 0's psums).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER_SRC = r"""
import os, sys, json
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["HF_HUB_OFFLINE"] = "1"; os.environ["TRANSFORMERS_OFFLINE"] = "1"
os.environ["SGLT_TEST_MODE"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch
from transformers import LlamaConfig, LlamaForCausalLM

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

CFG = dict(
    architectures=["LlamaForCausalLM"], vocab_size=512, hidden_size=256,
    num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
    intermediate_size=448, rms_norm_eps=1e-5, rope_theta=10000.0,
    max_position_embeddings=256, tie_word_embeddings=False,
    bos_token_id=1, eos_token_id=2,
)
torch.manual_seed(0)
hf = LlamaForCausalLM(
    LlamaConfig(**{k: v for k, v in CFG.items() if k != "architectures"})
).eval()
tensors = _torch_state_dict_to_np(hf.state_dict())
mc = ModelConfig(model_path="", hf_config=dict(CFG))
sa = ServerArgs(
    model_path="tiny", page_size=8, max_total_tokens=1024,
    chunked_prefill_size=32, max_running_requests=4, tp_size=8,
    watchdog_timeout=120, nnodes=2, node_rank=rank,
    dist_init_addr=f"127.0.0.1:{port}",
)
eng = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
# rank 1 never reaches here (worker_loop exits the process at shutdown)
prompt = list(range(7, 30))
out = eng.generate(
    input_ids=prompt,
    sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                     "ignore_eos": True},
)
print("RESULT " + json.dumps(out["output_ids"]), flush=True)
eng.shutdown()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


@pytest.mark.slow
def test_two_process_lockstep_serving(tmp_path):
    script = tmp_path / "mh_worker.py"
    script.write_text(WORKER_SRC)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # The worker runs script-by-path, which puts the script dir (tmp), not
    # cwd, on sys.path — the package must be injected explicitly.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(r), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        )
        for r in (0, 1)
    ]
    try:
        out0, _ = procs[0].communicate(timeout=600)
        out1, _ = procs[1].communicate(timeout=120)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise
    line = [ln for ln in out0.splitlines() if ln.startswith("RESULT ")]
    assert line, f"rank0 produced no result:\n{out0[-3000:]}\n--- rank1:\n{out1[-2000:]}"
    got = json.loads(line[0][len("RESULT "):])
    assert procs[0].returncode == 0, out0[-2000:]
    assert procs[1].returncode == 0, out1[-2000:]

    # reference: the same model single-process (8 local devices, same mesh)
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
    from sglang_awq_tpu.server_args import ServerArgs

    CFG = dict(
        architectures=["LlamaForCausalLM"], vocab_size=512, hidden_size=256,
        num_hidden_layers=2, num_attention_heads=8, num_key_value_heads=8,
        intermediate_size=448, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(
        LlamaConfig(**{k: v for k, v in CFG.items() if k != "architectures"})
    ).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    sa = ServerArgs(
        model_path="tiny", page_size=8, max_total_tokens=1024,
        chunked_prefill_size=32, max_running_requests=4, tp_size=8,
        watchdog_timeout=120,
    )
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        ref = eng.generate(
            input_ids=list(range(7, 30)),
            sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()
    assert got == ref, (got, ref)
