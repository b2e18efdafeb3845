"""Weight hot-swap (reference update_weights_from_disk / from_tensor)."""

import os

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors


def save_safetensors(tensors, path):
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in tensors.items()},
              os.path.join(path, "model.safetensors"))


def test_update_weights_from_disk(tmp_path_factory):
    _, t0 = tiny_hf_model_and_tensors(seed=0)
    _, t1 = tiny_hf_model_and_tensors(seed=1)
    d1 = str(tmp_path_factory.mktemp("ckpt1"))
    save_safetensors(t1, d1)

    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=t0, tokenizer=None)
    try:
        prompt = list(range(5, 20))
        sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
        before = eng.generate(input_ids=prompt, sampling_params=dict(sp))["output_ids"]

        ok, msg = eng.update_weights_from_disk(d1)
        assert ok, msg
        after = eng.generate(input_ids=prompt, sampling_params=dict(sp))["output_ids"]
        assert after != before  # different weights -> different greedy tokens

        # bad path -> clean failure, engine still serves
        ok2, msg2 = eng.update_weights_from_disk("/nonexistent/path")
        assert not ok2 and msg2
        again = eng.generate(input_ids=prompt, sampling_params=dict(sp))["output_ids"]
        assert again == after
    finally:
        eng.shutdown()


def test_native_snapshot_roundtrip(tmp_path):
    """save_snapshot -> perturb weights -> update_weights_from_disk
    (native manifest auto-detected) restores bit-identical behavior."""
    import numpy as np

    from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors
    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
    from sglang_awq_tpu.server_args import ServerArgs

    hf, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(model_path="tiny", page_size=8, max_total_tokens=1024,
                    max_running_requests=4)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        prompt = list(range(9, 27))
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        before = eng.generate(input_ids=prompt,
                              sampling_params=dict(sp))["output_ids"]

        snap = str(tmp_path / "snap")
        ok, msg = eng.save_weights_snapshot(snap)
        assert ok, msg
        import glob

        assert glob.glob(snap + "/*.safetensors")

        # hot-swap PERTURBED weights -> outputs change
        import torch

        with torch.no_grad():
            sd = hf.state_dict()
            sd["lm_head.weight"] += torch.randn_like(sd["lm_head.weight"])
        eng.runner.update_weights_from_tensors(_torch_state_dict_to_np(sd))
        mid = eng.generate(input_ids=prompt,
                           sampling_params=dict(sp))["output_ids"]
        assert mid != before

        # restore from the native snapshot via the generic disk path
        ok, msg = eng.update_weights_from_disk(snap)
        assert ok, msg
        after = eng.generate(input_ids=prompt,
                             sampling_params=dict(sp))["output_ids"]
        assert after == before
    finally:
        eng.shutdown()
