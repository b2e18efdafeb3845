"""Qwen3 (qk-norm) equivalence vs HF transformers."""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

Q3_CFG = dict(
    architectures=["Qwen3ForCausalLM"],
    vocab_size=512,
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    head_dim=32,
    intermediate_size=448,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
)


def test_qwen3_greedy_matches_hf():
    import torch
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = Qwen3Config(
        **{k: v for k, v in Q3_CFG.items() if k != "architectures"},
        attention_bias=False,
    )
    hf = Qwen3ForCausalLM(hf_cfg).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    mc = ModelConfig(model_path="", hf_config=dict(Q3_CFG))
    sa = ServerArgs(model_path="tiny-q3", page_size=8, max_total_tokens=1024,
                    chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    try:
        rng = np.random.default_rng(0)
        prompt = rng.integers(3, 500, 19).tolist()
        with torch.no_grad():
            ref = hf.generate(
                torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
                eos_token_id=None, pad_token_id=0,
            )[0][len(prompt):].tolist()
        out = eng.generate(
            input_ids=prompt,
            sampling_params={"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True},
        )
        assert out["output_ids"] == ref, (out["output_ids"], ref)
    finally:
        eng.shutdown()
