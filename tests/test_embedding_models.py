"""Embedding & reward model heads vs HF.

Reference role: `python/sglang/srt/models/llama_embedding.py` (last-token
pooled hidden) and `srt/models/qwen2_rm.py` (score head).
"""

import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.managers.tokenizer_manager import GenerateReqInput
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

CFG = dict(
    vocab_size=256, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    max_position_embeddings=128, rms_norm_eps=1e-5,
    rope_theta=10000.0, bos_token_id=1, eos_token_id=2,
    tie_word_embeddings=False,
)


def _embed_via_engine(eng, ids):
    gin = GenerateReqInput(input_ids=ids, is_embedding=True,
                           sampling_params={"max_new_tokens": 0})
    state = eng.tokenizer_manager.create_request(gin)
    out = eng.tokenizer_manager.wait_response(state)
    return np.asarray(out["embedding"], np.float32)


def test_mistral_model_embedding_matches_hf():
    import torch
    from transformers import MistralConfig, MistralModel

    cfg = dict(CFG, architectures=["MistralModel"], sliding_window=None)
    torch.manual_seed(0)
    hf = MistralModel(MistralConfig(
        **{k: v for k, v in cfg.items() if k != "architectures"})).eval()
    tensors = _torch_state_dict_to_np(hf.state_dict())

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, 19).tolist()
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids])).last_hidden_state[0, -1]
    ref = ref.numpy()

    mc = ModelConfig(model_path="", hf_config=cfg)
    sa = ServerArgs(model_path="tiny-e5", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        got = _embed_via_engine(eng, ids)
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / scale < 0.02
    finally:
        eng.shutdown()


def test_qwen2_reward_model_matches_hf():
    import torch
    from transformers import Qwen2Config
    try:
        from transformers import Qwen2ForRewardModel as HFRm  # noqa: F401
        have_rm = True
    except ImportError:
        have_rm = False

    cfg = dict(CFG, architectures=["Qwen2ForRewardModel"], num_labels=1)
    torch.manual_seed(0)
    if have_rm:
        hf = HFRm(Qwen2Config(
            **{k: v for k, v in cfg.items() if k != "architectures"})).eval()
        tensors = _torch_state_dict_to_np(hf.state_dict())
    else:
        # build the qwen2_rm checkpoint schema by hand: base Qwen2Model +
        # score.0 (H->H) / score.2 (H->1) head
        from transformers import Qwen2Model

        base = Qwen2Model(Qwen2Config(
            **{k: v for k, v in cfg.items()
               if k not in ("architectures", "num_labels")})).eval()
        tensors = _torch_state_dict_to_np(base.state_dict())
        rng_t = np.random.default_rng(7)
        H = CFG["hidden_size"]
        tensors["score.0.weight"] = (
            rng_t.standard_normal((H, H)) * 0.05).astype(np.float32)
        tensors["score.0.bias"] = np.zeros(H, np.float32)
        tensors["score.2.weight"] = (
            rng_t.standard_normal((1, H)) * 0.05).astype(np.float32)
        tensors["score.2.bias"] = np.zeros(1, np.float32)
        hf = base

    rng = np.random.default_rng(1)
    ids = rng.integers(3, 250, 13).tolist()
    with torch.no_grad():
        if have_rm:
            ref = hf(input_ids=torch.tensor([ids])).logits[0].numpy()
        else:
            h = hf(input_ids=torch.tensor([ids])).last_hidden_state[0, -1]
            h = h.numpy().astype(np.float32)
            w1, b1 = tensors["score.0.weight"], tensors["score.0.bias"]
            w2, b2 = tensors["score.2.weight"], tensors["score.2.bias"]
            ref = np.maximum(h @ w1.T + b1, 0) @ w2.T + b2

    mc = ModelConfig(model_path="", hf_config=cfg)
    sa = ServerArgs(model_path="tiny-rm", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        got = _embed_via_engine(eng, ids)
        scale = np.abs(ref).max() + 1e-9
        assert np.abs(got - np.asarray(ref).reshape(-1)).max() / scale < 0.03
    finally:
        eng.shutdown()
