"""End-to-end engine test with an AWQ INT4 checkpoint.

Builds a synthetic AWQ checkpoint (reference tensor layout), loads it
through the engine, and compares greedy generation against HF running the
DEQUANTIZED weights — the logits-level analogue of the reference's AWQ
accuracy tests (`test/srt/quant/test_awq.py`).
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.quantization.awq_config import pack_awq_reference, awq_dequantize_ref
from sglang_awq_tpu.server_args import ServerArgs

CFG = dict(
    architectures=["LlamaForCausalLM"],
    vocab_size=512,
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    intermediate_size=512,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
    quantization_config={
        "quant_method": "awq",
        "bits": 4,
        "group_size": 64,
        "zero_point": True,
    },
)
G = 64


def make_awq_checkpoint(seed=0):
    """Synthetic AWQ tensors + the equivalent fp32 state dict for HF."""
    rng = np.random.default_rng(seed)
    L = CFG["num_hidden_layers"]
    H = CFG["hidden_size"]
    I = CFG["intermediate_size"]
    V = CFG["vocab_size"]
    heads, kvh = CFG["num_attention_heads"], CFG["num_key_value_heads"]
    D = H // heads

    tensors = {}
    hf_sd = {}

    def add_quant(name, K, N):
        wq = rng.integers(0, 16, (K, N)).astype(np.int32)
        zq = rng.integers(0, 16, (K // G, N)).astype(np.int32)
        sc = (rng.standard_normal((K // G, N)) * 0.2 / np.sqrt(K)).astype(np.float16)
        tensors[name + ".qweight"] = pack_awq_reference(wq)
        tensors[name + ".qzeros"] = pack_awq_reference(zq)
        tensors[name + ".scales"] = sc
        # HF wants [out, in] fp32
        hf_sd[name + ".weight"] = awq_dequantize_ref(
            tensors[name + ".qweight"], sc, tensors[name + ".qzeros"], G
        ).T.astype(np.float32)

    def add_plain(name, shape, scale=0.05):
        w = (rng.standard_normal(shape) * scale).astype(np.float32)
        tensors[name] = w
        hf_sd[name] = w

    add_plain("model.embed_tokens.weight", (V, H), 0.4)
    add_plain("model.norm.weight", (H,), 1.0)
    tensors["model.norm.weight"] = np.abs(tensors["model.norm.weight"]) * 0 + 1.0
    hf_sd["model.norm.weight"] = tensors["model.norm.weight"]
    add_plain("lm_head.weight", (V, H), 0.1)
    for l in range(L):
        p = f"model.layers.{l}."
        add_quant(p + "self_attn.q_proj", H, heads * D)
        add_quant(p + "self_attn.k_proj", H, kvh * D)
        add_quant(p + "self_attn.v_proj", H, kvh * D)
        add_quant(p + "self_attn.o_proj", heads * D, H)
        add_quant(p + "mlp.gate_proj", H, I)
        add_quant(p + "mlp.up_proj", H, I)
        add_quant(p + "mlp.down_proj", I, H)
        for n in ("input_layernorm.weight", "post_attention_layernorm.weight"):
            tensors[p + n] = np.ones(H, np.float32)
            hf_sd[p + n] = tensors[p + n]
    return tensors, hf_sd


def hf_from_state_dict(hf_sd):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(**{k: v for k, v in CFG.items() if k not in ("architectures", "quantization_config")})
    hf = LlamaForCausalLM(cfg)
    sd = {k: torch.tensor(v) for k, v in hf_sd.items()}
    missing, unexpected = hf.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    return hf.eval()


@pytest.mark.slow
def test_awq_engine_matches_dequantized_hf():
    tensors, hf_sd = make_awq_checkpoint()
    hf = hf_from_state_dict(hf_sd)

    mc = ModelConfig(model_path="", hf_config=dict(CFG))
    assert mc.is_quantized and mc.quant_config.group_size == G
    sa = ServerArgs(
        model_path="tiny-awq",
        page_size=8,
        max_total_tokens=1024,
        chunked_prefill_size=32,
    )
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors, tokenizer=None)
    try:
        import torch

        rng = np.random.default_rng(1)
        for trial in range(2):
            prompt = rng.integers(3, 500, 17 + 20 * trial).tolist()
            with torch.no_grad():
                ref = hf.generate(
                    torch.tensor([prompt]),
                    max_new_tokens=6,
                    do_sample=False,
                    eos_token_id=None,
                    pad_token_id=0,
                )[0][len(prompt):].tolist()
            out = eng.generate(
                input_ids=prompt,
                sampling_params={
                    "max_new_tokens": 6,
                    "temperature": 0.0,
                    "ignore_eos": True,
                },
            )
            assert out["output_ids"] == ref, (trial, out["output_ids"], ref)
    finally:
        eng.shutdown()
