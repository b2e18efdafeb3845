"""Shared test helpers."""

from typing import List


class ByteTokenizer:
    """Trivial byte-level tokenizer (zero-egress substitute for HF files).

    token id = byte value + 3 (ids 0..2 reserved: pad/bos/eos).
    """

    eos_token_id = 2
    bos_token_id = 1
    chat_template = None

    def encode(self, text: str) -> List[int]:
        return [b + 3 for b in text.encode("utf-8", errors="replace")]

    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        bs = bytes(
            (i - 3) % 256 for i in ids if (not skip_special_tokens) or i >= 3
        )
        return bs.decode("utf-8", errors="replace")


TINY_LLAMA_CFG = dict(
    architectures=["LlamaForCausalLM"],
    vocab_size=512,
    hidden_size=256,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=4,
    intermediate_size=448,
    rms_norm_eps=1e-5,
    rope_theta=10000.0,
    max_position_embeddings=256,
    tie_word_embeddings=False,
    bos_token_id=1,
    eos_token_id=2,
)


def tiny_hf_model_and_tensors(seed: int = 0):
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np

    torch.manual_seed(seed)
    cfg = LlamaConfig(**{k: v for k, v in TINY_LLAMA_CFG.items() if k != "architectures"})
    hf = LlamaForCausalLM(cfg).eval()
    return hf, _torch_state_dict_to_np(hf.state_dict())
