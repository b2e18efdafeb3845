"""Gemma3 multimodal vs HF (SigLIP tower + soft-token projector +
bidirectional image-span attention).

Reference role: `srt/models/gemma3_mm.py` (`prepare_attn_masks` at :110
is the bidirectional-span behavior asserted here — a causal-only
implementation produces different logits for any prompt whose image span
has >1 token).
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

IMG_TOK = 500
TEXT = dict(
    vocab_size=512, hidden_size=128, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, head_dim=32,
    intermediate_size=256, hidden_act="gelu_pytorch_tanh",
    rms_norm_eps=1e-6, rope_theta=10000.0, rope_local_base_freq=10000.0,
    max_position_embeddings=256, sliding_window=16,
    sliding_window_pattern=2, query_pre_attn_scalar=32,
    bos_token_id=1, eos_token_id=2,
)
VISION = dict(
    hidden_size=64, num_hidden_layers=2, num_attention_heads=2,
    intermediate_size=128, image_size=28, patch_size=14,
    num_channels=3, layer_norm_eps=1e-6, hidden_act="gelu_pytorch_tanh",
)


def _mk(seed=0):
    import torch
    from transformers import (
        Gemma3Config,
        Gemma3ForConditionalGeneration,
        Gemma3TextConfig,
        SiglipVisionConfig,
    )

    cfg = Gemma3Config(
        text_config=Gemma3TextConfig(**TEXT),
        vision_config=SiglipVisionConfig(**VISION),
        image_token_index=IMG_TOK,
        mm_tokens_per_image=4,
        boi_token_index=498,
        eoi_token_index=499,
    )
    torch.manual_seed(seed)
    hf = Gemma3ForConditionalGeneration(cfg).eval()
    # HF zero-initializes mm_input_projection_weight; randomize it so the
    # image features (and hence the span mask) actually matter
    with torch.no_grad():
        hf.model.multi_modal_projector.mm_input_projection_weight.normal_(
            0.0, 0.2)
    return hf, cfg


def _engine(tensors):
    hf_cfg = dict(
        architectures=["Gemma3ForConditionalGeneration"],
        text_config=dict(TEXT),
        vision_config=dict(VISION),
        image_token_index=IMG_TOK,
        mm_tokens_per_image=4,
        tie_word_embeddings=True,
    )
    mc = ModelConfig(model_path="", hf_config=hf_cfg)
    sa = ServerArgs(model_path="tiny-g3mm", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32,
                    max_running_requests=2)
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


@pytest.mark.slow
def test_gemma3_mm_matches_hf_greedy():
    import torch

    hf, cfg = _mk()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    rng = np.random.default_rng(0)
    # prompt: text, ONE image placeholder (engine expands to 4 tokens), text
    pre = rng.integers(3, 490, 9).tolist()
    post = rng.integers(3, 490, 7).tolist()
    ids_ours = pre + [IMG_TOK] + post
    pixels = rng.standard_normal((3, 28, 28)).astype(np.float32) * 0.5

    # HF ground truth: expanded placeholder run + token_type_ids marking
    # the image span (drives HF's bidirectional mask)
    ids_hf = pre + [IMG_TOK] * 4 + post
    tt = [1 if t == IMG_TOK else 0 for t in ids_hf]
    with torch.no_grad():
        out = hf.generate(
            input_ids=torch.tensor([ids_hf]),
            token_type_ids=torch.tensor([tt]),
            pixel_values=torch.tensor(pixels[None]),
            max_new_tokens=6, do_sample=False, eos_token_id=None,
            pad_token_id=0,
        )
    ref = out[0][len(ids_hf):].tolist()

    eng = _engine(tensors)
    try:
        assert eng.scheduler.runner.model.mm_bidirectional_spans
        got = eng.generate(
            input_ids=ids_ours, images=[pixels],
            sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()
    assert got == ref, (got, ref)


@pytest.mark.slow
def test_gemma3_mm_bidirectional_spans_matter():
    """Sanity: disabling the span channel changes logits (i.e., the test
    above actually exercises bidirectionality, not just the tower)."""
    import torch

    hf, _ = _mk(seed=1)
    tensors = _torch_state_dict_to_np(hf.state_dict())
    rng = np.random.default_rng(1)
    pre = rng.integers(3, 490, 5).tolist()
    ids_ours = pre + [IMG_TOK] + rng.integers(3, 490, 5).tolist()
    pixels = rng.standard_normal((3, 28, 28)).astype(np.float32) * 0.5

    outs = {}
    for bidir in (True, False):
        eng = _engine(tensors)
        try:
            if not bidir:
                eng.scheduler.runner.model.mm_bidirectional_spans = False
                eng.tokenizer_manager.mm_embed = eng._make_mm_embed()
            r = eng.generate(
                input_ids=ids_ours, images=[pixels],
                sampling_params={"max_new_tokens": 4, "temperature": 0.0,
                                 "ignore_eos": True, "return_logprob": True},
            )
            outs[bidir] = (r["output_ids"],
                           [round(float(x[0]), 5)
                            for x in r["meta_info"]["output_token_logprobs"]])
        finally:
            eng.shutdown()
    assert outs[True] != outs[False], outs
