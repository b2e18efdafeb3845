"""LLaVA (VLM) end-to-end: vision tower + projector + embedding splice must
match HF LlavaForConditionalGeneration logits, and the engine must serve
image requests through the input_embeds path.

Reference role: `python/sglang/srt/models/llava.py` +
`srt/managers/mm_utils.py` (embedding splice).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np
from sglang_awq_tpu.server_args import ServerArgs

IMG_TOK = 32


def _tiny_llava():
    import torch
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    vc = CLIPVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=16,
        projection_dim=32,
    )
    tc = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-5,
        bos_token_id=1, eos_token_id=2,
    )
    cfg = LlavaConfig(vision_config=vc, text_config=tc,
                      image_token_index=IMG_TOK)
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(cfg).eval()
    return hf, cfg


def _n_img_tokens(cfg):
    g = cfg.vision_config.image_size // cfg.vision_config.patch_size
    return g * g  # CLS dropped ("default" select)


def test_llava_matches_hf():
    import torch

    hf, cfg = _tiny_llava()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    n_img = _n_img_tokens(cfg)

    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((1, 3, 32, 32)).astype(np.float32) * 0.5
    text_pre = rng.integers(3, 250, 4).tolist()
    text_post = rng.integers(3, 250, 5).tolist()
    ids = text_pre + [IMG_TOK] * n_img + text_post

    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pixels),
        )
    ref = out.logits[0, -1].numpy()

    hf_dict = dict(cfg.to_dict(),
                   architectures=["LlavaForConditionalGeneration"])
    mc = ModelConfig(model_path="", hf_config=hf_dict)
    sa = ServerArgs(model_path="tiny-llava", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        # the engine path: encode + splice + input_embeds prefill, and
        # greedy decode of one token must equal HF's argmax
        got = eng.generate(
            input_ids=ids, images=[pixels[0]],
            sampling_params={"max_new_tokens": 1, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
        assert got[0] == int(ref.argmax()), (got, int(ref.argmax()))

        # feature-level check: spliced embeds match HF's inputs_embeds
        emb = eng.tokenizer_manager.mm_embed([pixels[0]], ids)
        with torch.no_grad():
            img_feats = hf.get_image_features(
                pixel_values=torch.tensor(pixels),
                vision_feature_layer=cfg.vision_feature_layer,
                vision_feature_select_strategy=cfg.vision_feature_select_strategy,
            )
            if isinstance(img_feats, (list, tuple)):
                img_feats = img_feats[0]
        ref_img = img_feats.reshape(-1, 64).numpy()
        got_img = emb[4 : 4 + n_img]
        scale = np.abs(ref_img).max() + 1e-9
        assert np.abs(got_img - ref_img).max() / scale < 0.03
    finally:
        eng.shutdown()


def test_llava_multi_image_and_errors():
    hf, cfg = _tiny_llava()
    tensors = _torch_state_dict_to_np(hf.state_dict())
    n_img = _n_img_tokens(cfg)
    rng = np.random.default_rng(1)
    mc = ModelConfig(model_path="", hf_config=dict(
        cfg.to_dict(), architectures=["LlavaForConditionalGeneration"]))
    sa = ServerArgs(model_path="tiny-llava", page_size=8,
                    max_total_tokens=512, chunked_prefill_size=32)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        pix = [rng.standard_normal((3, 32, 32)).astype(np.float32) * 0.5
               for _ in range(2)]
        ids = [5] + [IMG_TOK] * n_img + [6] + [IMG_TOK] * n_img + [7]
        out = eng.generate(
            input_ids=ids, images=pix,
            sampling_params={"max_new_tokens": 2, "temperature": 0.0,
                             "ignore_eos": True},
        )
        assert len(out["output_ids"]) == 2

        with pytest.raises(Exception):
            eng.generate(
                input_ids=[5, 6, 7], images=pix,  # no image tokens
                sampling_params={"max_new_tokens": 1},
            )
    finally:
        eng.shutdown()
