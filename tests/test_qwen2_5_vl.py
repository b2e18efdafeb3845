"""Qwen2.5-VL vs HF: windowed ViT parity + mrope end-to-end.

Reference role: `python/sglang/srt/models/qwen2_5_vl.py` +
MRotaryEmbedding (`srt/layers/rotary_embedding.py`).
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np, load_model
from sglang_awq_tpu.server_args import ServerArgs

VISION = dict(
    depth=4, hidden_size=64, num_heads=4, intermediate_size=128,
    out_hidden_size=64, patch_size=14, temporal_patch_size=2,
    spatial_merge_size=2, window_size=28, fullatt_block_indexes=[2],
    in_channels=3, hidden_act="silu", tokens_per_second=2,
)
TEXT = dict(
    vocab_size=512, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16,
    rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=256,
    tie_word_embeddings=False,
    rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
)
IMG_TOK, VIS_START, VIS_END = 500, 501, 502


def _mk():
    import torch
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    torch.manual_seed(0)
    cfg = Qwen2_5_VLConfig(
        text_config=dict(TEXT),
        vision_config=dict(VISION),
        image_token_id=IMG_TOK,
        video_token_id=503,
        vision_start_token_id=VIS_START,
        vision_end_token_id=VIS_END,
    )
    hf = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return hf, _torch_state_dict_to_np(hf.state_dict())


def _our_cfg():
    return dict(
        architectures=["Qwen2_5_VLForConditionalGeneration"],
        text_config=dict(TEXT),
        vision_config=dict(VISION),
        image_token_id=IMG_TOK,
        vision_start_token_id=VIS_START,
        bos_token_id=1, eos_token_id=2,
    )


@pytest.fixture(scope="module")
def models():
    hf, tensors = _mk()
    mc = ModelConfig(model_path="", hf_config=_our_cfg())
    model, params = load_model(mc, tensors=tensors)
    return hf, model, params


def _image(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_vit_matches_hf(models):
    import torch

    hf, model, params = models
    from sglang_awq_tpu.multimodal.qwen_vit import preprocess_qwen_image

    patches, grid = preprocess_qwen_image(_image(56, 84))
    assert grid == (1, 4, 6)
    with torch.no_grad():
        want = hf.model.visual(
            torch.tensor(patches), torch.tensor([list(grid)])
        ).float().numpy()
    got = model.vision.encode(params["vision"], patches, [grid])
    np.testing.assert_allclose(got, want, rtol=4e-2, atol=4e-2)


def test_mrope_positions_match_hf(models):
    import torch

    hf, model, params = models
    grid = (1, 4, 6)
    n_img = 1 * 2 * 3
    ids = [3, 4, VIS_START] + [IMG_TOK] * n_img + [VIS_END, 7, 8]
    from sglang_awq_tpu.models.qwen2_5_vl import mrope_positions_for_prompt

    pos, delta = mrope_positions_for_prompt(ids, IMG_TOK, [grid], 2)
    want_pos, want_delta = hf.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=torch.tensor([list(grid)])
    )
    np.testing.assert_array_equal(pos, want_pos[:, 0].numpy())
    assert delta == int(want_delta[0, 0])


def test_generate_matches_hf_with_image(models):
    import torch

    hf, model, params = models
    from sglang_awq_tpu.multimodal.qwen_vit import preprocess_qwen_image

    img = _image(56, 56, seed=3)
    patches, grid = preprocess_qwen_image(img)
    n_img = grid[0] * (grid[1] // 2) * (grid[2] // 2)
    prompt = [3, 4, VIS_START, IMG_TOK, VIS_END, 9, 10, 11]
    expanded = [3, 4, VIS_START] + [IMG_TOK] * n_img + [VIS_END, 9, 10, 11]
    n_new = 5
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([expanded]),
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=n_new, do_sample=False,
        )[0, len(expanded):].tolist()

    mc = ModelConfig(model_path="", hf_config=_our_cfg())
    sa = ServerArgs(model_path="tiny-qvl", page_size=8, max_total_tokens=512,
                    chunked_prefill_size=32, max_running_requests=4)
    hf_sd = _torch_state_dict_to_np(hf.state_dict())
    eng = Engine(server_args=sa, model_config=mc, tensors=hf_sd,
                 tokenizer=None)
    try:
        out = eng.generate(
            input_ids=prompt,
            images=[(patches, grid)],
            sampling_params={"max_new_tokens": n_new, "temperature": 0.0,
                             "ignore_eos": True},
        )["output_ids"]
    finally:
        eng.shutdown()
    assert out == ref, (out, ref)
