"""Qwen2.5-VL (vision-language, mrope), TPU-native.

Role model: reference `python/sglang/srt/models/qwen2_5_vl.py` (windowed
ViT + Qwen2 LM) and `srt/layers/rotary_embedding.py` MRotaryEmbedding.

Serving design (extends the LLaVA pattern, models/llava.py): the ViT runs
as its own jitted encode at admission; projected features splice over the
image-placeholder tokens via the input_embeds path.  What mrope adds:

* prefill carries positions as [3, T] streams (temporal/height/width) —
  `layers/rotary.apply_rope` selects each frequency section's stream;
* decode needs only a per-request OFFSET: after the prompt every stream
  advances together from `mrope_position_delta`, so decode positions stay
  1-D (host adds the delta; reference MRotaryEmbedding keeps the same
  per-request delta).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.qwen2 import Qwen2ForCausalLM
from sglang_awq_tpu.multimodal.qwen_vit import (
    QwenVisionTower,
    preprocess_qwen_image,
)


def mrope_positions_for_prompt(
    ids: List[int],
    image_token: int,
    grids: List[Tuple[int, int, int]],
    merge: int = 2,
) -> Tuple[np.ndarray, int]:
    """HF Qwen2_5_VL get_rope_index (images): -> ([3, T] positions, delta).

    Text tokens advance all three streams by one; an image block of
    t x (h/m) x (w/m) placeholders spreads (t, h, w) indices from the
    current offset and advances it by max(t, h/m, w/m)."""
    T = len(ids)
    pos = np.zeros((3, T), np.int64)
    nxt = 0
    img_i = 0
    i = 0
    ids_np = np.asarray(ids)
    while i < T:
        if ids_np[i] == image_token and img_i < len(grids):
            t, h, w = grids[img_i]
            lh, lw = h // merge, w // merge
            n = t * lh * lw
            ti = np.repeat(np.arange(t), lh * lw)
            hi = np.tile(np.repeat(np.arange(lh), lw), t)
            wi = np.tile(np.arange(lw), t * lh)
            pos[0, i : i + n] = nxt + ti
            pos[1, i : i + n] = nxt + hi
            pos[2, i : i + n] = nxt + wi
            nxt = nxt + max(t, lh, lw)
            img_i += 1
            i += n
        else:
            pos[:, i] = nxt
            nxt += 1
            i += 1
    return pos.astype(np.int32), int(nxt - T)


@dataclasses.dataclass
class Qwen2_5_VLForCausalLM(Qwen2ForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        vc = hf["vision_config"]
        if not isinstance(vc, dict):
            vc = vc.to_dict()
        rs = hf.get("rope_scaling") or {}
        self.mrope_section = tuple(rs.get("mrope_section", ()))
        assert self.mrope_section, "Qwen2.5-VL needs rope_scaling.mrope_section"
        assert sum(self.mrope_section) * 2 == self.head_dim
        self.image_token = int(hf.get("image_token_id", 151655))
        self.spatial_merge = int(vc.get("spatial_merge_size", 2))
        self.vision = QwenVisionTower(
            hidden=int(vc["hidden_size"]),
            depth=int(vc["depth"]),
            heads=int(vc["num_heads"]),
            inter=int(vc["intermediate_size"]),
            out_hidden=int(vc.get("out_hidden_size", hf["hidden_size"])),
            patch=int(vc.get("patch_size", 14)),
            temporal_patch=int(vc.get("temporal_patch_size", 2)),
            merge=self.spatial_merge,
            window=int(vc.get("window_size", 112)),
            fullatt_blocks=tuple(
                vc.get("fullatt_block_indexes", (7, 15, 23, 31))
            ),
        )

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        shapes["vision"] = self.vision.param_shapes()
        return shapes

    def pretranslate_tensors(self, tensors):
        out = {}
        mm = {}
        for name, arr in tensors.items():
            if "visual." in name:
                mm[name.split("visual.", 1)[1]] = arr
            elif name.startswith("model.language_model."):
                out["model." + name[len("model.language_model."):]] = arr
            elif name.startswith("language_model."):
                out[name[len("language_model."):]] = arr
            else:
                out[name] = arr
        self._mm_tensors = mm
        return out

    def postprocess_params(self, params):
        mm = getattr(self, "_mm_tensors", None)
        self._mm_tensors = None
        if mm:
            params["vision"] = self.vision.load_params(lambda n: mm[n])
        return params

    # ------------------------------------------------------------------
    # multimodal intake (called by the engine's mm hook)
    # ------------------------------------------------------------------

    def mm_embed_prompt(self, params, embed_tokens, images, ids):
        """images + prompt ids -> (input_embeds [T, H] f32, extras).

        extras carries the mrope position streams + delta the scheduler
        threads through prefill/decode."""
        patches_l, grids = [], []
        for im in images:
            if isinstance(im, tuple) and len(im) == 2:
                # pre-patched: (patches [n, patch_dim], grid)
                p, g = im
            else:
                p, g = preprocess_qwen_image(
                    im, patch=self.vision.patch, merge=self.spatial_merge,
                    temporal=self.vision.temporal_patch,
                )
            patches_l.append(np.asarray(p, np.float32))
            grids.append(tuple(int(x) for x in g))
        patches = np.concatenate(patches_l, 0)
        feats = self.vision.encode(params["vision"], patches, grids)
        # [sum(t*lh*lw), H_text] natural order

        mu = self.spatial_merge ** 2
        tokens_of = [t * (h // self.spatial_merge) * (w // self.spatial_merge)
                     for (t, h, w) in grids]
        tok = self.image_token
        n_occ = sum(1 for t in ids if t == tok)
        if n_occ == len(images):
            expanded = []
            gi = 0
            for t in ids:
                if t == tok:
                    expanded.extend([tok] * tokens_of[gi])
                    gi += 1
                else:
                    expanded.append(t)
            ids = expanded
        elif n_occ != sum(tokens_of):
            raise ValueError(
                f"prompt has {n_occ} image tokens; expected {len(images)} "
                f"placeholders or {sum(tokens_of)} expanded tokens"
            )
        txt = np.asarray(embed_tokens(np.asarray(ids, np.int32)), np.float32)
        posn = np.flatnonzero(np.asarray(ids) == tok)
        txt[posn] = feats
        mpos, delta = mrope_positions_for_prompt(
            ids, tok, grids, self.spatial_merge
        )
        return txt, {"mrope_positions": mpos, "mrope_delta": delta}


EntryClass = [Qwen2_5_VLForCausalLM]
