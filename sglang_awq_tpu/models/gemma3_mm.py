"""Gemma3 multimodal (SigLIP tower + soft-token projector + bidirectional
image spans), TPU-native.

Role model: reference `python/sglang/srt/models/gemma3_mm.py`
(`Gemma3ForConditionalGeneration`; bidirectional image-span attention at
`:110` `prepare_attn_masks`) + `srt/multimodal/processors/gemma3.py`.

TPU re-design decisions:

* The language model IS `Gemma3ForCausalLM` (dual-rope, 5:1 sliding
  pattern); image features enter through the engine's input-embeds path —
  one placeholder token per image expands to `mm_tokens_per_image` copies
  and the projected SigLIP features splice over them (the shared
  `_make_mm_embed` intake that serves LLaVA, reference
  `mm_utils.embed_mm_inputs` role).
* Projector = Gemma3's soft-token pipeline: SigLIP last-layer features ->
  spatial average-pool from (image/patch)^2 down to `mm_tokens_per_image`
  -> (1+w) RMSNorm over the vision width -> a single [W_vision, H_text]
  matmul (`multi_modal_projector.mm_input_projection_weight`).
* BIDIRECTIONAL image spans: tokens of one image attend each other
  regardless of order.  The engine reports per-image span ranges
  (`mm_spans` extras); the scheduler keeps spans whole within an extend
  chunk and ships a per-token span-id array; extend attention ORs
  `span_q == span_k > 0` into the causal mask.  On TPU, span-carrying
  extend batches take the XLA attention path (exact; the paged Pallas
  extend kernel stays causal — images are a prefill-only, usually-small
  fraction of serving traffic, and decode is untouched).  Spans never
  cross chunks, so only in-chunk keys need identity — older image keys
  are already covered causally.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.gemma import Gemma3ForCausalLM
from sglang_awq_tpu.multimodal.vision import SiglipVisionTower


@dataclasses.dataclass
class Gemma3MMForConditionalGeneration(Gemma3ForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        vc = hf["vision_config"]
        if not isinstance(vc, dict):
            vc = vc.to_dict()
        self.image_token = int(hf.get("image_token_index", 262144))
        self.mm_tokens_per_image = int(hf.get("mm_tokens_per_image", 256))
        self.mm_bidirectional_spans = True  # engine/scheduler handshake
        self.vision = SiglipVisionTower(
            hidden=int(vc["hidden_size"]),
            layers=int(vc["num_hidden_layers"]),
            heads=int(vc["num_attention_heads"]),
            inter=int(vc["intermediate_size"]),
            image_size=int(vc.get("image_size", 896)),
            patch=int(vc.get("patch_size", 14)),
            eps=float(vc.get("layer_norm_eps", 1e-6)),
        )
        tokens_per_side = int(round(self.mm_tokens_per_image ** 0.5))
        assert tokens_per_side * tokens_per_side == self.mm_tokens_per_image
        assert self.vision.grid % tokens_per_side == 0, (
            self.vision.grid, tokens_per_side)
        self._pool_k = self.vision.grid // tokens_per_side

    # engine intake uses SigLIP preprocessing, not CLIP's
    mm_preprocess = "siglip"

    @property
    def mm_tokens_per_image_out(self) -> int:
        return self.mm_tokens_per_image

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        Hv, H = self.vision.hidden, self.config.hidden_size
        shapes["vision"] = self.vision.param_shapes()
        shapes["projector"] = {
            "w": ((Hv, H), jnp.bfloat16),
            "norm": ((Hv,), jnp.float32),
        }
        return shapes

    def pretranslate_tensors(self, tensors):
        out = {}
        mm = {}
        for name, arr in tensors.items():
            if name.startswith("model.language_model."):
                out["model." + name[len("model.language_model."):]] = arr
            elif name.startswith("language_model.model."):
                out["model." + name[len("language_model.model."):]] = arr
            elif name.startswith("language_model.lm_head."):
                out["lm_head." + name[len("language_model.lm_head."):]] = arr
            elif "vision_tower" in name or "multi_modal_projector" in name:
                mm[name] = arr
            else:
                out[name] = arr
        self._mm_tensors = mm
        return out

    def postprocess_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        # Gemma's (1 + w) norm fold etc. first
        params = super().postprocess_params(params)
        mm = self._mm_tensors
        self._mm_tensors = None

        def t(name):
            for prefix in ("model.", ""):
                if prefix + name in mm:
                    return mm[prefix + name]
            raise KeyError(name)

        prefix = ("model.vision_tower.vision_model."
                  if any(k.startswith("model.vision_tower") for k in mm)
                  else "vision_tower.vision_model.")
        params["vision"] = self.vision.load_params(
            lambda n: mm[prefix + n])
        params["projector"] = {
            "w": jnp.asarray(
                np.asarray(
                    t("multi_modal_projector.mm_input_projection_weight")),
                jnp.bfloat16),
            "norm": jnp.asarray(
                np.asarray(t("multi_modal_projector.mm_soft_emb_norm.weight")),
                jnp.float32),
        }
        return params

    def encode_images(self, params: Dict[str, Any],
                      pixels: jax.Array) -> jax.Array:
        """pixel_values [N, 3, S, S] -> [N, mm_tokens_per_image, H_text]."""
        feats = self.vision.encode(params["vision"], pixels)  # [N, G*G, W]
        N = feats.shape[0]
        G, W = self.vision.grid, self.vision.hidden
        k = self._pool_k
        # spatial average-pool G x G -> tokens_per_side^2
        x = feats.reshape(N, G // k, k, G // k, k, W).mean(axis=(2, 4))
        x = x.reshape(N, -1, W)
        # Gemma (1+w) RMSNorm over the vision width, f32 math
        xf = x.astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(ms + 1e-6)
        xf = xf * (1.0 + params["projector"]["norm"])
        return jnp.dot(
            xf.astype(jnp.bfloat16), params["projector"]["w"],
            preferred_element_type=jnp.float32,
        )
