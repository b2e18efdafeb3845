"""LLaVA (vision-language) causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/llava.py`
(LlavaLlamaForCausalLM: CLIP vision tower + 2-layer MLP projector + llama)
and the multimodal managers (`srt/managers/mm_utils.py` embedding splice).

TPU re-design: the vision tower runs as its OWN small jitted encode
(ops are batch-parallel XLA — no KV cache, no Pallas needed), invoked once
per request at admission; the projected image features splice into the
prompt's token embeddings HOST-side and the request enters the engine
through the existing `input_embeds` path — prefill/decode kernels are
untouched, and causality is preserved (LLaVA image tokens are ordinary
causal positions, unlike Gemma3's bidirectional spans).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.llama import LlamaForCausalLM
from sglang_awq_tpu.multimodal.vision import ClipVisionTower


@dataclasses.dataclass
class LlavaForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        vc = hf["vision_config"]
        if not isinstance(vc, dict):  # transformers config object
            vc = vc.to_dict()
        self.image_token = int(hf.get("image_token_index", 32000))
        self.vision = ClipVisionTower(
            hidden=int(vc["hidden_size"]),
            layers=int(vc["num_hidden_layers"]),
            heads=int(vc["num_attention_heads"]),
            inter=int(vc["intermediate_size"]),
            image_size=int(vc.get("image_size", 336)),
            patch=int(vc.get("patch_size", 14)),
            select_layer=int(hf.get("vision_feature_layer", -2)),
            drop_cls=hf.get("vision_feature_select_strategy", "default")
            == "default",
        )

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        Hv, H = self.vision.hidden, self.config.hidden_size
        shapes["vision"] = self.vision.param_shapes()
        shapes["projector"] = {
            "w1": ((Hv, H), jnp.bfloat16),
            "b1": ((H,), jnp.float32),
            "w2": ((H, H), jnp.bfloat16),
            "b2": ((H,), jnp.float32),
        }
        return shapes

    def pretranslate_tensors(self, tensors):
        """Unwrap the language model to the canonical `model.*` names and
        stash the vision/projector tensors for postprocess_params."""
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
        mm = self._mm_tensors
        self._mm_tensors = None

        def t(name):
            for prefix in ("model.", ""):
                if prefix + name in mm:
                    return mm[prefix + name]
            raise KeyError(name)

        prefix = ("model.vision_tower.vision_model."
                  if any(k.startswith("model.") for k in mm)
                  else "vision_tower.vision_model.")
        params["vision"] = self.vision.load_params(
            lambda n: mm[prefix + n], ""
        )
        params["projector"] = {
            "w1": jnp.asarray(
                np.asarray(t("multi_modal_projector.linear_1.weight")).T,
                jnp.bfloat16),
            "b1": jnp.asarray(
                np.asarray(t("multi_modal_projector.linear_1.bias")),
                jnp.float32),
            "w2": jnp.asarray(
                np.asarray(t("multi_modal_projector.linear_2.weight")).T,
                jnp.bfloat16),
            "b2": jnp.asarray(
                np.asarray(t("multi_modal_projector.linear_2.bias")),
                jnp.float32),
        }
        return params

    # ------------------------------------------------------------------
    # vision encode (separate jit, called at request admission)
    # ------------------------------------------------------------------

    def encode_images(self, params: Dict[str, Any],
                      pixels: jax.Array) -> jax.Array:
        """pixel_values [N, 3, S, S] f32 -> projected features
        [N, tokens_per_image, H_text] f32."""
        feats = self.vision.encode(params["vision"], pixels)
        p = params["projector"]
        x = jnp.dot(
            feats.astype(jnp.bfloat16), p["w1"],
            preferred_element_type=jnp.float32,
        ) + p["b1"]
        x = jax.nn.gelu(x, approximate=False)  # projector_hidden_act="gelu"
        x = jnp.dot(
            x.astype(jnp.bfloat16), p["w2"],
            preferred_element_type=jnp.float32,
        ) + p["b2"]
        return x
