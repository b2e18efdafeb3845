"""CLIP-style vision tower (ViT), TPU-native.

Reference role: `python/sglang/srt/models/clip.py` (CLIPVisionModel used by
the LLaVA family via `srt/models/llava.py`) — re-built as a functional JAX
encoder.  No KV cache, full bidirectional attention, batch-parallel over
images: plain XLA ops map straight onto the MXU (the patch conv becomes one
[N*tokens, P*P*3] x [P*P*3, H] matmul; per-layer attention is einsum-batched
over heads), so no Pallas is needed — image encode is a tiny fraction of
serving FLOPs and XLA's fusion is already at roofline for these shapes.

HF parity notes:
* `quick_gelu` activation (x * sigmoid(1.702 x)) — CLIP's historical act.
* feature select: `vision_feature_layer` indexes the hidden-states list
  [embeddings, layer_1, ..., layer_L]; llava default -2 = output of the
  second-to-last layer, with the CLS token dropped ("default" strategy).
* pre_layrnorm (sic — HF key) before the encoder; post_layernorm is NOT
  applied to selected features (matches HF CLIPVisionTransformer when
  features are read from hidden_states).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _layer_norm(x, w, b, eps=1e-5):
    m = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
    y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + eps)
    return y * w + b


@dataclasses.dataclass
class ClipVisionTower:
    hidden: int
    layers: int
    heads: int
    inter: int
    image_size: int
    patch: int
    eps: float = 1e-5
    select_layer: int = -2  # llava vision_feature_layer
    drop_cls: bool = True  # "default" select strategy

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @property
    def tokens_per_image(self) -> int:
        return self.grid * self.grid

    def param_shapes(self) -> Dict[str, Any]:
        H, I, L, P = self.hidden, self.inter, self.layers, self.patch
        n_pos = self.grid * self.grid + 1
        return {
            "patch_w": ((P * P * 3, H), jnp.float32),
            "class_embed": ((H,), jnp.float32),
            "pos_embed": ((n_pos, H), jnp.float32),
            "pre_ln_w": ((H,), jnp.float32),
            "pre_ln_b": ((H,), jnp.float32),
            "layers": {
                "ln1_w": ((L, H), jnp.float32),
                "ln1_b": ((L, H), jnp.float32),
                "qkv_w": ((L, H, 3 * H), jnp.float32),
                "qkv_b": ((L, 3 * H), jnp.float32),
                "out_w": ((L, H, H), jnp.float32),
                "out_b": ((L, H), jnp.float32),
                "ln2_w": ((L, H), jnp.float32),
                "ln2_b": ((L, H), jnp.float32),
                "fc1_w": ((L, H, I), jnp.float32),
                "fc1_b": ((L, I), jnp.float32),
                "fc2_w": ((L, I, H), jnp.float32),
                "fc2_b": ((L, H), jnp.float32),
            },
        }

    def load_params(self, t, prefix: str) -> Dict[str, Any]:
        """t(name) -> np array (torch layouts); prefix ends at vision_model."""
        L = self.layers

        def w(name):
            return np.asarray(t(prefix + name), np.float32)

        conv = w("embeddings.patch_embedding.weight")  # [H, 3, P, P]
        patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, self.hidden)

        def stack(fmt, transpose=False):
            arrs = [w(fmt.format(l)) for l in range(L)]
            if transpose:  # torch linear [out, in] -> [in, out]
                arrs = [a.T for a in arrs]
            return np.stack(arrs)

        qkv_w = np.stack([
            np.concatenate(
                [w(f"encoder.layers.{l}.self_attn.{p}_proj.weight").T
                 for p in ("q", "k", "v")], axis=1)
            for l in range(L)
        ])
        qkv_b = np.stack([
            np.concatenate(
                [w(f"encoder.layers.{l}.self_attn.{p}_proj.bias")
                 for p in ("q", "k", "v")])
            for l in range(L)
        ])
        return {
            "patch_w": jnp.asarray(patch_w),
            "class_embed": jnp.asarray(w("embeddings.class_embedding")),
            "pos_embed": jnp.asarray(w("embeddings.position_embedding.weight")),
            "pre_ln_w": jnp.asarray(w("pre_layrnorm.weight")),
            "pre_ln_b": jnp.asarray(w("pre_layrnorm.bias")),
            "layers": {
                "ln1_w": jnp.asarray(stack("encoder.layers.{}.layer_norm1.weight")),
                "ln1_b": jnp.asarray(stack("encoder.layers.{}.layer_norm1.bias")),
                "qkv_w": jnp.asarray(qkv_w),
                "qkv_b": jnp.asarray(qkv_b),
                "out_w": jnp.asarray(stack(
                    "encoder.layers.{}.self_attn.out_proj.weight", True)),
                "out_b": jnp.asarray(stack(
                    "encoder.layers.{}.self_attn.out_proj.bias")),
                "ln2_w": jnp.asarray(stack("encoder.layers.{}.layer_norm2.weight")),
                "ln2_b": jnp.asarray(stack("encoder.layers.{}.layer_norm2.bias")),
                "fc1_w": jnp.asarray(stack("encoder.layers.{}.mlp.fc1.weight", True)),
                "fc1_b": jnp.asarray(stack("encoder.layers.{}.mlp.fc1.bias")),
                "fc2_w": jnp.asarray(stack("encoder.layers.{}.mlp.fc2.weight", True)),
                "fc2_b": jnp.asarray(stack("encoder.layers.{}.mlp.fc2.bias")),
            },
        }

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)

        def init(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = init(v)
                else:
                    shape, dt = v
                    out[k] = jnp.asarray(
                        rng.standard_normal(shape) * 0.02, dt)
            return out

        return init(self.param_shapes())

    def encode(self, params: Dict[str, Any], pixels: jax.Array) -> jax.Array:
        """pixels [N, 3, S, S] f32 (CLIP-normalized) -> features
        [N, tokens, hidden] f32 at the selected layer, CLS dropped."""
        N = pixels.shape[0]
        P, G, H = self.patch, self.grid, self.hidden
        x = pixels.transpose(0, 2, 3, 1)  # NHWC
        x = x.reshape(N, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, G * G, P * P * 3)
        x = jnp.dot(x, params["patch_w"], preferred_element_type=jnp.float32)
        cls = jnp.broadcast_to(params["class_embed"], (N, 1, H))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"][None]
        x = _layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], self.eps)

        n_keep = self.layers + self.select_layer + 1 if self.select_layer < 0 \
            else self.select_layer
        lp = params["layers"]
        nh = self.heads
        hd = H // nh
        T = x.shape[1]
        for l in range(n_keep):
            h = _layer_norm(x, lp["ln1_w"][l], lp["ln1_b"][l], self.eps)
            qkv = jnp.dot(h.astype(jnp.bfloat16),
                          lp["qkv_w"][l].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) + lp["qkv_b"][l]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            scores = jnp.einsum(
                "nqhd,nkhd->nhqk", q, k,
                preferred_element_type=jnp.float32) * (hd ** -0.5)
            p = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p.astype(jnp.float32),
                           v.astype(jnp.float32))
            o = o.reshape(N, T, H)
            o = jnp.dot(o.astype(jnp.bfloat16),
                        lp["out_w"][l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + lp["out_b"][l]
            x = x + o
            h2 = _layer_norm(x, lp["ln2_w"][l], lp["ln2_b"][l], self.eps)
            f = jnp.dot(h2.astype(jnp.bfloat16),
                        lp["fc1_w"][l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + lp["fc1_b"][l]
            f = _quick_gelu(f)
            f = jnp.dot(f.astype(jnp.bfloat16),
                        lp["fc2_w"][l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + lp["fc2_b"][l]
            x = x + f
        if self.drop_cls:
            x = x[:, 1:]
        return x


# CLIP pixel normalization constants (openai/clip-vit)
CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(img, size: int) -> np.ndarray:
    """PIL image / [H, W, 3] uint8 array -> CLIP pixel_values [3, S, S].

    Resize (bicubic, shorter side) + center crop + normalize — the CLIP
    processor recipe (reference multimodal processors call the HF processor;
    here it is re-implemented so serving has no torch dependency)."""
    try:
        from PIL import Image
    except Exception:  # pragma: no cover
        Image = None
    if Image is not None and not isinstance(img, np.ndarray):
        img = img.convert("RGB")
        w, h = img.size
        scale = size / min(w, h)
        img = img.resize(
            (max(size, int(round(w * scale))),
             max(size, int(round(h * scale)))),
            Image.BICUBIC,
        )
        w, h = img.size
        left, top = (w - size) // 2, (h - size) // 2
        img = img.crop((left, top, left + size, top + size))
        arr = np.asarray(img, np.float32) / 255.0
    else:
        arr = np.asarray(img, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        if arr.shape[:2] != (size, size):
            raise ValueError(
                f"raw-array images must already be {size}x{size}")
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)  # [3, S, S]


@dataclasses.dataclass
class SiglipVisionTower:
    """SigLIP vision encoder (Gemma3-mm tower; reference
    `srt/models/siglip.py` role).  Differences vs CLIP: no class token, no
    pre-layernorm, tanh-approx GELU MLPs, a FINAL post_layernorm, and the
    LAST layer's output is consumed (no feature-layer selection)."""

    hidden: int
    layers: int
    heads: int
    inter: int
    image_size: int
    patch: int
    eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch

    @property
    def tokens_per_image(self) -> int:
        return self.grid * self.grid

    def param_shapes(self) -> Dict[str, Any]:
        H, I, L, P = self.hidden, self.inter, self.layers, self.patch
        return {
            "patch_w": ((P * P * 3, H), jnp.float32),
            "patch_b": ((H,), jnp.float32),
            "pos_embed": ((self.grid * self.grid, H), jnp.float32),
            "post_ln_w": ((H,), jnp.float32),
            "post_ln_b": ((H,), jnp.float32),
            "layers": {
                "ln1_w": ((L, H), jnp.float32),
                "ln1_b": ((L, H), jnp.float32),
                "qkv_w": ((L, H, 3 * H), jnp.float32),
                "qkv_b": ((L, 3 * H), jnp.float32),
                "out_w": ((L, H, H), jnp.float32),
                "out_b": ((L, H), jnp.float32),
                "ln2_w": ((L, H), jnp.float32),
                "ln2_b": ((L, H), jnp.float32),
                "fc1_w": ((L, H, I), jnp.float32),
                "fc1_b": ((L, I), jnp.float32),
                "fc2_w": ((L, I, H), jnp.float32),
                "fc2_b": ((L, H), jnp.float32),
            },
        }

    def load_params(self, t) -> Dict[str, Any]:
        """t(name) -> np array, names relative to ...vision_model."""
        L = self.layers

        def w(name):
            return np.asarray(t(name), np.float32)

        conv = w("embeddings.patch_embedding.weight")  # [H, 3, P, P]
        patch_w = conv.transpose(2, 3, 1, 0).reshape(-1, self.hidden)

        def stack(fmt, transpose=False):
            arrs = [w(fmt.format(l)) for l in range(L)]
            if transpose:
                arrs = [a.T for a in arrs]
            return np.stack(arrs)

        qkv_w = np.stack([
            np.concatenate(
                [w(f"encoder.layers.{l}.self_attn.{p}_proj.weight").T
                 for p in ("q", "k", "v")], axis=1)
            for l in range(L)
        ])
        qkv_b = np.stack([
            np.concatenate(
                [w(f"encoder.layers.{l}.self_attn.{p}_proj.bias")
                 for p in ("q", "k", "v")])
            for l in range(L)
        ])
        return {
            "patch_w": jnp.asarray(patch_w),
            "patch_b": jnp.asarray(w("embeddings.patch_embedding.bias")),
            "pos_embed": jnp.asarray(w("embeddings.position_embedding.weight")),
            "post_ln_w": jnp.asarray(w("post_layernorm.weight")),
            "post_ln_b": jnp.asarray(w("post_layernorm.bias")),
            "layers": {
                "ln1_w": jnp.asarray(stack("encoder.layers.{}.layer_norm1.weight")),
                "ln1_b": jnp.asarray(stack("encoder.layers.{}.layer_norm1.bias")),
                "qkv_w": jnp.asarray(qkv_w),
                "qkv_b": jnp.asarray(qkv_b),
                "out_w": jnp.asarray(stack(
                    "encoder.layers.{}.self_attn.out_proj.weight", True)),
                "out_b": jnp.asarray(stack(
                    "encoder.layers.{}.self_attn.out_proj.bias")),
                "ln2_w": jnp.asarray(stack("encoder.layers.{}.layer_norm2.weight")),
                "ln2_b": jnp.asarray(stack("encoder.layers.{}.layer_norm2.bias")),
                "fc1_w": jnp.asarray(stack("encoder.layers.{}.mlp.fc1.weight", True)),
                "fc1_b": jnp.asarray(stack("encoder.layers.{}.mlp.fc1.bias")),
                "fc2_w": jnp.asarray(stack("encoder.layers.{}.mlp.fc2.weight", True)),
                "fc2_b": jnp.asarray(stack("encoder.layers.{}.mlp.fc2.bias")),
            },
        }

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)

        def init(tree):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    out[k] = init(v)
                else:
                    shape, dt = v
                    out[k] = jnp.asarray(rng.standard_normal(shape) * 0.02, dt)
            return out

        return init(self.param_shapes())

    def encode(self, params: Dict[str, Any], pixels: jax.Array) -> jax.Array:
        """pixels [N, 3, S, S] f32 (SigLIP-normalized) -> [N, tokens, W]."""
        N = pixels.shape[0]
        P, G, H = self.patch, self.grid, self.hidden
        x = pixels.transpose(0, 2, 3, 1)
        x = x.reshape(N, G, P, G, P, 3).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, G * G, P * P * 3)
        x = jnp.dot(x, params["patch_w"], preferred_element_type=jnp.float32)
        x = x + params["patch_b"] + params["pos_embed"][None]

        lp = params["layers"]
        nh = self.heads
        hd = H // nh
        T = x.shape[1]
        for l in range(self.layers):
            h = _layer_norm(x, lp["ln1_w"][l], lp["ln1_b"][l], self.eps)
            qkv = jnp.dot(h.astype(jnp.bfloat16),
                          lp["qkv_w"][l].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32) + lp["qkv_b"][l]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(N, T, nh, hd)
            k = k.reshape(N, T, nh, hd)
            v = v.reshape(N, T, nh, hd)
            scores = jnp.einsum(
                "nqhd,nkhd->nhqk", q, k,
                preferred_element_type=jnp.float32) * (hd ** -0.5)
            p = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", p.astype(jnp.float32),
                           v.astype(jnp.float32)).reshape(N, T, H)
            o = jnp.dot(o.astype(jnp.bfloat16),
                        lp["out_w"][l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + lp["out_b"][l]
            x = x + o
            h2 = _layer_norm(x, lp["ln2_w"][l], lp["ln2_b"][l], self.eps)
            f = jnp.dot(h2.astype(jnp.bfloat16),
                        lp["fc1_w"][l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + lp["fc1_b"][l]
            f = jax.nn.gelu(f, approximate=True)  # gelu_pytorch_tanh
            f = jnp.dot(f.astype(jnp.bfloat16),
                        lp["fc2_w"][l].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) + lp["fc2_b"][l]
            x = x + f
        return _layer_norm(x, params["post_ln_w"], params["post_ln_b"],
                           self.eps)


# SigLIP pixel normalization (google/siglip: rescale to [-1, 1])
SIGLIP_MEAN = np.asarray([0.5, 0.5, 0.5], np.float32)
SIGLIP_STD = np.asarray([0.5, 0.5, 0.5], np.float32)


def preprocess_image_siglip(img, size: int) -> np.ndarray:
    """-> [3, size, size] f32, SigLIP-normalized (rescale to [-1, 1];
    Gemma3 processor resizes straight to size x size, no center crop)."""
    try:
        from PIL import Image
    except Exception:  # pragma: no cover
        Image = None
    if Image is not None and not isinstance(img, np.ndarray):
        img = img.convert("RGB").resize((size, size), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
    else:
        arr = np.asarray(img, np.float32)
        if arr.max() > 1.5:
            arr = arr / 255.0
        assert arr.shape[:2] == (size, size), arr.shape
    arr = (arr - SIGLIP_MEAN) / SIGLIP_STD
    return arr.transpose(2, 0, 1).astype(np.float32)
