"""Qwen2.5-VL vision transformer, TPU-native.

Role model: reference `python/sglang/srt/models/qwen2_5_vl.py` vision tower
(itself the HF `Qwen2_5_VisionTransformerPretrainedModel`): Conv3d patch
embed, 2-D rotary over the patch grid, window attention (full attention at
`fullatt_block_indexes`), RMSNorm + SwiGLU blocks, and a 2x2 patch merger.

TPU re-design: all HOST-dependent index computation (window reorder, 2-D
rope gather, segment ids) happens once per image in numpy; the device fn is
pure batched XLA — dense [N, N] attention with SEGMENT masks expresses both
the window blocks (window-id equality) and the full blocks (image-id
equality) without ragged machinery, the right trade at ViT sizes (N = a few
thousand patches).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    return (
        xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + eps) * w
    )


@dataclasses.dataclass(frozen=True)
class QwenVisionTower:
    hidden: int
    depth: int
    heads: int
    inter: int  # SwiGLU intermediate
    out_hidden: int
    patch: int = 14
    temporal_patch: int = 2
    merge: int = 2  # spatial_merge_size
    window: int = 112
    fullatt_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    in_channels: int = 3

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch * self.patch ** 2

    def param_shapes(self) -> Dict[str, Any]:
        H, I, D = self.hidden, self.inter, self.depth
        mh = H * self.merge ** 2
        return {
            "patch_w": ((self.patch_dim, H), jnp.bfloat16),
            "norm1": ((D, H), jnp.float32),
            "norm2": ((D, H), jnp.float32),
            "qkv_w": ((D, H, 3 * H), jnp.bfloat16),
            "qkv_b": ((D, 3 * H), jnp.float32),
            "proj_w": ((D, H, H), jnp.bfloat16),
            "proj_b": ((D, H), jnp.float32),
            "gate_w": ((D, H, I), jnp.bfloat16),
            "gate_b": ((D, I), jnp.float32),
            "up_w": ((D, H, I), jnp.bfloat16),
            "up_b": ((D, I), jnp.float32),
            "down_w": ((D, I, H), jnp.bfloat16),
            "down_b": ((D, H), jnp.float32),
            "ln_q": ((H,), jnp.float32),
            "m_w1": ((mh, mh), jnp.bfloat16),
            "m_b1": ((mh,), jnp.float32),
            "m_w2": ((mh, self.out_hidden), jnp.bfloat16),
            "m_b2": ((self.out_hidden,), jnp.float32),
        }

    def load_params(self, t) -> Dict[str, Any]:
        """t(name) fetches `visual.`-relative HF tensors."""
        D = self.depth

        def stack(fmt, transpose=False, dtype=jnp.bfloat16):
            arrs = [np.asarray(t(fmt.format(i))) for i in range(D)]
            if transpose:
                arrs = [a.T for a in arrs]
            return jnp.asarray(np.stack(arrs), dtype)

        return {
            "patch_w": jnp.asarray(
                np.asarray(t("patch_embed.proj.weight")).reshape(
                    self.hidden, -1).T, jnp.bfloat16),
            "norm1": stack("blocks.{}.norm1.weight", dtype=jnp.float32),
            "norm2": stack("blocks.{}.norm2.weight", dtype=jnp.float32),
            "qkv_w": stack("blocks.{}.attn.qkv.weight", transpose=True),
            "qkv_b": stack("blocks.{}.attn.qkv.bias", dtype=jnp.float32),
            "proj_w": stack("blocks.{}.attn.proj.weight", transpose=True),
            "proj_b": stack("blocks.{}.attn.proj.bias", dtype=jnp.float32),
            "gate_w": stack("blocks.{}.mlp.gate_proj.weight", transpose=True),
            "gate_b": stack("blocks.{}.mlp.gate_proj.bias", dtype=jnp.float32),
            "up_w": stack("blocks.{}.mlp.up_proj.weight", transpose=True),
            "up_b": stack("blocks.{}.mlp.up_proj.bias", dtype=jnp.float32),
            "down_w": stack("blocks.{}.mlp.down_proj.weight", transpose=True),
            "down_b": stack("blocks.{}.mlp.down_proj.bias", dtype=jnp.float32),
            "ln_q": jnp.asarray(np.asarray(t("merger.ln_q.weight")),
                                jnp.float32),
            "m_w1": jnp.asarray(np.asarray(t("merger.mlp.0.weight")).T,
                                jnp.bfloat16),
            "m_b1": jnp.asarray(np.asarray(t("merger.mlp.0.bias")),
                                jnp.float32),
            "m_w2": jnp.asarray(np.asarray(t("merger.mlp.2.weight")).T,
                                jnp.bfloat16),
            "m_b2": jnp.asarray(np.asarray(t("merger.mlp.2.bias")),
                                jnp.float32),
        }

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        rng = np.random.default_rng(seed)
        out = {}
        for k, (shape, dt) in self.param_shapes().items():
            out[k] = jnp.asarray(
                rng.standard_normal(shape) * 0.02, dt
            )
        return out

    # ------------------------------------------------------------------
    # host-side index computation (per image list)
    # ------------------------------------------------------------------

    def host_indices(self, grid_thw: List[Tuple[int, int, int]]):
        """-> (window_index, reverse_index, win_seg, img_seg, rot [N, hd/2])
        in WINDOW order.  Mirrors HF rot_pos_emb + get_window_index."""
        m = self.merge
        mu = m * m
        wps = self.window // m // self.patch  # merger windows per axis
        win_idx = []
        win_seg_units = []  # window id per merge-unit (window order)
        img_seg_units = []
        rot_units = []  # [n_units, mu, hd/2]
        hd2 = self.head_dim // 2
        inv = 1.0 / (
            10000.0 ** (np.arange(0, hd2, 2, dtype=np.float64) / hd2)
        )  # over hd/4 dims; h and w halves concatenate
        base = 0
        wid = 0
        for img_i, (t, h, w) in enumerate(grid_thw):
            lh, lw = h // m, w // m
            idx = np.arange(t * lh * lw).reshape(t, lh, lw)
            pad_h = (-lh) % wps
            pad_w = (-lw) % wps
            padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
            padded[:, :lh, :lw] = idx
            nh, nw = (lh + pad_h) // wps, (lw + pad_w) // wps
            padded = padded.reshape(t, nh, wps, nw, wps)
            padded = padded.transpose(0, 1, 3, 2, 4).reshape(
                t * nh * nw, wps * wps
            )
            for wrow in padded:
                units = wrow[wrow != -100]
                if len(units):
                    win_idx.append(units + base)
                    win_seg_units.append(np.full(len(units), wid))
                    img_seg_units.append(np.full(len(units), img_i))
                wid += 1
            # 2-D rope per PATCH in unit-grouped order (HF rot_pos_emb)
            hp = np.arange(h)[:, None].repeat(w, 1)
            hp = hp.reshape(lh, m, lw, m).transpose(0, 2, 1, 3).reshape(-1)
            wp = np.arange(w)[None, :].repeat(h, 0)
            wp = wp.reshape(lh, m, lw, m).transpose(0, 2, 1, 3).reshape(-1)
            freqs_h = np.outer(hp, inv)  # [h*w, hd/4]
            freqs_w = np.outer(wp, inv)
            rot = np.concatenate([freqs_h, freqs_w], -1)  # [h*w, hd/2]
            rot = np.tile(rot.reshape(lh * lw, mu, hd2), (t, 1, 1))
            rot_units.append(rot)
            base += t * lh * lw
        window_index = np.concatenate(win_idx)
        reverse_index = np.argsort(window_index)
        win_seg = np.repeat(np.concatenate(win_seg_units), mu)
        img_seg = np.repeat(np.concatenate(img_seg_units), mu)
        rot_all = np.concatenate(rot_units, 0)[window_index].reshape(-1, hd2)
        return window_index, reverse_index, win_seg, img_seg, rot_all

    # ------------------------------------------------------------------
    # device encode
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnames=("self",))
    def _encode_fn(self, params, patches, cos, sin, win_seg, img_seg):
        x = jnp.dot(
            patches.astype(jnp.bfloat16), params["patch_w"],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # [N, H]
        N = x.shape[0]
        heads, hd = self.heads, self.head_dim
        scale = hd ** -0.5

        full_mask = (img_seg[:, None] == img_seg[None, :])
        win_mask = (win_seg[:, None] == win_seg[None, :]) & full_mask
        neg = jnp.float32(-1e30)

        def rope(v):  # [N, heads, hd]
            vf = v.astype(jnp.float32)
            half = jnp.concatenate([-vf[..., hd // 2:], vf[..., : hd // 2]],
                                   axis=-1)
            return vf * cos[:, None, :] + half * sin[:, None, :]

        for l in range(self.depth):
            h1 = _rms(x, params["norm1"][l]).astype(jnp.bfloat16)
            qkv = jnp.dot(
                h1, params["qkv_w"][l], preferred_element_type=jnp.float32
            ) + params["qkv_b"][l]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = rope(q.reshape(N, heads, hd))
            k = rope(k.reshape(N, heads, hd))
            v = v.reshape(N, heads, hd)
            mask = full_mask if l in self.fullatt_blocks else win_mask
            att = jnp.einsum(
                "qhd,khd->hqk", q.astype(jnp.bfloat16) * scale,
                k.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            att = jnp.where(mask[None], att, neg)
            p = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum(
                "hqk,khd->qhd", p.astype(jnp.bfloat16),
                v.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
            ).reshape(N, heads * hd)
            o = jnp.dot(
                o.astype(jnp.bfloat16), params["proj_w"][l],
                preferred_element_type=jnp.float32,
            ) + params["proj_b"][l]
            x = (x.astype(jnp.float32) + o).astype(jnp.bfloat16)

            h2 = _rms(x, params["norm2"][l]).astype(jnp.bfloat16)
            g = jnp.dot(h2, params["gate_w"][l],
                        preferred_element_type=jnp.float32) + params["gate_b"][l]
            u = jnp.dot(h2, params["up_w"][l],
                        preferred_element_type=jnp.float32) + params["up_b"][l]
            d = (jax.nn.silu(g) * u).astype(jnp.bfloat16)
            d = jnp.dot(d, params["down_w"][l],
                        preferred_element_type=jnp.float32) + params["down_b"][l]
            x = (x.astype(jnp.float32) + d).astype(jnp.bfloat16)

        # merger: RMSNorm then 2x2-unit concat -> MLP
        mh = self.hidden * self.merge ** 2
        y = _rms(x, params["ln_q"]).astype(jnp.bfloat16).reshape(-1, mh)
        y = jnp.dot(y, params["m_w1"], preferred_element_type=jnp.float32)
        y = jax.nn.gelu(y + params["m_b1"], approximate=False)
        y = jnp.dot(y.astype(jnp.bfloat16), params["m_w2"],
                    preferred_element_type=jnp.float32) + params["m_b2"]
        return y  # [N / mu, out_hidden] WINDOW order

    def encode(self, params, patches: np.ndarray,
               grid_thw: List[Tuple[int, int, int]]) -> np.ndarray:
        """patches [N, patch_dim] f32 in NATURAL order -> merged features
        [N / merge^2, out_hidden] f32 in natural order."""
        mu = self.merge ** 2
        widx, ridx, win_seg, img_seg, rot = self.host_indices(grid_thw)
        # reorder the INPUT into window order (patch embed is per-token, so
        # pre-embedding reorder == HF's post-embedding gather)
        unit_view = patches.reshape(-1, mu, patches.shape[-1])
        pat = unit_view[widx].reshape(-1, patches.shape[-1])
        emb = np.concatenate([rot, rot], -1)  # [N, hd]
        out = self._encode_fn(
            params,
            jnp.asarray(pat, jnp.float32),
            jnp.asarray(np.cos(emb), jnp.float32),
            jnp.asarray(np.sin(emb), jnp.float32),
            jnp.asarray(win_seg, jnp.int32),
            jnp.asarray(img_seg, jnp.int32),
        )
        return np.asarray(out)[ridx]


# ---------------------------------------------------------------------------
# host preprocessing (HF Qwen2VLImageProcessor role)
# ---------------------------------------------------------------------------

IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def smart_resize(h: int, w: int, factor: int = 28,
                 min_pixels: int = 56 * 56,
                 max_pixels: int = 14 * 14 * 4 * 1280) -> Tuple[int, int]:
    """HF smart_resize: round to factor multiples within the pixel budget."""
    import math

    if max(h, w) / min(h, w) > 200:
        raise ValueError("aspect ratio > 200")
    hb = max(factor, round(h / factor) * factor)
    wb = max(factor, round(w / factor) * factor)
    if hb * wb > max_pixels:
        beta = math.sqrt(h * w / max_pixels)
        hb = math.floor(h / beta / factor) * factor
        wb = math.floor(w / beta / factor) * factor
    elif hb * wb < min_pixels:
        beta = math.sqrt(min_pixels / (h * w))
        hb = math.ceil(h * beta / factor) * factor
        wb = math.ceil(w * beta / factor) * factor
    return hb, wb


def preprocess_qwen_image(img, patch: int = 14, merge: int = 2,
                          temporal: int = 2):
    """image -> (patches [n, 3*temporal*patch^2] f32, grid (t, h, w)).

    Accepts PIL images or [H, W, 3] uint8/float arrays.  Static images
    duplicate along the temporal axis (HF temporal_patch_size handling);
    the flatten order matches Qwen2VLImageProcessor._preprocess."""
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    H, W = arr.shape[:2]
    nh, nw = smart_resize(H, W, factor=patch * merge)
    if (nh, nw) != (H, W):
        # bilinear resize in numpy (no PIL dependency for array inputs)
        yi = np.linspace(0, H - 1, nh)
        xi = np.linspace(0, W - 1, nw)
        y0 = np.clip(yi.astype(int), 0, H - 2)
        x0 = np.clip(xi.astype(int), 0, W - 2)
        wy = (yi - y0)[:, None, None]
        wx = (xi - x0)[None, :, None]
        a = arr[y0][:, x0]
        b = arr[y0][:, x0 + 1]
        c = arr[y0 + 1][:, x0]
        d = arr[y0 + 1][:, x0 + 1]
        arr = (
            a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + c * wy * (1 - wx) + d * wy * wx
        )
    arr = (arr - IMAGE_MEAN) / IMAGE_STD  # [nh, nw, 3]
    arr = arr.transpose(2, 0, 1)  # [3, nh, nw]
    frames = np.stack([arr] * temporal)  # [T=2, 3, nh, nw]
    gt = 1
    gh, gw = nh // patch, nw // patch
    # HF patch order: [gt, th, 2, 2? ...]: frames -> (gt, temporal, 3,
    # gh//m, m, patch, gw//m, m, patch) -> flatten so unit-major order
    m = merge
    p = frames.reshape(gt, temporal, 3, gh // m, m, patch, gw // m, m, patch)
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    patches = p.reshape(gt * gh * gw, 3 * temporal * patch * patch)
    return patches.astype(np.float32), (gt, gh, gw)
