"""Baichuan / Baichuan2 (7B rope variant), InternLM2 and MiniCPM families.

Reference role models:
  `python/sglang/srt/models/baichuan.py`  — W_pack fused qkv; Baichuan2
      normalizes the lm_head rows (NormHead) at inference; the 13B
      ALiBi variant serves via the kernels' per-key bias channel.
  `python/sglang/srt/models/internlm2.py` — llama graph under different
      tensor names: tok_embeddings / attention.wqkv (kv-GROUPED interleave)
      / attention.wo / feed_forward.w1|w3|w2 / attention_norm / ffn_norm /
      output.
  `python/sglang/srt/models/minicpm.py`   — llama graph with muP-style
      scaling: embeddings * scale_emb, residual branches * scale_depth /
      sqrt(2L), logits head fed h / (hidden_size / dim_model_base).

All three reuse the functional llama stack; the differences live in
pretranslate_tensors (name/packing translation at load) and a few scalar
multipliers, which is exactly how the reference structures them (thin
model files over shared layers).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.llama import LlamaForCausalLM


def _alibi_slopes(n: int) -> np.ndarray:
    """Standard ALiBi head slopes (reference baichuan.py:52): powers of
    the closest-power-of-two base, odd-interpolated for the remainder."""
    cp = 2 ** int(math.floor(math.log2(n)))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp) - 3)))
    slopes = [base ** (i + 1) for i in range(cp)]
    if cp != n:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp) - 3)))
        num_rem = min(cp, n - cp)
        slopes += [extra_base ** i for i in range(1, 1 + 2 * num_rem, 2)]
    return np.asarray(slopes, np.float32)


@dataclasses.dataclass
class BaichuanForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        hf = self.config.hf_config
        # 13B ships ALiBi (no rope): per-head slopes ride the kernels'
        # per-KEY bias channel (reference srt/models/baichuan.py:52
        # _get_alibi_slopes; position_embedding == "ALIBI" at :167) and
        # the rope table collapses to the identity rotation
        self._use_alibi = bool(
            str(hf.get("position_embedding", "")).upper() == "ALIBI"
            or (int(hf.get("hidden_size", 0)) >= 5120
                and not hf.get("rope_theta"))
        )
        hf.setdefault("rope_theta", 10000.0)
        super().__post_init__()
        if self._use_alibi:
            self.alibi_slopes = _alibi_slopes(self.qh * self.tp_size)

    def rope(self):
        tab = super().rope()
        if not self._use_alibi:
            return tab
        half = tab.shape[-1] // 2
        return jnp.concatenate(
            [jnp.ones_like(tab[:, :half]), jnp.zeros_like(tab[:, half:])],
            axis=-1,
        )  # identity rotation: ALiBi replaces rope entirely

    def pretranslate_tensors(self, tensors: Dict[str, np.ndarray]):
        out = {}
        H = self.config.hidden_size
        for name, arr in tensors.items():
            if name.endswith("self_attn.W_pack.weight"):
                base = name[: -len("W_pack.weight")]
                q, k, v = np.split(arr, 3, axis=0)
                out[base + "q_proj.weight"] = q
                out[base + "k_proj.weight"] = k
                out[base + "v_proj.weight"] = v
            elif name == "lm_head.weight":
                # Baichuan2 NormHead: rows are L2-normalized at inference
                a = np.asarray(arr, np.float32)
                out[name] = a / (
                    np.linalg.norm(a, axis=1, keepdims=True) + 1e-7
                )
            else:
                out[name] = arr
        return out


@dataclasses.dataclass
class InternLM2ForCausalLM(LlamaForCausalLM):
    def pretranslate_tensors(self, tensors: Dict[str, np.ndarray]):
        c = self.config
        g = c.num_attention_heads // c.num_kv_heads
        d = c.head_dim
        out = {}
        for name, arr in tensors.items():
            n = name.replace("model.tok_embeddings", "model.embed_tokens")
            n = n.replace("attention_norm", "input_layernorm")
            n = n.replace("ffn_norm", "post_attention_layernorm")
            n = n.replace(".feed_forward.w1", ".mlp.gate_proj")
            n = n.replace(".feed_forward.w3", ".mlp.up_proj")
            n = n.replace(".feed_forward.w2", ".mlp.down_proj")
            n = n.replace(".attention.wo", ".self_attn.o_proj")
            if n == "output.weight":
                n = "lm_head.weight"
            if n.endswith(".attention.wqkv.weight"):
                base = n[: -len("attention.wqkv.weight")] + "self_attn."
                # [kvh, g + 2, d, H]: per kv-group g query heads then k, v
                w = np.asarray(arr).reshape(c.num_kv_heads, g + 2, d, -1)
                out[base + "q_proj.weight"] = w[:, :g].reshape(
                    c.num_attention_heads * d, -1)
                out[base + "k_proj.weight"] = w[:, g].reshape(
                    c.num_kv_heads * d, -1)
                out[base + "v_proj.weight"] = w[:, g + 1].reshape(
                    c.num_kv_heads * d, -1)
            else:
                out[n] = arr
        return out


@dataclasses.dataclass
class MiniCPMForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        L = self.config.num_layers
        self.embed_multiplier = float(hf.get("scale_emb", 1.0))
        self.residual_multiplier = float(
            hf.get("scale_depth", 1.0)
        ) / math.sqrt(2 * L)
        # logits = lm_head(h / (hidden / dim_model_base))
        self._logit_div = float(
            self.config.hidden_size / hf.get("dim_model_base",
                                             self.config.hidden_size)
        )
        if hf.get("tie_word_embeddings", True) and "lm_head" not in str(
            hf.get("architectures")
        ):
            self.force_tied_lm_head = bool(hf.get("tie_word_embeddings"))

    def postprocess_params(self, params):
        # logits = lm_head(h / logit_div) with h POST final-norm; RMSNorm is
        # scale-invariant so the division must fold into the HEAD weights
        # (after tying resolution), not the hidden state
        params["lm_head"]["weight"] = (
            params["lm_head"]["weight"].astype(jnp.float32) / self._logit_div
        ).astype(jnp.bfloat16)
        return params


EntryClass = [BaichuanForCausalLM, InternLM2ForCausalLM, MiniCPMForCausalLM]
