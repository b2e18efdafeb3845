"""GPT-2 / GPTBigCode (StarCoder v1) / OPT causal LMs, TPU-native.

Role models: reference `python/sglang/srt/models/gpt2.py`,
`gpt_bigcode.py`, `opt.py`.  All three are pre-rope-era graphs: biased
LayerNorms, non-gated MLPs, biases on every projection, and learned
ABSOLUTE position embeddings instead of rotary.  They ride the
Starcoder2 base (which already has the LayerNorm/bias/non-gated-MLP
machinery); position handling is:

* the rope table is replaced with the identity rotation (cos=1, sin=0 —
  the SmolLM3 NoPE trick), so the attention kernels are unchanged;
* `_pos_embed` adds a learned `wpe[position]` row to the token
  embedding (OPT's table is offset by 2, matching
  OPTLearnedPositionalEmbedding).

Checkpoint quirks handled in `pretranslate_tensors`:
* GPT-2 stores Conv1D weights `[in, out]` (transposed vs nn.Linear) and
  a fused biased `c_attn` = [Q|K|V];
* GPTBigCode fuses `c_attn` too (nn.Linear layout) with MQA K/V slices;
* OPT names live under `model.decoder.*` with per-layer
  `final_layer_norm` as the post-attention norm.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.starcoder2 import Starcoder2ForCausalLM


class _LearnedPosBase(Starcoder2ForCausalLM):
    pos_offset: int = 0

    def __post_init__(self):
        # GPT-2-era checkpoints tie lm_head to wte by default (the HF
        # PretrainedConfig default is True and config.json omits the key)
        c = self.config
        c.tie_word_embeddings = bool(
            c.hf_config.get("tie_word_embeddings", True)
        )
        super().__post_init__()

    def rope(self) -> jax.Array:
        tab = super().rope()  # [P, D] -> identity rotation (NoPE)
        half = tab.shape[-1] // 2
        return jnp.concatenate(
            [jnp.ones_like(tab[:, :half]), jnp.zeros_like(tab[:, half:])],
            axis=-1,
        )

    def _pos_embed(self, params, x, positions):
        wpe = params["layers"]["wpe"]
        pe = wpe[positions + self.pos_offset]  # pad rows read row 0: unused
        return (x.astype(jnp.float32) + pe.astype(jnp.float32)).astype(x.dtype)


@dataclasses.dataclass
class GPT2LMHeadModel(_LearnedPosBase):
    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        out = super().extra_layer_params(t, L)
        out["wpe"] = jnp.asarray(t("model.wpe.weight"), jnp.bfloat16)
        return out

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        H = c.hidden_size
        ren = {
            "transformer.wte.weight": "model.embed_tokens.weight",
            "transformer.wpe.weight": "model.wpe.weight",
            "transformer.ln_f.weight": "model.norm.weight",
            "transformer.ln_f.bias": "model.norm.bias",
        }
        out = {}
        for name, arr in tensors.items():
            if name in ren:
                out[ren[name]] = arr
                continue
            if name == "lm_head.weight":  # tied; loader uses wte
                continue
            name = name.replace("transformer.h.", "model.layers.")
            if name.endswith(".attn.c_attn.weight"):
                base = name[: -len("attn.c_attn.weight")]
                w = arr.T  # Conv1D [in, out] -> [3H, in], rows [Q|K|V]
                out[base + "self_attn.q_proj.weight"] = w[:H]
                out[base + "self_attn.k_proj.weight"] = w[H : 2 * H]
                out[base + "self_attn.v_proj.weight"] = w[2 * H :]
            elif name.endswith(".attn.c_attn.bias"):
                base = name[: -len("attn.c_attn.bias")]
                out[base + "self_attn.q_proj.bias"] = arr[:H]
                out[base + "self_attn.k_proj.bias"] = arr[H : 2 * H]
                out[base + "self_attn.v_proj.bias"] = arr[2 * H :]
            else:
                if name.endswith((".attn.c_proj.weight", ".mlp.c_fc.weight",
                                  ".mlp.c_proj.weight")):
                    arr = np.ascontiguousarray(arr.T)  # Conv1D transpose
                name = (
                    name.replace(".ln_1.", ".input_layernorm.")
                    .replace(".ln_2.", ".post_attention_layernorm.")
                    .replace(".attn.c_proj.", ".self_attn.o_proj.")
                )
                out[name] = arr
        return out


@dataclasses.dataclass
class GPTBigCodeForCausalLM(_LearnedPosBase):
    """StarCoder v1 / santacoder: GPT-2 graph in nn.Linear layout with
    MQA (multi_query -> one shared K/V head)."""

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        out = super().extra_layer_params(t, L)
        out["wpe"] = jnp.asarray(t("model.wpe.weight"), jnp.bfloat16)
        return out

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        nq = c.num_attention_heads * c.head_dim
        nkv = c.num_kv_heads * c.head_dim
        ren = {
            "transformer.wte.weight": "model.embed_tokens.weight",
            "transformer.wpe.weight": "model.wpe.weight",
            "transformer.ln_f.weight": "model.norm.weight",
            "transformer.ln_f.bias": "model.norm.bias",
        }
        out = {}
        for name, arr in tensors.items():
            if name in ren:
                out[ren[name]] = arr
                continue
            if name == "lm_head.weight":
                continue
            name = name.replace("transformer.h.", "model.layers.")
            if name.endswith(".attn.c_attn.weight") or name.endswith(
                ".attn.c_attn.bias"
            ):
                kind = name.rsplit(".", 1)[-1]
                base = name[: -len(f"attn.c_attn.{kind}")]
                out[f"{base}self_attn.q_proj.{kind}"] = arr[:nq]
                out[f"{base}self_attn.k_proj.{kind}"] = arr[nq : nq + nkv]
                out[f"{base}self_attn.v_proj.{kind}"] = arr[nq + nkv :]
            else:
                name = (
                    name.replace(".ln_1.", ".input_layernorm.")
                    .replace(".ln_2.", ".post_attention_layernorm.")
                    .replace(".attn.c_proj.", ".self_attn.o_proj.")
                )
                out[name] = arr
        return out


@dataclasses.dataclass
class OPTForCausalLM(_LearnedPosBase):
    pos_offset: int = 2  # OPTLearnedPositionalEmbedding

    def __post_init__(self):
        hf = self.config.hf_config
        assert hf.get("do_layer_norm_before", True), (
            "OPT post-norm (350m) variant not wired"
        )
        assert hf.get("word_embed_proj_dim", hf["hidden_size"]) == \
            hf["hidden_size"], "OPT project_in/out variant not wired"
        self.config.rms_norm_eps = 1e-5  # nn.LayerNorm default; not in config
        super().__post_init__()

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        out = super().extra_layer_params(t, L)
        out["wpe"] = jnp.asarray(t("model.wpe.weight"), jnp.bfloat16)
        return out

    def _mlp(self, lp, h2, l, lora=None, lora_idx=None):
        from sglang_awq_tpu.layers.linear import linear_apply

        del lora, lora_idx
        a = linear_apply(self.specs["fc"], lp["fc"], h2, l)
        if "bias" in lp["fc"]:
            a = a + lp["fc"]["bias"][l]
        a = jax.nn.relu(a.astype(jnp.float32)).astype(jnp.bfloat16)
        return linear_apply(self.specs["cproj"], lp["cproj"], a, l)

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        ren = {
            "model.decoder.embed_tokens.weight": "model.embed_tokens.weight",
            "model.decoder.embed_positions.weight": "model.wpe.weight",
            "model.decoder.final_layer_norm.weight": "model.norm.weight",
            "model.decoder.final_layer_norm.bias": "model.norm.bias",
        }
        out = {}
        for name, arr in tensors.items():
            if name in ren:
                out[ren[name]] = arr
                continue
            if name == "lm_head.weight":
                continue
            name = (
                name.replace("model.decoder.layers.", "model.layers.")
                .replace(".self_attn.out_proj.", ".self_attn.o_proj.")
                .replace(".self_attn_layer_norm.", ".input_layernorm.")
                .replace(".final_layer_norm.", ".post_attention_layernorm.")
                .replace(".fc1.", ".mlp.c_fc.")
                .replace(".fc2.", ".mlp.c_proj.")
            )
            out[name] = arr
        return out
