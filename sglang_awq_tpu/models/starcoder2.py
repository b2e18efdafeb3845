"""StarCoder2 causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/starcoder2.py`.
Differences from Llama, handled by overriding `_layer` / `_mlp` /
`_final_norm`:

* Full nn.LayerNorm (mean-centered, weight AND bias) for input/post/final
  norms — biases ride as extra stacked layer params.
* NON-gated MLP: `c_fc -> gelu(tanh) -> c_proj`, both with biases.
* Biases on every projection (`use_bias`); row-parallel biases (o_proj,
  c_proj) are added AFTER the TP psum so they are counted once.
* Uniform sliding window on every layer when `sliding_window` is set.
* Tied embeddings by default.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import layer_norm_bias
from sglang_awq_tpu.layers.rotary import apply_rope
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class Starcoder2ForCausalLM(LlamaForCausalLM):
    qkv_bias: bool = True

    def __post_init__(self):
        super().__post_init__()
        c = self.config
        hf = c.hf_config
        sw = int(hf.get("sliding_window") or 0)
        if sw:
            self.layer_windows = tuple(sw for _ in range(c.num_layers))
        q = c.quant_config
        H, I = c.hidden_size, c.intermediate_size
        # "gelu" = exact erf form; gelu_new / gelu_pytorch_tanh = tanh approx
        self.gelu_approx = hf.get("hidden_act", "gelu_pytorch_tanh") != "gelu"
        del self.specs["gate_up"], self.specs["down"]
        self.specs["fc"] = LinearSpec.make("fc", H, I, q, "column",
                                           self.tp_size)
        self.specs["cproj"] = LinearSpec.make("cproj", I, H, q, "row",
                                              self.tp_size)

    def merge_schema(self) -> Dict[str, tuple]:
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "fc": (["mlp.c_fc"], "n"),
            "cproj": (["mlp.c_proj"], "n"),
        }

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        def stack(name, dtype=jnp.float32):
            return jnp.asarray(
                np.stack([t(f"model.layers.{l}.{name}") for l in range(L)]),
                dtype,
            )

        return {
            "input_norm_bias": stack("input_layernorm.bias"),
            "post_norm_bias": stack("post_attention_layernorm.bias"),
            "final_norm_bias": jnp.asarray(t("model.norm.bias"), jnp.float32),
        }

    def _final_norm(self, params, h: jax.Array) -> jax.Array:
        return layer_norm_bias(
            h, params["final_norm"], params["layers"]["final_norm_bias"],
            self.config.rms_norm_eps,
        )

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        a = linear_apply(self.specs["fc"], lp["fc"], h2, l)
        if "bias" in lp["fc"]:
            a = a + lp["fc"]["bias"][l]
        a = jax.nn.gelu(
            a.astype(jnp.float32), approximate=self.gelu_approx
        ).astype(jnp.bfloat16)
        return linear_apply(self.specs["cproj"], lp["cproj"], a, l)

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,
        l: jax.Array,
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
        lora_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        c = self.config
        lp = params["layers"]
        T = x.shape[0]
        D = self.head_dim

        h = layer_norm_bias(x, lp["input_norm"][l], lp["input_norm_bias"][l],
                            c.rms_norm_eps)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        if "bias" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["bias"][l]
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        q, k = apply_rope(q, k, positions, rope_tab)

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        o = self._maybe_psum(o.astype(jnp.float32))
        if "bias" in lp["o"]:  # row-parallel: bias once, after the psum
            o = o + lp["o"]["bias"][l].astype(jnp.float32)
        x = x + o.astype(x.dtype)

        h2 = layer_norm_bias(x, lp["post_norm"][l], lp["post_norm_bias"][l],
                             c.rms_norm_eps)
        d = self._mlp(lp, h2, l)
        d = self._maybe_psum(d.astype(jnp.float32))
        if "bias" in lp["cproj"]:
            d = d + lp["cproj"]["bias"][l].astype(jnp.float32)
        x = x + d.astype(x.dtype)
        return x


@dataclasses.dataclass
class NemotronForCausalLM(Starcoder2ForCausalLM):
    """Nemotron: the StarCoder2 graph shape with LayerNorm1P ((1+w) folded
    at load), a squared-ReLU non-gated MLP (up_proj -> relu^2 ->
    down_proj), partial rotary (partial_rotary_factor=0.5 — handled
    generically by the narrow rope table in layers/rotary.py), and no
    projection biases.  Role model: reference
    `python/sglang/srt/models/nemotron.py` (family coverage)."""

    qkv_bias: bool = False

    def merge_schema(self) -> Dict[str, tuple]:
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "fc": (["mlp.up_proj"], "n"),
            "cproj": (["mlp.down_proj"], "n"),
        }

    def postprocess_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """LayerNorm1P: fold the (1 + w) convention into the weights."""
        lp = params["layers"]
        for key in list(lp):
            if key.endswith("norm"):
                lp[key] = lp[key] + 1.0
        params["final_norm"] = params["final_norm"] + 1.0
        return params

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        a = linear_apply(self.specs["fc"], lp["fc"], h2, l)
        if "bias" in lp["fc"]:
            a = a + lp["fc"]["bias"][l]
        a = jnp.square(jax.nn.relu(a.astype(jnp.float32))).astype(jnp.bfloat16)
        return linear_apply(self.specs["cproj"], lp["cproj"], a, l)


@dataclasses.dataclass
class PhiForCausalLM(Starcoder2ForCausalLM):
    """Phi-1.5 / Phi-2.  Role model: reference
    `python/sglang/srt/models/phi.py`.  PARALLEL residual like Command-R
    (one biased input LayerNorm feeds attention AND MLP, single combined
    psum) but with Llama-style half-split PARTIAL rotary
    (partial_rotary_factor, generic in layers/rotary.py), biases on every
    projection including lm_head, and gelu_new fc1/fc2 MLP.  Checkpoint
    quirks handled in pretranslate: `self_attn.dense` is o_proj,
    `final_layernorm` is the final norm, and the missing
    post_attention_layernorm slot gets unit/zero weights."""

    def __post_init__(self):
        super().__post_init__()
        assert not self.config.hf_config.get("qk_layernorm", False), (
            "phi qk_layernorm variant not wired"
        )

    def merge_schema(self) -> Dict[str, tuple]:
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.dense"], "n"),
            "fc": (["mlp.fc1"], "n"),
            "cproj": (["mlp.fc2"], "n"),
        }

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        out = {}
        for name, arr in tensors.items():
            out[name.replace("model.final_layernorm.", "model.norm.")] = arr
        for l in range(c.num_layers):
            out[f"model.layers.{l}.post_attention_layernorm.weight"] = (
                np.ones(c.hidden_size, np.float32)
            )
            out[f"model.layers.{l}.post_attention_layernorm.bias"] = (
                np.zeros(c.hidden_size, np.float32)
            )
        return out

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        out = super().extra_layer_params(t, L)
        out["lm_head_bias"] = jnp.asarray(t("lm_head.bias"), jnp.float32)
        return out

    def _logits(self, params, h: jax.Array) -> jax.Array:
        return super()._logits(params, h) + params["layers"]["lm_head_bias"]

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,
        l: jax.Array,
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
        lora_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        c = self.config
        lp = params["layers"]
        T = x.shape[0]
        D = self.head_dim

        h = layer_norm_bias(x, lp["input_norm"][l], lp["input_norm_bias"][l],
                            c.rms_norm_eps)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        if "bias" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["bias"][l]
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        q, k = apply_rope(q, k, positions, rope_tab)

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        d = self._mlp(lp, h, l)

        both = self._maybe_psum(o.astype(jnp.float32) + d.astype(jnp.float32))
        if "bias" in lp["o"]:  # row-parallel biases once, after the psum
            both = both + lp["o"]["bias"][l].astype(jnp.float32)
        if "bias" in lp["cproj"]:
            both = both + lp["cproj"]["bias"][l].astype(jnp.float32)
        return x + both.astype(x.dtype)


@dataclasses.dataclass
class StableLmForCausalLM(LlamaForCausalLM):
    """StableLM (3B/2-1.6B base variants).  Role model: reference
    `python/sglang/srt/models/stablelm.py`.  The Llama graph with biased
    LayerNorms (weights + biases ride the StarCoder2 loading pattern),
    partial rotary (partial_rotary_factor, e.g. 0.25), gated silu MLP,
    and optional qkv biases (use_qkv_bias).  The parallel-residual and
    qk_layernorm variants are asserted off for v1."""

    def __post_init__(self):
        hf = self.config.hf_config
        self.qkv_bias = bool(hf.get("use_qkv_bias", False))
        super().__post_init__()
        assert not hf.get("use_parallel_residual", False), (
            "stablelm parallel-residual variant not wired"
        )
        assert not hf.get("qk_layernorm", False), (
            "stablelm qk_layernorm variant not wired"
        )

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        def stack(name):
            return jnp.asarray(
                np.stack([t(f"model.layers.{l}.{name}") for l in range(L)]),
                jnp.float32,
            )

        return {
            "input_norm_bias": stack("input_layernorm.bias"),
            "post_norm_bias": stack("post_attention_layernorm.bias"),
            "final_norm_bias": jnp.asarray(t("model.norm.bias"), jnp.float32),
        }

    def _final_norm(self, params, h: jax.Array) -> jax.Array:
        return layer_norm_bias(
            h, params["final_norm"], params["layers"]["final_norm_bias"],
            self.config.rms_norm_eps,
        )

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,
        l: jax.Array,
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
        lora_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        c = self.config
        lp = params["layers"]
        T = x.shape[0]
        D = self.head_dim

        h = layer_norm_bias(x, lp["input_norm"][l], lp["input_norm_bias"][l],
                            c.rms_norm_eps)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        if "bias" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["bias"][l]
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        q, k = apply_rope(q, k, positions, rope_tab)

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        x = x + self._maybe_psum(o.astype(jnp.float32)).astype(x.dtype)

        h2 = layer_norm_bias(x, lp["post_norm"][l], lp["post_norm_bias"][l],
                             c.rms_norm_eps)
        d = self._mlp(lp, h2, l)
        x = x + self._maybe_psum(d.astype(jnp.float32)).astype(x.dtype)
        return x


@dataclasses.dataclass
class GPTNeoXForCausalLM(Starcoder2ForCausalLM):
    """GPT-NeoX / Pythia.  Role model: reference
    `python/sglang/srt/models/gpt_neox.py`.  PARALLEL residual with TWO
    norms — `x + attn(ln1(x)) + mlp(ln2(x))` (post_attention_layernorm
    feeds the MLP, unlike Cohere/Phi's shared norm) — partial rotary
    (rotary_pct), exact-erf gelu, biases everywhere.  The checkpoint's
    own naming (gpt_neox.*, embed_in/embed_out, fused per-head-interleaved
    query_key_value) is translated to canonical names up front, including
    the [heads, 3, D] de-interleave of the fused qkv."""

    def __post_init__(self):
        hf = self.config.hf_config
        hf.setdefault("partial_rotary_factor", hf.get("rotary_pct", 1.0))
        super().__post_init__()
        self.parallel_residual = bool(hf.get("use_parallel_residual", True))

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        nh, D = c.num_attention_heads, self.head_dim
        ren = {
            "gpt_neox.embed_in.weight": "model.embed_tokens.weight",
            "gpt_neox.final_layer_norm.weight": "model.norm.weight",
            "gpt_neox.final_layer_norm.bias": "model.norm.bias",
            "embed_out.weight": "lm_head.weight",
        }
        out = {}
        for name, arr in tensors.items():
            if name in ren:
                out[ren[name]] = arr
                continue
            name = name.replace("gpt_neox.layers.", "model.layers.")
            if name.endswith("attention.query_key_value.weight"):
                base = name[: -len("attention.query_key_value.weight")]
                w = arr.reshape(nh, 3, D, -1)  # per-head [q|k|v] rows
                out[base + "self_attn.q_proj.weight"] = w[:, 0].reshape(
                    nh * D, -1
                )
                out[base + "self_attn.k_proj.weight"] = w[:, 1].reshape(
                    nh * D, -1
                )
                out[base + "self_attn.v_proj.weight"] = w[:, 2].reshape(
                    nh * D, -1
                )
            elif name.endswith("attention.query_key_value.bias"):
                base = name[: -len("attention.query_key_value.bias")]
                b = arr.reshape(nh, 3, D)
                out[base + "self_attn.q_proj.bias"] = b[:, 0].reshape(-1)
                out[base + "self_attn.k_proj.bias"] = b[:, 1].reshape(-1)
                out[base + "self_attn.v_proj.bias"] = b[:, 2].reshape(-1)
            else:
                name = (
                    name.replace(".attention.dense.", ".self_attn.o_proj.")
                    .replace(".mlp.dense_h_to_4h.", ".mlp.c_fc.")
                    .replace(".mlp.dense_4h_to_h.", ".mlp.c_proj.")
                )
                out[name] = arr
        return out

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,
        l: jax.Array,
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
        lora_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        if not self.parallel_residual:
            return super()._layer(params, x, l, positions, rope_tab, attn_fn)
        c = self.config
        lp = params["layers"]
        T = x.shape[0]
        D = self.head_dim

        h1 = layer_norm_bias(x, lp["input_norm"][l], lp["input_norm_bias"][l],
                             c.rms_norm_eps)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h1, l)
        if "bias" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["bias"][l]
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        q, k = apply_rope(q, k, positions, rope_tab)
        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)

        h2 = layer_norm_bias(x, lp["post_norm"][l], lp["post_norm_bias"][l],
                             c.rms_norm_eps)
        d = self._mlp(lp, h2, l)

        both = self._maybe_psum(o.astype(jnp.float32) + d.astype(jnp.float32))
        if "bias" in lp["o"]:
            both = both + lp["o"]["bias"][l].astype(jnp.float32)
        if "bias" in lp["cproj"]:
            both = both + lp["cproj"]["bias"][l].astype(jnp.float32)
        return x + both.astype(x.dtype)


def _nonparametric_ln(x: jax.Array) -> jax.Array:
    """OLMo v1's LayerNorm: mean-centered, NO weight/bias, eps pinned to
    1e-5 regardless of config (HF OlmoLayerNorm)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    return (xc * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)


@dataclasses.dataclass
class OlmoForCausalLM(LlamaForCausalLM):
    """OLMo v1.  Role model: reference `python/sglang/srt/models/olmo.py`.
    The Llama graph with NON-PARAMETRIC LayerNorms (no weight/bias, eps
    1e-5) and optional clip_qkv clamping of the fused projection; the
    loader's norm slots are satisfied with unit weights that the layer
    body never reads."""

    def __post_init__(self):
        super().__post_init__()
        cq = self.config.hf_config.get("clip_qkv")
        self.clip_qkv = float(cq) if cq is not None else 0.0

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        c = self.config
        out = dict(tensors)
        ones = np.ones(c.hidden_size, np.float32)
        for l in range(c.num_layers):
            out[f"model.layers.{l}.input_layernorm.weight"] = ones
            out[f"model.layers.{l}.post_attention_layernorm.weight"] = ones
        out["model.norm.weight"] = ones
        return out

    def _final_norm(self, params, h: jax.Array) -> jax.Array:
        return _nonparametric_ln(h)

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,
        l: jax.Array,
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
        lora_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        lp = params["layers"]
        T = x.shape[0]
        D = self.head_dim

        h = _nonparametric_ln(x)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        if self.clip_qkv:
            qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        q, k = apply_rope(q, k, positions, rope_tab)

        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        x = x + self._maybe_psum(o.astype(jnp.float32)).astype(x.dtype)

        h2 = _nonparametric_ln(x)
        d = self._mlp(lp, h2, l)
        x = x + self._maybe_psum(d.astype(jnp.float32)).astype(x.dtype)
        return x


@dataclasses.dataclass
class HeliumForCausalLM(LlamaForCausalLM):
    """Kyutai Helium.  Role model: reference model-zoo coverage.  The
    Llama graph verbatim except the rotary rotates INTERLEAVED (2i, 2i+1)
    feature pairs — handled by the base class's rope_interleaved
    permutation (dot-product-invariant, cache-safe)."""

    rope_interleaved: bool = True


@dataclasses.dataclass
class ArceeForCausalLM(LlamaForCausalLM):
    """Arcee AFM.  Role model: reference model-zoo coverage.  The Llama
    RMSNorm graph with a NON-gated squared-ReLU MLP (up_proj -> relu^2 ->
    down_proj), no biases."""

    def __post_init__(self):
        super().__post_init__()
        c = self.config
        q = c.quant_config
        del self.specs["gate_up"], self.specs["down"]
        self.specs["fc"] = LinearSpec.make(
            "fc", c.hidden_size, c.intermediate_size, q, "column",
            self.tp_size,
        )
        self.specs["cproj"] = LinearSpec.make(
            "cproj", c.intermediate_size, c.hidden_size, q, "row",
            self.tp_size,
        )

    def merge_schema(self) -> Dict[str, tuple]:
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "fc": (["mlp.up_proj"], "n"),
            "cproj": (["mlp.down_proj"], "n"),
        }

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        a = linear_apply(self.specs["fc"], lp["fc"], h2, l)
        a = jnp.square(jax.nn.relu(a.astype(jnp.float32))).astype(jnp.bfloat16)
        return linear_apply(self.specs["cproj"], lp["cproj"], a, l)


@dataclasses.dataclass
class SeedOssForCausalLM(LlamaForCausalLM):
    """ByteDance Seed-OSS.  Role model: reference model-zoo coverage.
    The Llama graph with qkv biases (attention_bias) and an o_proj bias
    (attention_out_bias) — the latter handled generically by the base
    layer (added once, after the TP psum)."""

    qkv_bias: bool = True


@dataclasses.dataclass
class Ernie4_5ForCausalLM(LlamaForCausalLM):
    """Baidu ERNIE 4.5 (dense).  Role model: reference model-zoo
    coverage.  The Llama graph with INTERLEAVED rotary pairs (the
    base-class rope_interleaved permutation) and optional use_bias on
    the projections; embeddings tied."""

    rope_interleaved: bool = True

    def __post_init__(self):
        self.qkv_bias = bool(self.config.hf_config.get("use_bias", False))
        super().__post_init__()
