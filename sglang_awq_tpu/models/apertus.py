"""Swiss AI Apertus causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/apertus.py`.  The Llama
pre-norm graph with:

* per-head q/k RMSNorm before RoPE (base qk_norm), llama3 rope scaling;
* NON-gated MLP with the xIELU activation (arXiv:2411.13010) — learnable
  per-layer alpha_p / alpha_n (softplus-parameterized), beta = 0.5,
  eps = -1e-6:
      x > 0:  softplus(a_p) * x^2 + beta * x
      x <= 0: (expm1(min(x, eps)) - x) * (beta + softplus(a_n)) + beta * x
* norm names attention_layernorm / feedforward_layernorm.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class ApertusForCausalLM(LlamaForCausalLM):
    qk_norm: bool = True

    def __post_init__(self):
        super().__post_init__()
        c = self.config
        q = c.quant_config
        del self.specs["gate_up"], self.specs["down"]
        self.specs["fc"] = LinearSpec.make(
            "fc", c.hidden_size, c.intermediate_size, q, "column",
            self.tp_size)
        self.specs["cproj"] = LinearSpec.make(
            "cproj", c.intermediate_size, c.hidden_size, q, "row",
            self.tp_size)
        self.xielu_beta = 0.5
        self.xielu_eps = -1e-6

    def merge_schema(self) -> Dict[str, tuple]:
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "fc": (["mlp.up_proj"], "n"),
            "cproj": (["mlp.down_proj"], "n"),
        }

    def pretranslate_tensors(
        self, tensors: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        out = {}
        for name, arr in tensors.items():
            out[
                name.replace(".attention_layernorm.", ".input_layernorm.")
                .replace(".feedforward_layernorm.",
                         ".post_attention_layernorm.")
            ] = arr
        return out

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        def stack(name):
            return jnp.asarray(
                np.stack([
                    np.asarray(t(f"model.layers.{l}.mlp.act_fn.{name}"))
                    .reshape(())
                    for l in range(L)
                ]), jnp.float32)

        return {"xielu_alpha_p": stack("alpha_p"),
                "xielu_alpha_n": stack("alpha_n")}

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L = self.config.num_layers
        shapes["layers"]["xielu_alpha_p"] = ((L,), jnp.float32)
        shapes["layers"]["xielu_alpha_n"] = ((L,), jnp.float32)
        return shapes

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        a = linear_apply(self.specs["fc"], lp["fc"], h2, l).astype(
            jnp.float32
        )
        beta, eps = self.xielu_beta, self.xielu_eps
        ap = jax.nn.softplus(lp["xielu_alpha_p"][l])
        an = beta + jax.nn.softplus(lp["xielu_alpha_n"][l])
        y = jnp.where(
            a > 0,
            ap * a * a + beta * a,
            (jnp.expm1(jnp.minimum(a, eps)) - a) * an + beta * a,
        )
        return linear_apply(
            self.specs["cproj"], lp["cproj"], y.astype(jnp.bfloat16), l
        )
