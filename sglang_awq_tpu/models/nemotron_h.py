"""NVIDIA Nemotron-H (per-layer Mamba2 / attention / MLP components).

Role model: reference `python/sglang/srt/models/nemotron_h.py` +
`srt/configs/nemotron_h.py` (hybrid_override_pattern: each layer is ONE
component — 'M' Mamba2 mixer, '*' attention, '-' ReLU^2 MLP — behind a
single RMSNorm and a residual add; no rotary embeddings anywhere: the
mamba layers carry position information).

The Mamba2 mixer is inherited from models/falcon_h1.py (whose numerics
are HF-logit-verified); Nemotron-H runs it with unit mup multipliers and
the group-wise gated RMSNorm.  Attention layers are Nemotron-H-style
(GQA, no rope, no qk norm); only '*' layers own KV pages (ModelConfig
maps hybrid_override_pattern to num_kv_layers).  'E' (MoE) layers are
rejected in v1.

State pools, row lifecycle, batched segment-aware prefill with state
checkpoints: all shared with the falcon_h1/qwen3_next machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.models.falcon_h1 import FalconH1ForCausalLM


@dataclasses.dataclass
class NemotronHForCausalLM(FalconH1ForCausalLM):
    use_rope: bool = False

    def __post_init__(self):
        hf = self.config.hf_config
        self.pattern = str(hf["hybrid_override_pattern"])
        assert len(self.pattern) == int(
            hf.get("num_hidden_layers", hf.get("n_layer"))
        ), (self.pattern, hf.get("num_hidden_layers"))
        assert "E" not in self.pattern, "Nemotron-H MoE layers: not yet"
        assert set(self.pattern) <= set("M*-"), self.pattern
        # translate Nemotron-H config keys into the falcon_h1 mixer's
        # vocabulary before the base init reads them
        m_heads = int(hf.get("mamba_num_heads"))
        m_p = int(hf.get("mamba_head_dim"))
        hf.setdefault("mamba_d_ssm", m_heads * m_p)
        hf.setdefault("mamba_n_heads", m_heads)
        hf.setdefault("mamba_n_groups",
                      hf.get("n_groups", hf.get("mamba_n_groups", 8)))
        hf.setdefault("mamba_d_state", hf.get("ssm_state_size", 128))
        hf.setdefault("mamba_d_conv", hf.get("conv_kernel", 4))
        hf.setdefault("mamba_conv_bias", hf.get("use_conv_bias", True))
        hf.setdefault("mamba_rms_norm", True)
        hf.setdefault("mamba_norm_before_gate", True)
        super().__post_init__()
        self.attn_layers = [i for i, c in enumerate(self.pattern) if c == "*"]
        self.mamba_layers = [i for i, c in enumerate(self.pattern)
                             if c == "M"]
        self.mlp_layers = [i for i, c in enumerate(self.pattern) if c == "-"]
        self._ai = {l: i for i, l in enumerate(self.attn_layers)}
        self._mi = {l: i for i, l in enumerate(self.mamba_layers)}
        self._pi = {l: i for i, l in enumerate(self.mlp_layers)}
        H, I = self.config.hidden_size, self.config.intermediate_size
        q = self.config.quant_config
        self.specs["up"] = LinearSpec.make("up", H, I, q, None)

    # ------------------------------------------------------------------
    # state pools: sized by the mamba-layer count only
    # ------------------------------------------------------------------

    def linear_state_bytes(self, rows: int) -> int:
        Lm = len(self.mamba_layers)
        return Lm * rows * (
            (self.conv_k - 1) * self.conv_dim * 2
            + self.m_heads * self.m_p * self.m_state * 4
        )

    def wrap_kv_state(self, pool, rows: int):
        Lm = len(self.mamba_layers)
        return {
            "pool": pool,
            "conv": jnp.zeros(
                (Lm, rows, self.conv_k - 1, self.conv_dim), jnp.bfloat16),
            "rec": jnp.zeros(
                (Lm, rows, self.m_heads, self.m_p, self.m_state),
                jnp.float32),
        }

    # ------------------------------------------------------------------
    # params (per-component stacks at virtual indices)
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H, V = c.num_layers, c.hidden_size, c.vocab_size
        La, Lm, Lp = (len(self.attn_layers), len(self.mamba_layers),
                      len(self.mlp_layers))
        shapes: Dict[str, Any] = {
            "embed": {"weight": ((V, H), jnp.bfloat16)},
            "layers": {"input_norm": ((L, H), jnp.float32)},
            "final_norm": ((H,), jnp.float32),
            "lm_head": {"weight": ((H, V), jnp.bfloat16)},
        }
        shapes["layers"]["qkv"] = self.specs["qkv"].param_shapes(La)
        shapes["layers"]["o"] = self.specs["o"].param_shapes(La)
        shapes["layers"]["up"] = self.specs["up"].param_shapes(Lp)
        shapes["layers"]["down"] = self.specs["down"].param_shapes(Lp)
        shapes["layers"]["m_in"] = self.specs["m_in"].param_shapes(Lm)
        shapes["layers"]["m_out"] = self.specs["m_out"].param_shapes(Lm)
        shapes["layers"]["conv_w"] = ((Lm, self.conv_k, self.conv_dim),
                                      jnp.float32)
        shapes["layers"]["conv_b"] = ((Lm, self.conv_dim), jnp.float32)
        shapes["layers"]["dt_bias"] = ((Lm, self.m_heads), jnp.float32)
        shapes["layers"]["a_log"] = ((Lm, self.m_heads), jnp.float32)
        shapes["layers"]["d_skip"] = ((Lm, self.m_heads), jnp.float32)
        shapes["layers"]["m_norm"] = ((Lm, self.m_inter), jnp.float32)
        return shapes

    def pretranslate_tensors(self, tensors):
        """backbone.layers.{l}.(norm|mixer).* -> per-component virtual
        stacks; also synthesizes the post_norm rows the generic loader
        insists on (unused by the walk)."""
        H = self.config.hidden_size
        out = {}
        for name, arr in tensors.items():
            n = name.replace("backbone.", "model.")
            n = n.replace("model.embeddings.", "model.embed_tokens.")
            n = n.replace("model.norm_f.", "model.norm.")
            if ".layers." in n:
                parts = n.split(".")
                l = int(parts[2])
                rest = ".".join(parts[3:])
                ch = self.pattern[l]
                if rest.startswith("norm."):
                    n = f"model.layers.{l}.input_layernorm.{parts[-1]}"
                elif ch == "*":
                    n = f"model.layers.{self._ai[l]}.self_attn." + rest[
                        len("mixer."):]
                elif ch == "M":
                    sub = rest[len("mixer."):]
                    if sub == "A":  # checkpoint stores A; the param is A_log
                        sub = "A_log"
                    n = f"model.layers.{self._mi[l]}.mamba." + sub
                else:
                    n = f"model.layers.{self._pi[l]}.mlp." + rest[
                        len("mixer."):]
            out[n] = arr
        # the generic loader stacks post_attention_layernorm over ALL
        # layers; Nemotron-H has one norm per layer — synthesize ones
        for l in range(self.config.num_layers):
            out.setdefault(
                f"model.layers.{l}.post_attention_layernorm.weight",
                np.ones((H,), np.float32))
        return out

    def merge_schema(self) -> Dict[str, tuple]:
        La, Lm, Lp = (len(self.attn_layers), len(self.mamba_layers),
                      len(self.mlp_layers))
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n", (0, La)),
            "o": (["self_attn.o_proj"], "n", (0, La)),
            "up": (["mlp.up_proj"], "n", (0, Lp)),
            "down": (["mlp.down_proj"], "n", (0, Lp)),
            "m_in": (["mamba.in_proj"], "n", (0, Lm)),
            "m_out": (["mamba.out_proj"], "n", (0, Lm)),
        }

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        Lm = len(self.mamba_layers)
        out: Dict[str, jax.Array] = {}
        if Lm == 0:
            ls = self.param_shapes()["layers"]
            for k in ("conv_w", "conv_b", "dt_bias", "a_log", "d_skip",
                      "m_norm"):
                shape, dt = ls[k]
                out[k] = jnp.zeros(shape, dt)
            return out
        out["conv_w"] = jnp.asarray(np.stack(
            [np.asarray(t(f"model.layers.{i}.mamba.conv1d.weight"))[:, 0, :].T
             for i in range(Lm)]), jnp.float32)
        out["conv_b"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.conv1d.bias") for i in range(Lm)]),
            jnp.float32)
        out["dt_bias"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.dt_bias") for i in range(Lm)]),
            jnp.float32)
        out["a_log"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.A_log") for i in range(Lm)]),
            jnp.float32)
        out["d_skip"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.D") for i in range(Lm)]), jnp.float32)
        out["m_norm"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.norm.weight") for i in range(Lm)]),
            jnp.float32)
        return out

    # ------------------------------------------------------------------
    # walk: one component per layer
    # ------------------------------------------------------------------

    def _relu2_mlp(self, lp, h, pi):
        up = linear_apply(self.specs["up"], lp["up"], h, pi)
        act = jnp.square(jax.nn.relu(up.astype(jnp.float32))).astype(
            jnp.bfloat16)
        return linear_apply(self.specs["down"], lp["down"], act, pi)

    def _walk(self, params, kv, rope_tab, x, positions, attn_of, mamba_of):
        c = self.config
        lp = params["layers"]
        for l in range(c.num_layers):
            h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
            ch = self.pattern[l]
            if ch == "M":
                o, conv, rec = mamba_of(lp, h, self._mi[l], kv["conv"],
                                        kv["rec"])
                kv = dict(kv, conv=conv, rec=rec)
                o = o.astype(jnp.float32)
            elif ch == "*":
                o, kv = attn_of(lp, h, self._ai[l], kv)
            else:
                o = self._relu2_mlp(lp, h, self._pi[l]).astype(jnp.float32)
            x = x + o.astype(x.dtype)
        return x, kv
