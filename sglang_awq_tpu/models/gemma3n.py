"""Gemma3n (MatFormer-era: AltUp + LAuReL + per-layer embeddings + KV
sharing + activation sparsity), TPU-native, text model.

Role model: reference `python/sglang/srt/models/gemma3n_causal.py`
(Gemma3nAltUp :171, Gemma3nLaurelBlock :132, per-layer inputs :628,
KV sharing :313 `kv_shared_layer_index`) — behavior cross-checked against
transformers' Gemma3nForCausalLM (the HF parity target of the tests).

Architecture notes (all exact-form, verified against HF):

* The residual stream is an AltUp STACK [A, T, H] (A = altup_num_inputs).
  predict: per-token [A x A] coefficient matrices from a tanh'd modality
  router mix the stack; the layer body runs on the active row only;
  correct: per-token per-row scalars propagate the innovation back.
* LAuReL: low-rank residual `x + norm(Wr(Wl(x)))` combined with the
  attention output as `(attn_gated + laurel) / sqrt(2)`.
* Per-layer embeddings: a second (scaled) embedding table gives each
  layer a [T, Ple] input; it gates the corrected active row through
  `gelu(x @ W_gate) * ple @ W_proj` and feeds rows 1.. of the stack.
* KV SHARING: the last `num_kv_shared_layers` layers compute NO k/v —
  they attend the pages of the last non-shared layer of their own
  sliding/full type.  Only the first `first_kv_shared` layers own pool
  pages (config.num_kv_layers shrinks accordingly).
* Attention: q/k RMS-normed per head (v normed WITHOUT scale), scores
  UNSCALED (scaling = 1.0), dual rope (local theta on sliding layers),
  5:1 sliding pattern.
* MLP: per-layer activation sparsity — gate activations keep only the
  (1 - sparsity) Gaussian tail: relu(gate - (mean + std * icdf(s)))
  before the tanh-GELU.
* Norm weights are PLAIN (ones-init, no Gemma (1+w) fold); the embed
  scale is sqrt(H) ROUNDED TO BF16 (HF quirk).

The layer walk is unrolled (python branch per layer: window literal,
shared/writing, sparsity constant).  v1 scope: tp=1/pp=1, no LoRA /
speculative / input_embeds.
"""

from __future__ import annotations

import dataclasses
from statistics import NormalDist
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope, rope_table
from sglang_awq_tpu.mem_cache.kv_pool import write_kv
from sglang_awq_tpu.models.llama import LlamaForCausalLM
from sglang_awq_tpu.ops.ragged_attention import (
    ragged_decode,
    ragged_decode_xla,
    ragged_extend,
    ragged_extend_xla,
)
from sglang_awq_tpu.utils import is_tpu_backend


def _rsqrt_mean_sq(x, eps=0.0):
    m = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
    return jnp.sqrt(jnp.maximum(m, eps)) if eps else jnp.sqrt(m)


@dataclasses.dataclass
class Gemma3nForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        c = self.config
        hf = c.hf_config
        assert self.tp_size == 1 and self.pp_size == 1, (
            "gemma3n v1 runs tp=1/pp=1")
        L = c.num_layers
        H = c.hidden_size
        # HF quirk: sqrt(H) is materialized in bf16 (3072 -> 55.5)
        self.embed_multiplier = float(jnp.bfloat16(float(H) ** 0.5))
        self.mlp_act = "gelu"
        self.final_softcap = float(hf.get("final_logit_softcapping") or 0.0)
        self.altup_n = int(hf.get("altup_num_inputs", 4))
        self.altup_active = int(hf.get("altup_active_idx", 0))
        self.altup_correct_scale = bool(hf.get("altup_correct_scale", True))
        self.laurel_rank = int(hf.get("laurel_rank", 64))
        self.ple = int(hf.get("hidden_size_per_layer_input", 256))
        self.vpl = int(hf.get("vocab_size_per_layer_input", c.vocab_size))
        self.ple_scale = float(jnp.bfloat16(float(self.ple) ** 0.5))
        inter = hf["intermediate_size"]
        if isinstance(inter, (list, tuple)):
            assert len(set(inter)) == 1, (
                "gemma3n v1: uniform per-layer intermediate_size (MatFormer "
                "slices with mixed widths not supported yet)")
            self.inter = int(inter[0])
        else:
            self.inter = int(inter)
        sp = hf.get("activation_sparsity_pattern") or [0.0] * L
        self.sparsity = [float(s) for s in sp]
        # layer types + KV sharing map
        lt = hf.get("layer_types")
        if not lt:
            pattern = int(hf.get("sliding_window_pattern", 5))
            lt = ["full_attention" if (i + 1) % pattern == 0
                  else "sliding_attention" for i in range(L)]
        self.layer_types = list(lt)
        sw = int(hf.get("sliding_window") or 0)
        self.layer_windows = tuple(
            sw if t == "sliding_attention" else 0 for t in lt)
        self.local_rope_theta = float(hf.get("rope_local_base_freq", 10000.0))
        n_shared = int(hf.get("num_kv_shared_layers", 0))
        first_shared = L - n_shared
        self.kv_map = []
        for l in range(L):
            if n_shared and l >= first_shared:
                prev = [i for i in range(first_shared)
                        if lt[i] == lt[l]]
                self.kv_map.append(prev[-1])
            else:
                self.kv_map.append(l)
        self.writes_kv = [l < first_shared or n_shared == 0
                         for l in range(L)]
        c.num_kv_layers = first_shared if n_shared else L
        # specs (replace llama's): big linears quantizable, addenda plain
        q = c.quant_config
        D = self.head_dim
        self.specs = {
            "qkv": LinearSpec.make(
                "qkv", H, (self.qh + 2 * self.kvh) * D, q, None),
            "o": LinearSpec.make("o", self.qh * D, H, q, None),
            "gate_up": LinearSpec.make("gate_up", H, 2 * self.inter, q, None),
            "down": LinearSpec.make("down", self.inter, H, q, None),
            "laurel_l": LinearSpec.make(
                "laurel_l", H, self.laurel_rank, None, None),
            "laurel_r": LinearSpec.make(
                "laurel_r", self.laurel_rank, H, None, None),
            "plg": LinearSpec.make("plg", H, self.ple, None, None),
            "plp": LinearSpec.make("plp", self.ple, H, None, None),
        }

    @property
    def swa_ring_eligible(self) -> bool:
        # SWA page rings assume every layer owns its pages; gemma3n's KV
        # sharing reads ANOTHER layer's pool — plain per-layer windows v1
        return False

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H, V = c.num_layers, c.hidden_size, c.vocab_size
        A, D = self.altup_n, self.head_dim
        shapes: Dict[str, Any] = {
            "embed": {"weight": ((V, H), jnp.bfloat16)},
            "layers": {
                "input_norm": ((L, H), jnp.float32),
                "post_attn_norm": ((L, H), jnp.float32),
                "pre_ffw_norm": ((L, H), jnp.float32),
                "post_ffw_norm": ((L, H), jnp.float32),
                "q_norm": ((L, D), jnp.float32),
                "k_norm": ((L, D), jnp.float32),
                "laurel_norm": ((L, H), jnp.float32),
                "ple_norm": ((L, H), jnp.float32),
                "router_norm": ((L, H), jnp.float32),
                "router_w": ((L, H, A), jnp.float32),
                "pred_w": ((L, A, A * A), jnp.float32),
                "corr_w": ((L, A, A), jnp.float32),
                "correct_scale": ((L, H), jnp.float32),
            },
            "final_norm": ((H,), jnp.float32),
            "lm_head": {"weight": ((H, V), jnp.bfloat16)},
        }
        # model-level extras ride the layers dict (the loader's only
        # extension hook); keys can't collide with per-layer stacks
        shapes["layers"]["embed_ple"] = (
            (self.vpl, L * self.ple), jnp.bfloat16)
        shapes["layers"]["plm_proj"] = ((H, L * self.ple), jnp.bfloat16)
        shapes["layers"]["plm_norm"] = ((self.ple,), jnp.float32)
        shapes["layers"]["altup_proj"] = ((A - 1, H, H), jnp.bfloat16)
        shapes["layers"]["altup_unembed"] = ((A - 1, H, H), jnp.bfloat16)
        for name, spec in self.specs.items():
            shapes["layers"][name] = spec.param_shapes(L)
        return shapes

    def merge_schema(self) -> Dict[str, tuple]:
        return {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "gate_up": (["mlp.gate_proj", "mlp.up_proj"], "n"),
            "down": (["mlp.down_proj"], "n"),
            "laurel_l": (["laurel.linear_left"], "n"),
            "laurel_r": (["laurel.linear_right"], "n"),
            "plg": (["per_layer_input_gate"], "n"),
            "plp": (["per_layer_projection"], "n"),
        }

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        def stack(name, dt=jnp.float32, tr=False):
            arrs = [np.asarray(t(f"model.layers.{l}.{name}"))
                    for l in range(L)]
            if tr:
                arrs = [a.T for a in arrs]
            return jnp.asarray(np.stack(arrs), dt)

        out = {
            "pre_ffw_norm": stack("pre_feedforward_layernorm.weight"),
            "post_ffw_norm": stack("post_feedforward_layernorm.weight"),
            "q_norm": stack("self_attn.q_norm.weight"),
            "k_norm": stack("self_attn.k_norm.weight"),
            "laurel_norm": stack("laurel.post_laurel_norm.weight"),
            "ple_norm": stack("post_per_layer_input_norm.weight"),
            "router_norm": stack("altup.router_norm.weight"),
            # torch Linear [out, in] -> [in, out] for right-matmuls
            "router_w": stack("altup.modality_router.weight", tr=True),
            "pred_w": stack("altup.prediction_coefs.weight", tr=True),
            "corr_w": stack("altup.correction_coefs.weight", tr=True),
            "correct_scale": stack("altup.correct_output_scale"),
        }
        A = self.altup_n
        out["embed_ple"] = jnp.asarray(
            t("model.embed_tokens_per_layer.weight"), jnp.bfloat16)
        out["plm_proj"] = jnp.asarray(
            np.asarray(t("model.per_layer_model_projection.weight")).T,
            jnp.bfloat16)
        out["plm_norm"] = jnp.asarray(
            t("model.per_layer_projection_norm.weight"), jnp.float32)
        out["altup_proj"] = jnp.asarray(np.stack([
            np.asarray(t(f"model.altup_projections.{i}.weight")).T
            for i in range(A - 1)
        ]), jnp.bfloat16)
        out["altup_unembed"] = jnp.asarray(np.stack([
            np.asarray(t(f"model.altup_unembed_projections.{i}.weight")).T
            for i in range(A - 1)
        ]), jnp.bfloat16)
        return out

    def postprocess_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        # rename llama's default norm keys to gemma3n's; weights stay PLAIN
        lp = params["layers"]
        lp["post_attn_norm"] = lp.pop("post_norm")
        return params

    # ------------------------------------------------------------------
    # rope: [2, S, D] — row 0 global theta, row 1 local
    # ------------------------------------------------------------------

    def rope(self) -> jax.Array:
        c = self.config
        g = rope_table(c.context_length, self.head_dim, c.rope_theta,
                       c.rope_scaling, trained_max=c.max_position_embeddings)
        lo = rope_table(c.context_length, self.head_dim,
                        self.local_rope_theta, None,
                        trained_max=c.max_position_embeddings)
        return jnp.stack([g, lo])

    # ------------------------------------------------------------------
    # layer math
    # ------------------------------------------------------------------

    def _router(self, lp, l, x):
        c = self.config
        ri = rms_norm(x.astype(jnp.float32), lp["router_norm"][l],
                      c.rms_norm_eps) * (1.0 / c.hidden_size)
        return jnp.tanh(jnp.dot(ri, lp["router_w"][l],
                                preferred_element_type=jnp.float32))

    def _altup_predict(self, lp, l, h4):
        A = self.altup_n
        T = h4.shape[1]
        mods = self._router(lp, l, h4[self.altup_active])  # [T, A]
        raw = jnp.dot(mods, lp["pred_w"][l]).reshape(T, A, A)
        # pred[b] = sum_a h4[a] * raw[:, b, a] + h4[b]
        pred = jnp.einsum("ath,tba->bth", h4.astype(jnp.float32), raw)
        return (pred + h4.astype(jnp.float32)).astype(h4.dtype)

    def _altup_correct(self, lp, l, pred, activated):
        mods = self._router(lp, l, activated)  # [T, A]
        cc = jnp.dot(mods, lp["corr_w"][l]) + 1.0  # [T, A]
        innov = (activated.astype(jnp.float32)
                 - pred[self.altup_active].astype(jnp.float32))  # [T, H]
        corr = pred.astype(jnp.float32) + innov[None] * jnp.transpose(
            cc)[:, :, None]
        return corr.astype(pred.dtype)

    def _mlp_g3n(self, lp, h2, l):
        gu = linear_apply(self.specs["gate_up"], lp["gate_up"], h2, l)
        gate, up = jnp.split(gu, 2, axis=-1)
        s = self.sparsity[l]
        if s > 0.0:
            gf = gate.astype(jnp.float32)
            mu = jnp.mean(gf, axis=-1, keepdims=True)
            std = jnp.sqrt(jnp.mean((gf - mu) ** 2, axis=-1, keepdims=True))
            cutoff = mu + std * NormalDist().inv_cdf(s)
            gate = jax.nn.relu(gf - cutoff).astype(gate.dtype)
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
        act = (act * up.astype(jnp.float32)).astype(jnp.bfloat16)
        return linear_apply(self.specs["down"], lp["down"], act, l)

    def _walk(self, params, x0, positions, rope2, pli, attn_of):
        """x0 [T, H] scaled embeds; pli [T, L, Ple]; -> final hidden."""
        c = self.config
        lp = params["layers"]
        A = self.altup_n
        eps = c.rms_norm_eps
        # altup stack init: magnitude-matched projections of row 0
        tm = _rsqrt_mean_sq(x0)  # [T, 1] target magnitude
        rows = [x0]
        for i in range(A - 1):
            p = jnp.dot(x0, params["layers"]["altup_proj"][i],
                        preferred_element_type=jnp.float32)
            p = p.astype(x0.dtype).astype(jnp.float32)
            nm = _rsqrt_mean_sq(p, eps=1e-5)
            rows.append((p * tm / nm).astype(x0.dtype))
        h4 = jnp.stack(rows)  # [A, T, H]

        for l in range(c.num_layers):
            pred = self._altup_predict(lp, l, h4)
            active = pred[self.altup_active]
            an = rms_norm(active, lp["input_norm"][l], eps)
            lr = linear_apply(self.specs["laurel_l"], lp["laurel_l"], an, l)
            lr = linear_apply(self.specs["laurel_r"], lp["laurel_r"], lr, l)
            laurel = an.astype(jnp.float32) + rms_norm(
                lr, lp["laurel_norm"][l], eps).astype(jnp.float32)
            attn_o = attn_of(an, l)  # [T, H] (post o-proj)
            attn_o = rms_norm(attn_o, lp["post_attn_norm"][l], eps)
            attn_gated = active.astype(jnp.float32) + attn_o.astype(
                jnp.float32)
            attn_laurel = ((attn_gated + laurel)
                           * (2.0 ** -0.5)).astype(x0.dtype)
            h2 = rms_norm(attn_laurel, lp["pre_ffw_norm"][l], eps)
            ffw = self._mlp_g3n(lp, h2, l)
            ffw = rms_norm(ffw, lp["post_ffw_norm"][l], eps)
            out_act = (attn_laurel.astype(jnp.float32)
                       + ffw.astype(jnp.float32)).astype(x0.dtype)
            corr = self._altup_correct(lp, l, pred, out_act)
            first = corr[self.altup_active]
            if self.altup_correct_scale:
                first = (first.astype(jnp.float32)
                         * lp["correct_scale"][l]).astype(first.dtype)
            g = linear_apply(self.specs["plg"], lp["plg"], first, l)
            g = jax.nn.gelu(g.astype(jnp.float32), approximate=True)
            g = (g * pli[:, l].astype(jnp.float32)).astype(jnp.bfloat16)
            g = linear_apply(self.specs["plp"], lp["plp"], g, l)
            g = rms_norm(g, lp["ple_norm"][l], eps)
            corr = jnp.concatenate([
                corr[:1],
                (corr[1:].astype(jnp.float32)
                 + g.astype(jnp.float32)[None]).astype(corr.dtype),
            ])
            h4 = corr

        # unembed: magnitude-matched mean over the stack
        tm = _rsqrt_mean_sq(h4[0])
        rows = [h4[0].astype(jnp.float32)]
        for i in range(A - 1):
            p = jnp.dot(h4[i + 1], params["layers"]["altup_unembed"][i],
                        preferred_element_type=jnp.float32)
            p = p.astype(x0.dtype).astype(jnp.float32)
            nm = _rsqrt_mean_sq(p, eps=1e-5)
            rows.append(p * tm / nm)
        return jnp.mean(jnp.stack(rows), axis=0).astype(x0.dtype)

    def _per_layer_inputs(self, params, tokens, x0):
        c = self.config
        L = c.num_layers
        T = x0.shape[0]
        tok = jnp.where(tokens < self.vpl, tokens, 0)
        ple = (params["layers"]["embed_ple"][tok].astype(jnp.float32)
               * self.ple_scale).reshape(T, L, self.ple)
        proj = jnp.dot(x0, params["layers"]["plm_proj"],
                       preferred_element_type=jnp.float32)
        proj = proj * (float(c.hidden_size) ** -0.5)
        proj = proj.reshape(T, L, self.ple).astype(x0.dtype)
        proj = rms_norm(proj, params["layers"]["plm_norm"], c.rms_norm_eps)
        return ((proj.astype(jnp.float32) + ple)
                * (2.0 ** -0.5)).astype(x0.dtype)

    def _qkv_heads(self, lp, h, l, rope2, positions, shared: bool):
        D = self.head_dim
        c = self.config
        T = h.shape[0]
        tab = rope2[1 if self.layer_windows[l] else 0]
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        q = qkv[:, : self.qh * D].reshape(T, self.qh, D)
        q = rms_norm(q, lp["q_norm"][l], c.rms_norm_eps)
        if shared:
            q, _ = apply_rope(q, q[:, :1], positions, tab)
            return q, None, None
        k = qkv[:, self.qh * D : (self.qh + self.kvh) * D].reshape(
            T, self.kvh, D)
        v = qkv[:, (self.qh + self.kvh) * D :].reshape(T, self.kvh, D)
        k = rms_norm(k, lp["k_norm"][l], c.rms_norm_eps)
        v = rms_norm(v, jnp.ones((D,), jnp.float32), c.rms_norm_eps)
        q, k = apply_rope(q, k, positions, tab)
        return q, k, v

    def _logits(self, params, h):
        logits = super()._logits(params, h)
        if self.final_softcap:
            logits = self.final_softcap * jnp.tanh(
                logits / self.final_softcap)
        return logits

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------

    def decode_step(self, params, kv, rope2, tokens, positions, slots,
                    page_table, lengths, lora_idx=None, state_rows=None):
        assert lora_idx is None, "LoRA on gemma3n: not supported"
        del state_rows
        lp = params["layers"]
        use_xla = not is_tpu_backend()
        x0 = self._embed(params, tokens)
        pli = self._per_layer_inputs(params, tokens, x0)
        state = {"kv": kv}

        def attn_of(an, l):
            shared = not self.writes_kv[l]
            kvl = self.kv_map[l]
            q, k, v = self._qkv_heads(lp, an, l, rope2, positions, shared)
            if not shared:
                state["kv"] = write_kv(state["kv"], k, v, slots, kvl,
                                       mode="decode")
            fn = ragged_decode_xla if use_xla else ragged_decode
            out = fn(
                q[:, None], state["kv"], page_table, lengths, kvl,
                sm_scale=1.0, window=int(self.layer_windows[l]),
            )[:, 0]
            out = out.reshape(an.shape[0], self.qh * self.head_dim)
            return linear_apply(
                self.specs["o"], lp["o"], out.astype(jnp.bfloat16), l)

        h = self._walk(params, x0, positions, rope2, pli, attn_of)
        return self._logits(params, h), state["kv"]

    def extend_step(self, params, kv, rope2, tokens, positions, slots,
                    page_table, kv_lens, q_lens, qb_base, block_q=128,
                    return_hidden=False, capture_hidden=False,
                    lora_idx=None, input_embeds=None, state_rows=None,
                    state_ckpt=None):
        assert lora_idx is None and input_embeds is None, (
            "gemma3n extend v1: no LoRA / input_embeds")
        assert not capture_hidden, "gemma3n + EAGLE: not supported"
        del state_rows, state_ckpt
        lp = params["layers"]
        use_xla = not is_tpu_backend()
        TQ = tokens.shape[0]
        x0 = self._embed(params, tokens)
        pli = self._per_layer_inputs(params, tokens, x0)
        state = {"kv": kv}

        def attn_of(an, l):
            shared = not self.writes_kv[l]
            kvl = self.kv_map[l]
            q, k, v = self._qkv_heads(lp, an, l, rope2, positions, shared)
            if not shared:
                state["kv"] = write_kv(state["kv"], k, v, slots, kvl,
                                       mode="prefill")
            fn = ragged_extend_xla if use_xla else ragged_extend
            out = fn(
                q, state["kv"], page_table, kv_lens, q_lens, qb_base, kvl,
                sm_scale=1.0, block_q=block_q,
                window=int(self.layer_windows[l]),
            )
            out = out.reshape(TQ, self.qh * self.head_dim)
            return linear_apply(
                self.specs["o"], lp["o"], out.astype(jnp.bfloat16), l)

        h = self._walk(params, x0, positions, rope2, pli, attn_of)
        last = jnp.clip(
            qb_base * block_q + jnp.maximum(q_lens, 1) - 1, 0, TQ - 1)
        h_last = h[last]
        if return_hidden:
            return self._final_norm(params, h_last).astype(jnp.float32), \
                state["kv"]
        return self._logits(params, h_last), state["kv"]
