"""Falcon-H1 (parallel attention + Mamba2 SSM in every layer), TPU-native.

Role model: reference `python/sglang/srt/models/falcon_h1.py` (layer walk,
mup multipliers) + `srt/layers/attention/mamba/mamba.py` MambaMixer2; HF
numerics from `transformers/models/falcon_h1/modeling_falcon_h1.py`
(torch_forward — the naive SSD path our recurrence matches exactly).

Architecture: EVERY layer computes, from the same input-normed hidden,
  attn_out = attn(h * attention_in_multiplier) * attention_out_multiplier
  ssm_out  = mamba2(h * ssm_in_multiplier)     * ssm_out_multiplier
summed into the residual, then a pre_ff_layernorm + gated MLP whose gate
branch is scaled by mlp_multipliers[0] and output by mlp_multipliers[1].
Embeddings scale by embedding_multiplier, logits by lm_head_multiplier,
and k-projections by key_multiplier.

Mamba2 mixer (per layer, per token):
  [z | xBC | dt] = in_proj(h) * mup_vector      (ssm_multipliers blocks)
  xBC <- silu(causal_conv_K(xBC) + conv_bias)   (depthwise, K=4)
  x [H, P], B [G, N], C [G, N] = split(xBC); dt = softplus(dt + dt_bias)
  S_h <- S_h * exp(dt_h * A_h) + (dt_h * x_h) outer B_{g(h)}   (A = -e^{A_log})
  y_h = S_h . C_{g(h)} + D_h * x_h
  out = out_proj(rmsnorm-gated(y, z))           (or y * silu(z) when
                                                 mamba_rms_norm is false)

TPU state design mirrors models/qwen3_next.py: the SSM state lives in
row-indexed pools carried inside the kv pytree
    kv = {"pool": paged KV (every layer), "conv": [L, R, K-1, conv_dim],
          "rec": [L, R, H, P, N] f32}
with the row lifecycle shared with the sampling state.  Decode is a pure
recurrent step; extend runs a segment-aware lax.scan over the token-major
chunk buffer with per-sequence state reloads/stores and optional
state-checkpoint capture (the mamba-radix prefix-cache role).  v1 scope:
tp=1/pp=1, no speculative decoding (same as qwen3_next).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope
from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT, write_kv
from sglang_awq_tpu.models.llama import LlamaForCausalLM
from sglang_awq_tpu.ops.ragged_attention import (
    ragged_decode,
    ragged_decode_xla,
    ragged_extend,
    ragged_extend_xla,
)
from sglang_awq_tpu.utils import is_tpu_backend


@dataclasses.dataclass
class FalconH1ForCausalLM(LlamaForCausalLM):
    has_linear_state: bool = True
    use_rope: bool = True  # NemotronH subclass: attention without rope

    def __post_init__(self):
        super().__post_init__()
        c = self.config
        hf = c.hf_config
        assert self.tp_size == 1 and self.pp_size == 1, (
            "falcon_h1 v1 runs tp=1/pp=1 (state sharding lands with the "
            "mamba-pool TP story)")
        H = c.hidden_size
        self.m_inter = int(
            hf.get("mamba_d_ssm") or int(hf.get("mamba_expand", 2)) * H
        )
        self.m_heads = int(hf["mamba_n_heads"])
        self.m_groups = int(hf.get("mamba_n_groups", 1))
        self.m_state = int(hf.get("mamba_d_state", 256))
        self.conv_k = int(hf.get("mamba_d_conv", 4))
        self.m_p = self.m_inter // self.m_heads  # mamba head dim
        self.conv_dim = self.m_inter + 2 * self.m_groups * self.m_state
        self.m_rms = bool(hf.get("mamba_rms_norm", False))
        self.norm_before_gate = bool(hf.get("mamba_norm_before_gate", True))
        # mup multipliers (all default 1.0)
        self.mult_attn_in = float(hf.get("attention_in_multiplier", 1.0))
        self.mult_attn_out = float(hf.get("attention_out_multiplier", 1.0))
        self.mult_ssm_in = float(hf.get("ssm_in_multiplier", 1.0))
        self.mult_ssm_out = float(hf.get("ssm_out_multiplier", 1.0))
        self.mult_key = float(hf.get("key_multiplier", 1.0))
        self.mult_embed = float(hf.get("embedding_multiplier", 1.0))
        self.mult_lm_head = float(hf.get("lm_head_multiplier", 1.0))
        self.mult_mlp = [float(x) for x in hf.get("mlp_multipliers", [1, 1])]
        self.mult_zxbcdt = [
            float(x) for x in hf.get("ssm_multipliers", [1] * 5)
        ]
        self.specs["m_in"] = LinearSpec.make(
            "m_in", H, self.m_inter + self.conv_dim + self.m_heads,
            None, None)
        self.specs["m_out"] = LinearSpec.make(
            "m_out", self.m_inter, H, None, None)

    def _mup_vector(self) -> np.ndarray:
        z0, z1, z2, z3, z4 = self.mult_zxbcdt
        gn = self.m_groups * self.m_state
        v = np.ones(self.m_inter + self.conv_dim + self.m_heads, np.float32)
        v[: self.m_inter] *= z0
        v[self.m_inter : 2 * self.m_inter] *= z1
        v[2 * self.m_inter : 2 * self.m_inter + gn] *= z2
        v[2 * self.m_inter + gn : 2 * self.m_inter + 2 * gn] *= z3
        v[2 * self.m_inter + 2 * gn :] *= z4
        return v

    # ------------------------------------------------------------------
    # state pools (row lifecycle shared with qwen3_next's machinery)
    # ------------------------------------------------------------------

    def linear_state_bytes(self, rows: int) -> int:
        L = self.config.num_layers
        return L * rows * (
            (self.conv_k - 1) * self.conv_dim * 2
            + self.m_heads * self.m_p * self.m_state * 4
        )

    def wrap_kv_state(self, pool, rows: int):
        L = self.config.num_layers
        return {
            "pool": pool,
            "conv": jnp.zeros(
                (L, rows, self.conv_k - 1, self.conv_dim), jnp.bfloat16),
            "rec": jnp.zeros(
                (L, rows, self.m_heads, self.m_p, self.m_state), jnp.float32),
        }

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        L = self.config.num_layers
        for name in ("m_in", "m_out"):
            shapes["layers"][name] = self.specs[name].param_shapes(L)
        shapes["layers"]["conv_w"] = ((L, self.conv_k, self.conv_dim),
                                      jnp.float32)
        shapes["layers"]["conv_b"] = ((L, self.conv_dim), jnp.float32)
        shapes["layers"]["dt_bias"] = ((L, self.m_heads), jnp.float32)
        shapes["layers"]["a_log"] = ((L, self.m_heads), jnp.float32)
        shapes["layers"]["d_skip"] = ((L, self.m_heads), jnp.float32)
        if self.m_rms:
            shapes["layers"]["m_norm"] = ((L, self.m_inter), jnp.float32)
        return shapes

    def pretranslate_tensors(self, tensors):
        """HF names: mamba.* under each layer; feed_forward/pre_ff norms map
        onto the base class's mlp/post_norm slots."""
        out = {}
        for name, arr in tensors.items():
            n = name
            n = n.replace(".feed_forward.", ".mlp.")
            n = n.replace(".pre_ff_layernorm.", ".post_attention_layernorm.")
            n = n.replace("model.final_layernorm.", "model.norm.")
            out[n] = arr
        return out

    def merge_schema(self) -> Dict[str, tuple]:
        # base llama has no merge_schema (the loader's default MERGES
        # handles qkv/o/gate_up/down) — restate it plus the mamba stacks
        schema = {
            "qkv": (["self_attn.q_proj", "self_attn.k_proj",
                     "self_attn.v_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
            "gate_up": (["mlp.gate_proj", "mlp.up_proj"], "n"),
            "down": (["mlp.down_proj"], "n"),
            "m_in": (["mamba.in_proj"], "n"),
            "m_out": (["mamba.out_proj"], "n"),
        }
        return schema

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        out: Dict[str, jax.Array] = {}
        out["conv_w"] = jnp.asarray(np.stack(
            [np.asarray(t(f"model.layers.{i}.mamba.conv1d.weight"))[:, 0, :].T
             for i in range(L)]), jnp.float32)  # [L, K, conv_dim]
        out["conv_b"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.conv1d.bias") for i in range(L)]),
            jnp.float32)
        out["dt_bias"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.dt_bias") for i in range(L)]),
            jnp.float32)
        out["a_log"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.A_log") for i in range(L)]),
            jnp.float32)
        out["d_skip"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.mamba.D") for i in range(L)]), jnp.float32)
        if self.m_rms:
            out["m_norm"] = jnp.asarray(np.stack(
                [t(f"model.layers.{i}.mamba.norm.weight") for i in range(L)]),
                jnp.float32)
        return out

    # ------------------------------------------------------------------
    # mamba2 mixer pieces
    # ------------------------------------------------------------------

    def _m_project(self, lp, h, li):
        """in_proj * mup -> (z [T, inter], xBC [T, conv_dim], dt [T, H])."""
        zxbcdt = linear_apply(self.specs["m_in"], lp["m_in"], h, li)
        zxbcdt = zxbcdt.astype(jnp.float32) * jnp.asarray(self._mup_vector())
        z = zxbcdt[:, : self.m_inter]
        xbc = zxbcdt[:, self.m_inter : self.m_inter + self.conv_dim]
        dt = zxbcdt[:, self.m_inter + self.conv_dim :]
        return z, xbc, dt

    def _m_split_xbc(self, y):
        T = y.shape[0]
        gn = self.m_groups * self.m_state
        x = y[:, : self.m_inter].reshape(T, self.m_heads, self.m_p)
        B = y[:, self.m_inter : self.m_inter + gn].reshape(
            T, self.m_groups, self.m_state)
        C = y[:, self.m_inter + gn :].reshape(T, self.m_groups, self.m_state)
        r = self.m_heads // self.m_groups
        if r > 1:
            B = jnp.repeat(B, r, axis=-2)
            C = jnp.repeat(C, r, axis=-2)
        return x, B, C  # [T, H, P], [T, H, N], [T, H, N]

    def _m_epilogue(self, lp, li, y, z):
        """y [T, inter] f32, z [T, inter] f32 -> out_proj input bf16."""
        if not self.m_rms:
            o = y * jax.nn.silu(z)
        else:
            T = y.shape[0]
            g = self.m_groups
            if not self.norm_before_gate:
                y = y * jax.nn.silu(z)
            v = y.reshape(T, g, self.m_inter // g)
            var = jnp.mean(v * v, axis=-1, keepdims=True)
            v = v * jax.lax.rsqrt(var + self.config.rms_norm_eps)
            w = lp["m_norm"][li].reshape(g, self.m_inter // g)
            y = (v * w[None]).reshape(T, self.m_inter)
            if self.norm_before_gate:
                y = y * jax.nn.silu(z)
        return y.astype(jnp.bfloat16)

    def _mamba_decode(self, lp, h, li, rows, conv, rec):
        """One token per row.  conv [L, R, K-1, C]; rec [L, R, H, P, N]."""
        B = h.shape[0]
        z, xbc, dt = self._m_project(lp, h, li)
        cst = conv[li][rows]  # [B, K-1, C]
        window = jnp.concatenate(
            [cst, xbc.astype(jnp.bfloat16)[:, None, :]], axis=1)
        y = jnp.sum(window.astype(jnp.float32) * lp["conv_w"][li][None],
                    axis=1) + lp["conv_b"][li][None]
        y = jax.nn.silu(y)
        conv = conv.at[li, rows].set(
            window[:, 1:].astype(conv.dtype), mode="drop")
        x, Bg, Cg = self._m_split_xbc(y)
        dt = jax.nn.softplus(dt + lp["dt_bias"][li][None])  # [B, H]
        dA = jnp.exp(dt * -jnp.exp(lp["a_log"][li])[None])  # [B, H]
        S = rec[li][rows]  # [B, H, P, N]
        S = S * dA[..., None, None] + (
            (dt[..., None] * x)[..., None] * Bg[:, :, None, :]
        )
        yh = jnp.einsum("bhpn,bhn->bhp", S, Cg)
        yh = yh + lp["d_skip"][li][None, :, None] * x
        rec = rec.at[li, rows].set(S, mode="drop")
        o = self._m_epilogue(lp, li, yh.reshape(B, self.m_inter), z)
        return linear_apply(self.specs["m_out"], lp["m_out"], o, li), \
            conv, rec

    def _mamba_extend(self, lp, h, li, conv, rec, seg, p_local, live,
                      q_lens, qb_base, state_rows, fresh, block_q,
                      ckpt_pos=None, ckpt_rows=None):
        """Segment-aware batched extend (see qwen3_next._deltanet_extend —
        identical chunk/conv/segment structure, mamba2 recurrence)."""
        TQ = h.shape[0]
        Bn = q_lens.shape[0]
        K = self.conv_k
        z, xbc, dt_all = self._m_project(lp, h, li)
        mixed = jnp.where(live[:, None], xbc, 0.0).astype(jnp.bfloat16)
        segc = jnp.clip(seg, 0, Bn - 1)
        rows_tok = state_rows[segc]
        fresh_tok = fresh[segc]
        cw = lp["conv_w"][li]  # [K, C]

        y = mixed.astype(jnp.float32) * cw[K - 1]
        old_tail_rows = conv[li][jnp.clip(rows_tok, 0, None)]  # [TQ, K-1, C]
        for d in range(1, K):
            shifted = jnp.concatenate(
                [jnp.zeros((d, mixed.shape[1]), mixed.dtype), mixed[:-d]], 0)
            tidx = jnp.clip((K - 1) + p_local - d, 0, K - 2)
            tail_val = jnp.take_along_axis(
                old_tail_rows, tidx[:, None, None], axis=1
            )[:, 0].astype(jnp.float32)
            tail_val = jnp.where(fresh_tok[:, None], 0.0, tail_val)
            inp = jnp.where(
                (p_local >= d)[:, None], shifted.astype(jnp.float32),
                tail_val)
            y = y + inp * cw[K - 1 - d]
        y = jax.nn.silu(y + lp["conv_b"][li][None])
        y = jnp.where(live[:, None], y, 0.0)

        base = qb_base * block_q
        lpos = q_lens[:, None] - (K - 1) + jnp.arange(K - 1)[None]
        tok_idx = jnp.clip(base[:, None] + lpos, 0, TQ - 1)
        from_mixed = mixed[tok_idx]
        old_tail = jnp.where(
            fresh[:, None, None], 0,
            conv[li][jnp.clip(state_rows, 0, None)],
        )
        oidx = jnp.clip((K - 1) + lpos, 0, K - 2)
        from_old = jnp.take_along_axis(old_tail, oidx[..., None], axis=1)
        new_tail = jnp.where(
            (lpos >= 0)[..., None], from_mixed, from_old.astype(mixed.dtype))
        conv = conv.at[li, state_rows].set(
            new_tail.astype(conv.dtype), mode="drop")
        if ckpt_pos is not None:
            lpos_c = (
                ckpt_pos[:, None] + 1 - (K - 1) + jnp.arange(K - 1)[None]
            )
            tok_c = jnp.clip(base[:, None] + lpos_c, 0, TQ - 1)
            from_mixed_c = mixed[tok_c]
            oidx_c = jnp.clip((K - 1) + lpos_c, 0, K - 2)
            from_old_c = jnp.take_along_axis(old_tail, oidx_c[..., None], 1)
            tail_c = jnp.where(
                (lpos_c >= 0)[..., None], from_mixed_c,
                from_old_c.astype(mixed.dtype))
            ck_rows = jnp.where(ckpt_pos >= 0, ckpt_rows, PAD_SLOT)
            conv = conv.at[li, ck_rows].set(
                tail_c.astype(conv.dtype), mode="drop")

        x, Bg, Cg = self._m_split_xbc(y)  # [TQ, H, *]
        dt = jax.nn.softplus(dt_all + lp["dt_bias"][li][None])  # [TQ, H]
        dt = jnp.where(live[:, None], dt, 0.0)  # dead tokens: no update
        dA = jnp.exp(dt * -jnp.exp(lp["a_log"][li])[None])
        dA = jnp.where(live[:, None], dA, 1.0)
        S_init = jnp.where(
            fresh[:, None, None, None], 0.0,
            rec[li][jnp.clip(state_rows, 0, None)],
        )  # [Bn, H, P, N]
        is_start = (p_local == 0) & live
        is_end = live & (p_local == q_lens[segc] - 1)
        end_rows = jnp.where(is_end, rows_tok, PAD_SLOT)
        if ckpt_pos is not None:
            is_ck = live & (p_local == ckpt_pos[segc])
            ck_rows_tok = jnp.where(is_ck, ckpt_rows[segc], PAD_SLOT)
        else:
            ck_rows_tok = jnp.full_like(end_rows, PAD_SLOT)

        def step(carry, inp):
            S, rec_c = carry
            x_t, B_t, C_t, dt_t, dA_t, start_t, row_t, ck_t, seg_t = inp
            S = jnp.where(start_t, S_init[seg_t], S)
            S = S * dA_t[:, None, None] + (
                (dt_t[:, None] * x_t)[..., None] * B_t[:, None, :]
            )
            o_t = jnp.einsum("hpn,hn->hp", S, C_t)
            rec_c = rec_c.at[li, row_t].set(S, mode="drop")
            rec_c = rec_c.at[li, ck_t].set(S, mode="drop")
            return (S, rec_c), o_t

        (S, rec), outs = lax.scan(
            step, (S_init[0], rec),
            (x, Bg, Cg, dt, dA, is_start, end_rows, ck_rows_tok, segc),
        )  # outs [TQ, H, P]
        outs = outs + lp["d_skip"][li][None, :, None] * x
        o = self._m_epilogue(lp, li, outs.reshape(TQ, self.m_inter), z)
        return linear_apply(self.specs["m_out"], lp["m_out"], o, li), \
            conv, rec

    # ------------------------------------------------------------------
    # attention piece (llama attention + key multiplier + mup in/out)
    # ------------------------------------------------------------------

    def _attn_block(self, lp, h, l, positions, rope_tab, attn_fn):
        T = h.shape[0]
        D = self.head_dim
        h = (h.astype(jnp.float32) * self.mult_attn_in).astype(jnp.bfloat16)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1)
        q = q.reshape(T, self.qh, D)
        k = (k.astype(jnp.float32) * self.mult_key).astype(
            jnp.bfloat16).reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        if self.use_rope:
            q, k = apply_rope(q, k, positions, rope_tab)
        attn = attn_fn(q, k, v, l)
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        return (o.astype(jnp.float32) * self.mult_attn_out)

    def _mlp_block(self, lp, h2, l):
        gu = linear_apply(self.specs["gate_up"], lp["gate_up"], h2, l)
        I = gu.shape[-1] // 2
        gate, up = gu[:, :I], gu[:, I:]
        act = (jax.nn.silu(gate.astype(jnp.float32) * self.mult_mlp[0])
               * up.astype(jnp.float32)).astype(jnp.bfloat16)
        d = linear_apply(self.specs["down"], lp["down"], act, l)
        return d.astype(jnp.float32) * self.mult_mlp[1]

    # ------------------------------------------------------------------
    # steps (every layer: attn + mamba in parallel, then MLP)
    # ------------------------------------------------------------------

    def _embed(self, params, tokens):
        e = super()._embed(params, tokens)
        return (e.astype(jnp.float32) * self.mult_embed).astype(e.dtype)

    def _logits(self, params, h):
        lg = super()._logits(params, h)
        return lg * self.mult_lm_head

    def _walk(self, params, kv, rope_tab, x, positions, attn_of, mamba_of):
        c = self.config
        lp = params["layers"]
        for l in range(c.num_layers):
            h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
            hs = (h.astype(jnp.float32) * self.mult_ssm_in).astype(
                jnp.bfloat16)
            m_o, conv, rec = mamba_of(lp, hs, l, kv["conv"], kv["rec"])
            kv = dict(kv, conv=conv, rec=rec)
            m_o = m_o.astype(jnp.float32) * self.mult_ssm_out
            a_o, kv = attn_of(lp, h, l, kv)
            x = x + (m_o + a_o).astype(x.dtype)
            h2 = rms_norm(x, lp["post_norm"][l], c.rms_norm_eps)
            x = x + self._mlp_block(lp, h2, l).astype(x.dtype)
        return x, kv

    def decode_step(self, params, kv, rope_tab, tokens, positions, slots,
                    page_table, lengths, lora_idx=None, state_rows=None):
        assert lora_idx is None, "LoRA on hybrid models: not supported"
        assert state_rows is not None, "hybrid decode needs state rows"
        x = self._pos_embed(params, self._embed(params, tokens), positions)
        use_xla = not is_tpu_backend()
        rows = state_rows

        def attn_of(lp, h, l, kv):
            def attn(q, k, v, l):
                pool = write_kv(kv["pool"], k, v, slots, l, mode="decode")
                kv["pool"] = pool
                fn = ragged_decode_xla if use_xla else ragged_decode
                return fn(
                    q[:, None], pool, page_table, lengths, l,
                    sm_scale=self.sm_scale,
                )[:, 0]

            o = self._attn_block(lp, h, l, positions, rope_tab, attn)
            return o, kv

        def mamba_of(lp, h, li, conv, rec):
            return self._mamba_decode(lp, h, li, rows, conv, rec)

        x, kv = self._walk(
            params, kv, rope_tab, x, positions, attn_of, mamba_of)
        return self._logits(params, x), kv

    def extend_step(self, params, kv, rope_tab, tokens, positions, slots,
                    page_table, kv_lens, q_lens, qb_base, block_q=128,
                    return_hidden=False, capture_hidden=False,
                    lora_idx=None, input_embeds=None, state_rows=None,
                    state_ckpt=None):
        assert lora_idx is None and input_embeds is None, (
            "hybrid extend v1: no LoRA / input_embeds")
        assert not capture_hidden, "hybrid + EAGLE: not supported"
        assert state_rows is not None
        TQ = tokens.shape[0]
        x = self._pos_embed(params, self._embed(params, tokens), positions)
        use_xla = not is_tpu_backend()
        tix = jnp.arange(TQ)
        seg = (
            jnp.sum(tix[:, None] >= (qb_base * block_q)[None, :], axis=1) - 1
        )
        segc = jnp.clip(seg, 0, q_lens.shape[0] - 1)
        p_local = tix - qb_base[segc] * block_q
        live = (seg >= 0) & (p_local < q_lens[segc])
        fresh = kv_lens == q_lens

        def attn_of(lp, h, l, kv):
            def attn(q, k, v, l):
                pool = write_kv(kv["pool"], k, v, slots, l, mode="prefill")
                kv["pool"] = pool
                fn = ragged_extend_xla if use_xla else ragged_extend
                return fn(
                    q, pool, page_table, kv_lens, q_lens, qb_base, l,
                    sm_scale=self.sm_scale, block_q=block_q,
                )

            o = self._attn_block(lp, h, l, positions, rope_tab, attn)
            return o, kv

        ckpt_pos, ckpt_rows = state_ckpt if state_ckpt else (None, None)

        def mamba_of(lp, h, li, conv, rec):
            return self._mamba_extend(
                lp, h, li, conv, rec, seg, p_local, live, q_lens, qb_base,
                state_rows, fresh, block_q,
                ckpt_pos=ckpt_pos, ckpt_rows=ckpt_rows)

        x, kv = self._walk(
            params, kv, rope_tab, x, positions, attn_of, mamba_of)
        last = jnp.clip(
            qb_base * block_q + jnp.maximum(q_lens, 1) - 1, 0, TQ - 1)
        h_last = x[last]
        if return_hidden:
            return self._final_norm(params, h_last).astype(jnp.float32), kv
        return self._logits(params, h_last), kv
