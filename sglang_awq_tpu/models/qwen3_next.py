"""Qwen3-Next (hybrid gated-deltanet linear attention), TPU-native.

Role model: reference `python/sglang/srt/models/qwen3_next.py` + the hybrid
state pool (`srt/mem_cache/memory_pool.py:1055` MambaPool role).

Architecture (3:1 hybrid):
* `linear_attention` layers: Gated DeltaNet — a depthwise causal conv (K=4)
  over the projected q|k|v stream, then the gated delta-rule recurrence
      S_t = S_{t-1} * exp(g_t) + k_t^T ((v_t - k_t·S_{t-1}) * beta_t)
      o_t = (q_t / sqrt(dk)) · S_t
  with per-v-head gates g = -exp(A_log) * softplus(a + dt_bias),
  beta = sigmoid(b), l2-normalized q/k, and a z-gated RMSNorm epilogue.
* `full_attention` layers: Qwen3-style attention with per-head q/k RMSNorm,
  PARTIAL rotary (0.25), and an output sigmoid gate folded into the o-proj
  input (the q projection is double-width: [q | gate] per head).
* every layer: Qwen2-MoE MLP (routed top-k + sigmoid-gated shared expert) —
  inherited machinery (dense decode / grouped prefill).

TPU state design: linear layers keep NO KV pages.  Their state lives in two
row-indexed pools carried inside the kv pytree
    kv = {"pool":  [L_full, P, ...]      (paged KV, full layers only),
          "conv":  [L_lin, R, K-1, conv_dim] bf16,
          "rec":   [L_lin, R, Hv, dk, dv] f32}
where R = max_running_requests + 1 (trash row last) and the row index IS
the request's sampling-state row — allocation, retraction, and release ride
the existing row lifecycle.  A fresh prefill (kv_len == q_len, radix is
disabled for hybrid models) zeroes its rows in-step, so retract/re-admit
needs no host-side state bookkeeping.

The layer walk is UNROLLED (python-level branch per layer type) instead of
lax.scan + lax.cond: conditional in-place pool updates under cond would
force whole-pool copies; unrolled, every write_kv stays a donated in-place
update.  v1 scope: tp=1/pp=1, no speculative decoding, prefill batches of
one request (the scheduler enforces MAX_PREFILL_REQS=1 for hybrid models).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope
from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT, write_kv
from sglang_awq_tpu.models.qwen2_moe import Qwen2MoeForCausalLM
from sglang_awq_tpu.ops.ragged_attention import (
    ragged_decode,
    ragged_decode_xla,
    ragged_extend,
    ragged_extend_xla,
)
from sglang_awq_tpu.utils import is_tpu_backend


def _l2norm(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)


@dataclasses.dataclass
class Qwen3NextForCausalLM(Qwen2MoeForCausalLM):
    qkv_bias: bool = False
    has_linear_state: bool = True

    def __post_init__(self):
        c = self.config
        hf = c.hf_config
        hf.setdefault("num_local_experts", hf.get("num_experts", 8))
        assert self.tp_size == 1 and self.pp_size == 1, (
            "qwen3_next v1 runs tp=1/pp=1 (linear-state sharding lands "
            "with the mamba-pool TP story)")
        super().__post_init__()
        self.layer_types = list(hf["layer_types"])
        self.full_layers = [i for i, t in enumerate(self.layer_types)
                            if t == "full_attention"]
        self.lin_layers = [i for i, t in enumerate(self.layer_types)
                           if t == "linear_attention"]
        self._li_full = {l: i for i, l in enumerate(self.full_layers)}
        self._li_lin = {l: i for i, l in enumerate(self.lin_layers)}
        # linear-attention geometry
        self.hv = int(hf["linear_num_value_heads"])
        self.hk = int(hf["linear_num_key_heads"])
        self.dk = int(hf["linear_key_head_dim"])
        self.dv = int(hf["linear_value_head_dim"])
        self.conv_k = int(hf["linear_conv_kernel_dim"])
        self.key_dim = self.hk * self.dk
        self.value_dim = self.hv * self.dv
        self.conv_dim = 2 * self.key_dim + self.value_dim
        # full attention: q projection is double width ([q | gate] per head)
        q = c.quant_config
        H = c.hidden_size
        D = self.head_dim
        self.specs["qkv"] = LinearSpec.make(
            "qkv", H, (2 * self.qh + 2 * self.kvh) * D, q, None)
        self.specs["o"] = LinearSpec.make("o", self.qh * D, H, q, None)
        self.specs["in_qkvz"] = LinearSpec.make(
            "in_qkvz", H, 2 * self.key_dim + 2 * self.value_dim, None, None)
        self.specs["in_ba"] = LinearSpec.make(
            "in_ba", H, 2 * self.hv, None, None)
        self.specs["lin_out"] = LinearSpec.make(
            "lin_out", self.value_dim, H, None, None)

    # ------------------------------------------------------------------
    # state pools
    # ------------------------------------------------------------------

    def linear_state_bytes(self, rows: int) -> int:
        Ll = len(self.lin_layers)
        return Ll * rows * (
            (self.conv_k - 1) * self.conv_dim * 2
            + self.hv * self.dk * self.dv * 4
        )

    def wrap_kv_state(self, pool, rows: int):
        Ll = len(self.lin_layers)
        return {
            "pool": pool,
            "conv": jnp.zeros(
                (Ll, rows, self.conv_k - 1, self.conv_dim), jnp.bfloat16),
            "rec": jnp.zeros(
                (Ll, rows, self.hv, self.dk, self.dv), jnp.float32),
        }

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def _seg(self, name: str) -> int:
        if name in ("qkv", "o"):
            return len(self.full_layers)
        if name in ("in_qkvz", "in_ba", "lin_out"):
            return len(self.lin_layers)
        return self.config.num_layers

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        c = self.config
        D = self.head_dim
        Lf, Ll = len(self.full_layers), len(self.lin_layers)
        for name in ("qkv", "o", "in_qkvz", "in_ba", "lin_out"):
            shapes["layers"][name] = self.specs[name].param_shapes(
                self._seg(name))
        shapes["layers"]["q_norm"] = ((Lf, D), jnp.float32)
        shapes["layers"]["k_norm"] = ((Lf, D), jnp.float32)
        shapes["layers"]["conv_w"] = (
            (Ll, self.conv_k, self.conv_dim), jnp.float32)
        shapes["layers"]["dt_bias"] = ((Ll, self.hv), jnp.float32)
        shapes["layers"]["a_log"] = ((Ll, self.hv), jnp.float32)
        shapes["layers"]["lin_norm"] = ((Ll, self.dv), jnp.float32)
        return shapes

    def pretranslate_tensors(self, tensors):
        """Renumber the two attention stacks to contiguous virtual indices
        (full -> self_attn.* at li_full; linear -> lin.* at li_lin)."""
        out = {}
        for name, arr in tensors.items():
            if ".layers." not in name:
                out[name] = arr
                continue
            parts = name.split(".")
            l = int(parts[2])
            rest = ".".join(parts[3:])
            if rest.startswith("self_attn."):
                fi = self._li_full[l]
                out[f"model.layers.{fi}.{rest}"] = arr
            elif rest.startswith("linear_attn."):
                li = self._li_lin[l]
                out[f"model.layers.{li}.lin.{rest[len('linear_attn.'):]}"] = arr
            else:
                out[name] = arr
        return out

    def merge_schema(self) -> Dict[str, tuple]:
        schema = super().merge_schema()  # qwen2moe MoE + shared stacks
        Lf, Ll = len(self.full_layers), len(self.lin_layers)
        schema["qkv"] = (
            ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
            "n", (0, Lf))
        schema["o"] = (["self_attn.o_proj"], "n", (0, Lf))
        schema["in_qkvz"] = (["lin.in_proj_qkvz"], "n", (0, Ll))
        schema["in_ba"] = (["lin.in_proj_ba"], "n", (0, Ll))
        schema["lin_out"] = (["lin.out_proj"], "n", (0, Ll))
        return schema

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        out = super().extra_layer_params(t, L)
        Lf, Ll = len(self.full_layers), len(self.lin_layers)
        out["q_norm"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.self_attn.q_norm.weight")
             for i in range(Lf)]), jnp.float32)
        out["k_norm"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.self_attn.k_norm.weight")
             for i in range(Lf)]), jnp.float32)
        out["conv_w"] = jnp.asarray(np.stack(
            [np.asarray(t(f"model.layers.{i}.lin.conv1d.weight"))[:, 0, :].T
             for i in range(Ll)]), jnp.float32)  # [Ll, K, conv_dim]
        out["dt_bias"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.lin.dt_bias") for i in range(Ll)]),
            jnp.float32)
        out["a_log"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.lin.A_log") for i in range(Ll)]),
            jnp.float32)
        out["lin_norm"] = jnp.asarray(np.stack(
            [t(f"model.layers.{i}.lin.norm.weight") for i in range(Ll)]),
            jnp.float32)
        return out

    def postprocess_params(self, params):
        # Qwen3NextRMSNorm applies (1 + w) — fold the +1 at load (the Gemma
        # pattern); the gated deltanet norm uses plain w (ones-init)
        lp = params["layers"]
        for k in ("input_norm", "post_norm", "q_norm", "k_norm"):
            lp[k] = lp[k] + 1.0
        params["final_norm"] = params["final_norm"] + 1.0
        return params

    # ------------------------------------------------------------------
    # gated deltanet pieces
    # ------------------------------------------------------------------

    def _split_qkvz(self, qkvz: jax.Array, ba: jax.Array):
        """HF fix_query_key_value_ordering: projections are grouped per
        k-head as [q(dk), k(dk), v(r*dv), z(r*dv)] and [b(r), a(r)]."""
        T = qkvz.shape[0]
        r = self.hv // self.hk
        blk = 2 * self.dk + 2 * r * self.dv
        g = qkvz.reshape(T, self.hk, blk)
        q = g[:, :, : self.dk]
        k = g[:, :, self.dk : 2 * self.dk]
        v = g[:, :, 2 * self.dk : 2 * self.dk + r * self.dv].reshape(
            T, self.hv, self.dv)
        z = g[:, :, 2 * self.dk + r * self.dv :].reshape(T, self.hv, self.dv)
        gb = ba.reshape(T, self.hk, 2 * r)
        b = gb[:, :, :r].reshape(T, self.hv)
        a = gb[:, :, r:].reshape(T, self.hv)
        return q, k, v, z, b, a

    def _gates(self, lp, li, a, b):
        beta = jax.nn.sigmoid(b.astype(jnp.float32))  # [T, Hv]
        g = -jnp.exp(lp["a_log"][li]) * jax.nn.softplus(
            a.astype(jnp.float32) + lp["dt_bias"][li])
        return beta, g

    def _expand_heads(self, x):
        """k-heads -> v-heads (repeat_interleave along the head dim)."""
        r = self.hv // self.hk
        if r == 1:
            return x
        return jnp.repeat(x, r, axis=-2)

    def _gated_norm_out(self, lp, li, out, z):
        """RMSNorm(out) * w * silu(z), per v-head; -> [T, value_dim] bf16."""
        o = rms_norm(out.astype(jnp.bfloat16), lp["lin_norm"][li],
                     self.config.rms_norm_eps)
        o = o.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
        T = out.shape[0]
        return o.reshape(T, self.value_dim).astype(jnp.bfloat16)

    def _deltanet_decode(self, lp, h, li, rows, conv, rec):
        """One token per row.  conv [Ll, R, K-1, C]; rec [Ll, R, Hv, dk, dv]."""
        B = h.shape[0]
        qkvz = linear_apply(self.specs["in_qkvz"], lp["in_qkvz"], h, li)
        ba = linear_apply(self.specs["in_ba"], lp["in_ba"], h, li)
        q, k, v, z, b, a = self._split_qkvz(qkvz, ba)
        mixed = jnp.concatenate(
            [q.reshape(B, -1), k.reshape(B, -1), v.reshape(B, -1)], axis=-1
        )  # [B, C]
        cst = conv[li][rows]  # [B, K-1, C]
        window = jnp.concatenate([cst, mixed[:, None, :]], axis=1)  # [B,K,C]
        y = jnp.sum(
            window.astype(jnp.float32) * lp["conv_w"][li][None], axis=1
        )  # [B, C]
        y = jax.nn.silu(y)
        conv = conv.at[li, rows].set(
            window[:, 1:].astype(conv.dtype), mode="drop")
        kd, vd = self.key_dim, self.value_dim
        qc = y[:, :kd].reshape(B, self.hk, self.dk)
        kc = y[:, kd : 2 * kd].reshape(B, self.hk, self.dk)
        vc = y[:, 2 * kd :].reshape(B, self.hv, self.dv)
        qc = _l2norm(self._expand_heads(qc)) * (self.dk ** -0.5)
        kc = _l2norm(self._expand_heads(kc))
        beta, g = self._gates(lp, li, a, b)
        S = rec[li][rows]  # [B, Hv, dk, dv] f32
        S = S * jnp.exp(g)[..., None, None]
        kv_mem = jnp.einsum("bhk,bhkv->bhv", kc, S)
        delta = (vc.astype(jnp.float32) - kv_mem) * beta[..., None]
        S = S + jnp.einsum("bhk,bhv->bhkv", kc, delta)
        out = jnp.einsum("bhk,bhkv->bhv", qc, S)  # [B, Hv, dv]
        rec = rec.at[li, rows].set(S, mode="drop")
        o = self._gated_norm_out(lp, li, out, z)
        return linear_apply(self.specs["lin_out"], lp["lin_out"], o, li), \
            conv, rec

    def _deltanet_extend(self, lp, h, li, conv, rec, seg, p_local, live,
                         q_lens, qb_base, state_rows, fresh, block_q,
                         ckpt_pos=None, ckpt_rows=None):
        """BATCHED multi-request extend over the token-major chunk buffer.

        Round-3 served hybrids one-sequence-per-dispatch (the scheduler
        forced MAX_PREFILL_REQS=1); this is the segment-aware form — one
        dispatch covers every admitted request (reference analogue: the
        mamba prefill path of `srt/models/qwen3_next.py` batching via
        varlen metadata):

        * the depthwise conv resolves per-token: delay-d inputs come from
          the shifted stream when the token is >= d into its chunk, else
          from the sequence's saved conv tail (zeros when the chunk starts
          the sequence);
        * the delta-rule recurrence runs as ONE lax.scan over the whole
          buffer with per-token segment resets (state reloads at each
          sequence's first token) and per-segment final-state scatters.

        seg/p_local/live are per-token segment id, chunk-local position and
        liveness, derived on device from (qb_base, q_lens).
        """
        TQ = h.shape[0]
        B = q_lens.shape[0]
        K = self.conv_k
        qkvz = linear_apply(self.specs["in_qkvz"], lp["in_qkvz"], h, li)
        ba = linear_apply(self.specs["in_ba"], lp["in_ba"], h, li)
        q, k, v, z, b, a = self._split_qkvz(qkvz, ba)
        mixed = jnp.concatenate(
            [q.reshape(TQ, -1), k.reshape(TQ, -1), v.reshape(TQ, -1)],
            axis=-1)  # [TQ, C]
        mixed = jnp.where(live[:, None], mixed, 0)
        segc = jnp.clip(seg, 0, B - 1)
        rows_tok = state_rows[segc]  # [TQ]
        fresh_tok = fresh[segc]
        cw = lp["conv_w"][li]  # [K, C]

        # conv: delay-d input for token t is chunk-local pos p-d — the
        # shifted stream in-segment, the saved tail across the chunk edge
        y = mixed.astype(jnp.float32) * cw[K - 1]
        old_tail_rows = conv[li][jnp.clip(rows_tok, 0, None)]  # [TQ,K-1,C]
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
        y = jax.nn.silu(y)
        y = jnp.where(live[:, None], y, 0.0)

        # new per-sequence conv tail: the last K-1 chunk inputs (reaching
        # into the old tail when the chunk is shorter than K-1)
        base = qb_base * block_q  # [B]
        lpos = q_lens[:, None] - (K - 1) + jnp.arange(K - 1)[None]  # [B,K-1]
        tok_idx = jnp.clip(base[:, None] + lpos, 0, TQ - 1)
        from_mixed = mixed[tok_idx]  # [B, K-1, C]
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
            # conv tail AS OF chunk-local position ckpt_pos (the page-aligned
            # prefix boundary) — the mamba-radix checkpoint's conv half
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

        kd = self.key_dim
        qc = y[:, :kd].reshape(TQ, self.hk, self.dk)
        kc = y[:, kd : 2 * kd].reshape(TQ, self.hk, self.dk)
        vc = y[:, 2 * kd :].reshape(TQ, self.hv, self.dv)
        qc = _l2norm(self._expand_heads(qc)) * (self.dk ** -0.5)
        kc = _l2norm(self._expand_heads(kc))
        beta, g = self._gates(lp, li, a, b)
        beta = jnp.where(live[:, None], beta, 0.0)  # dead tokens: no update
        g = jnp.where(live[:, None], g, 0.0)
        S_init = jnp.where(
            fresh[:, None, None, None], 0.0,
            rec[li][jnp.clip(state_rows, 0, None)],
        )  # [B, Hv, dk, dv]
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
            q_t, k_t, v_t, beta_t, g_t, start_t, row_t, ck_t, seg_t = inp
            S = jnp.where(start_t, S_init[seg_t], S)
            S = S * jnp.exp(g_t)[:, None, None]
            kv_mem = jnp.einsum("hk,hkv->hv", k_t, S)
            delta = (v_t.astype(jnp.float32) - kv_mem) * beta_t[:, None]
            S = S + jnp.einsum("hk,hv->hkv", k_t, delta)
            o_t = jnp.einsum("hk,hkv->hv", q_t, S)
            rec_c = rec_c.at[li, row_t].set(S, mode="drop")
            rec_c = rec_c.at[li, ck_t].set(S, mode="drop")
            return (S, rec_c), o_t

        (S, rec), outs = lax.scan(
            step, (S_init[0], rec),
            (qc, kc, vc, beta, g, is_start, end_rows, ck_rows_tok, segc),
        )  # outs [TQ, Hv, dv]
        o = self._gated_norm_out(lp, li, outs, z)
        return linear_apply(self.specs["lin_out"], lp["lin_out"], o, li), \
            conv, rec

    # ------------------------------------------------------------------
    # full-attention piece (gated q, partial rope)
    # ------------------------------------------------------------------

    def _full_attn(self, lp, h, fi, positions, rope_tab, attn_fn):
        T = h.shape[0]
        D = self.head_dim
        c = self.config
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, fi)
        q2, k, v = jnp.split(
            qkv, [2 * self.qh * D, (2 * self.qh + self.kvh) * D], axis=-1)
        q2 = q2.reshape(T, self.qh, 2 * D)
        qh, gate = q2[..., :D], q2[..., D:].reshape(T, self.qh * D)
        qh = rms_norm(qh, lp["q_norm"][fi], c.rms_norm_eps)
        kh = rms_norm(k.reshape(T, self.kvh, D), lp["k_norm"][fi],
                      c.rms_norm_eps)
        vh = v.reshape(T, self.kvh, D)
        qh, kh = apply_rope(qh, kh, positions, rope_tab)
        attn = attn_fn(qh, kh, vh, fi)  # [T, QH, D] f32
        attn = attn.reshape(T, self.qh * D)
        attn = (attn * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(
            jnp.bfloat16)
        return linear_apply(self.specs["o"], lp["o"], attn, fi)

    # ------------------------------------------------------------------
    # steps (unrolled hybrid layer walk)
    # ------------------------------------------------------------------

    def _walk_layers(self, params, kv, rope_tab, x, positions, state_rows,
                     full_attn_of, lin_of):
        """Unrolled layer loop: python branch per static layer type."""
        c = self.config
        lp = params["layers"]
        for l in range(c.num_layers):
            h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
            if self.layer_types[l] == "full_attention":
                fi = self._li_full[l]
                o, kv = full_attn_of(lp, h, fi, kv)
            else:
                li = self._li_lin[l]
                o, conv, rec = lin_of(lp, h, li, kv["conv"], kv["rec"])
                kv = dict(kv, conv=conv, rec=rec)
            x = x + o.astype(jnp.float32).astype(x.dtype)
            h2 = rms_norm(x, lp["post_norm"][l], c.rms_norm_eps)
            d = self._mlp(lp, h2, l)
            x = x + d.astype(jnp.float32).astype(x.dtype)
        return x, kv

    def decode_step(self, params, kv, rope_tab, tokens, positions, slots,
                    page_table, lengths, lora_idx=None, state_rows=None):
        assert lora_idx is None, "LoRA on hybrid models: not supported"
        assert state_rows is not None, "hybrid decode needs state rows"
        B = tokens.shape[0]
        x = self._pos_embed(params, self._embed(params, tokens), positions)
        use_xla = not is_tpu_backend()
        rows = state_rows

        def full_attn_of(lp, h, fi, kv):
            def attn(q, k, v, fi):
                pool = write_kv(kv["pool"], k, v, slots, fi, mode="decode")
                kv["pool"] = pool
                fn = ragged_decode_xla if use_xla else ragged_decode
                return fn(
                    q[:, None], pool, page_table, lengths, fi,
                    sm_scale=self.sm_scale,
                )[:, 0]

            o = self._full_attn(lp, h, fi, positions, rope_tab, attn)
            return o, kv

        def lin_of(lp, h, li, conv, rec):
            return self._deltanet_decode(lp, h, li, rows, conv, rec)

        x, kv = self._walk_layers(
            params, kv, rope_tab, x, positions, rows, full_attn_of, lin_of)
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
        # per-token segment structure (qb_base ascending by construction)
        tix = jnp.arange(TQ)
        seg = (
            jnp.sum(tix[:, None] >= (qb_base * block_q)[None, :], axis=1) - 1
        )  # [TQ]
        segc = jnp.clip(seg, 0, q_lens.shape[0] - 1)
        p_local = tix - qb_base[segc] * block_q
        live = (seg >= 0) & (p_local < q_lens[segc])
        fresh = kv_lens == q_lens  # [B]

        def full_attn_of(lp, h, fi, kv):
            def attn(q, k, v, fi):
                pool = write_kv(kv["pool"], k, v, slots, fi, mode="prefill")
                kv["pool"] = pool
                fn = ragged_extend_xla if use_xla else ragged_extend
                return fn(
                    q, pool, page_table, kv_lens, q_lens, qb_base, fi,
                    sm_scale=self.sm_scale, block_q=block_q,
                )

            o = self._full_attn(lp, h, fi, positions, rope_tab, attn)
            return o, kv

        ckpt_pos, ckpt_rows = state_ckpt if state_ckpt else (None, None)

        def lin_of(lp, h, li, conv, rec):
            return self._deltanet_extend(
                lp, h, li, conv, rec, seg, p_local, live, q_lens, qb_base,
                state_rows, fresh, block_q,
                ckpt_pos=ckpt_pos, ckpt_rows=ckpt_rows)

        x, kv = self._walk_layers(
            params, kv, rope_tab, x, positions, state_rows, full_attn_of,
            lin_of)
        B = page_table.shape[0]
        last = jnp.clip(
            qb_base * block_q + jnp.maximum(q_lens, 1) - 1, 0, TQ - 1)
        h_last = x[last]
        if return_hidden:
            return self._final_norm(params, h_last).astype(jnp.float32), kv
        return self._logits(params, h_last), kv
