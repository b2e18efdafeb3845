"""Kimi Linear (KDA hybrid: Kimi Delta Attention + NoPE-MLA), TPU-native.

Role model: reference `python/sglang/srt/models/kimi_linear.py`
(KimiDeltaAttention :161, KimiMoE :49, layer split via
`configs/kimi_linear.py:136` is_kda_layer) + the KDA kernels
(`srt/layers/attention/fla/kda.py` fused_kda_gate :1306, gated norm :399;
`srt/layers/attention/fla/fused_recurrent.py:16` IS_KDA per-channel decay)
and the hybrid backend wiring
(`srt/layers/attention/hybrid_linear_attn_backend.py:623,717`).

Architecture (typically 3:1 KDA:MLA):

* KDA layers — a delta-rule linear attention with PER-KEY-CHANNEL decay:
      S_t = S_{t-1} * exp(g_t)[.., None]                 (g_t: [H, Dk])
      delta_t = (v_t - k_t·S) * beta_t                   (beta: [H] scalar)
      S_t += k_t ^T delta_t;   o_t = (q_t/sqrt(Dk)) · S_t
  with q/k/v each passed through a depthwise causal conv (K=4, silu),
  q/k L2-normalized, gates g = -exp(A_log_h) * softplus(f_b(f_a(x)) +
  dt_bias) and a sigmoid-gated per-head RMSNorm epilogue
  (o_norm eps = 1e-5, the reference constructor default).
* full-attention layers — absorbed MLA exactly as deepseek_v2.py, but
  NoPE (`mla_use_nope`: the rope slice of q/k passes through unrotated —
  reference deepseek_v2.py:1397 skip_rope).
* MLP — DeepSeek-MoE with sigmoid routing + e_score_correction_bias
  (noaux-tc), shared experts, first_k_dense_replace; config keys arrive
  under Kimi names (num_experts / num_experts_per_token / ...) and are
  normalized to the DeepSeek names the base class reads.

TPU state design (qwen3_next.py rationale): KDA layers keep NO KV pages —
their state lives in row-indexed pools carried inside the kv pytree
    kv = {"pool": [Lf, P, ps, Dp]   (latent MLA pages, full layers only),
          "conv": [Lk, R, K-1, 3*proj] bf16   (q|k|v conv tails),
          "rec":  [Lk, R, H, Dk, Dv] f32}
where R rides the sampling-row lifecycle and page-aligned state
checkpoints give mamba-radix prefix reuse.  The layer walk is unrolled
(python branch per static layer type).  v1 scope: tp=1/pp=1, no
speculative decoding (matching the other recurrent hybrids).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT, write_kv
from sglang_awq_tpu.models.deepseek_v2 import DeepseekV2ForCausalLM
from sglang_awq_tpu.ops.ragged_attention import (
    ragged_decode,
    ragged_decode_xla,
    ragged_extend,
    ragged_extend_xla,
)
from sglang_awq_tpu.utils import is_tpu_backend


def _l2norm(x, eps=1e-6):
    # reference fused_recurrent.py:86 — eps INSIDE the sqrt
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)


def _softplus20(x):
    # reference kda.py:1295-1300 — softplus with linear switch at 20
    return jnp.where(x > 20.0, x, jax.nn.softplus(jnp.minimum(x, 20.0)))


@dataclasses.dataclass
class KimiLinearForCausalLM(DeepseekV2ForCausalLM):
    has_linear_state: bool = True

    def __post_init__(self):
        c = self.config
        hf = c.hf_config
        # normalize Kimi MoE config keys to the DeepSeek names the base
        # class reads (reference configs/kimi_linear.py:82 does the same
        # aliasing: n_routed_experts = num_experts, ...)
        if hf.get("num_experts") and not hf.get("n_routed_experts"):
            hf["n_routed_experts"] = hf["num_experts"]
            hf.setdefault("num_experts_per_tok", hf.get("num_experts_per_token"))
            hf.setdefault("n_shared_experts", hf.get("num_shared_experts"))
            hf.setdefault("n_group", hf.get("num_expert_group", 1))
            hf.setdefault("norm_topk_prob", hf.get("moe_renormalize", True))
            if hf.get("moe_router_activation_func", "sigmoid") == "sigmoid":
                hf.setdefault("topk_method", "noaux_tc")
            else:
                hf.setdefault("topk_method", "greedy")
        assert self.tp_size == 1 and self.pp_size == 1, (
            "kimi_linear v1 runs tp=1/pp=1 (recurrent-state sharding lands "
            "with the mamba-pool TP story)")
        super().__post_init__()
        self.mla_nope = bool(hf.get("mla_use_nope"))
        lac = hf["linear_attn_config"]
        kda_1idx = set(int(i) for i in lac["kda_layers"])
        L = c.num_layers
        self.layer_is_kda = [(l + 1) in kda_1idx for l in range(L)]
        self.full_layers = [l for l in range(L) if not self.layer_is_kda[l]]
        self.lin_layers = [l for l in range(L) if self.layer_is_kda[l]]
        self._li_full = {l: i for i, l in enumerate(self.full_layers)}
        self._li_lin = {l: i for i, l in enumerate(self.lin_layers)}
        # KDA geometry
        self.kda_heads = int(lac["num_heads"])
        self.kda_dim = int(lac["head_dim"])
        self.conv_k = int(lac.get("short_conv_kernel_size", 4))
        self.kda_proj = self.kda_heads * self.kda_dim
        self.kda_norm_eps = 1e-5  # reference KimiDeltaAttention ctor default
        q = c.quant_config
        H = c.hidden_size
        p, Dl = self.kda_proj, self.kda_dim
        self.specs["kda_qkvb"] = LinearSpec.make(
            "kda_qkvb", H, 3 * p + self.kda_heads, q, None)
        self.specs["kda_fga"] = LinearSpec.make("kda_fga", H, 2 * Dl, q, None)
        self.specs["kda_fb"] = LinearSpec.make("kda_fb", Dl, p, q, None)
        self.specs["kda_gb"] = LinearSpec.make("kda_gb", Dl, p, q, None)
        self.specs["kda_o"] = LinearSpec.make("kda_o", p, H, q, None)

    # ------------------------------------------------------------------
    # state pools
    # ------------------------------------------------------------------

    def linear_state_bytes(self, rows: int) -> int:
        Lk = len(self.lin_layers)
        return Lk * rows * (
            (self.conv_k - 1) * 3 * self.kda_proj * 2
            + self.kda_heads * self.kda_dim * self.kda_dim * 4
        )

    def wrap_kv_state(self, pool, rows: int):
        Lk = len(self.lin_layers)
        return {
            "pool": pool,
            "conv": jnp.zeros(
                (Lk, rows, self.conv_k - 1, 3 * self.kda_proj), jnp.bfloat16),
            "rec": jnp.zeros(
                (Lk, rows, self.kda_heads, self.kda_dim, self.kda_dim),
                jnp.float32),
        }

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def _seg_layers(self, name: str) -> int:
        if name.startswith("kda_"):
            return len(self.lin_layers)
        if name in ("q", "q_a", "q_b", "kv_a", "kv_b", "o"):
            return len(self.full_layers)
        return super()._seg_layers(name)

    def param_shapes(self) -> Dict[str, Any]:
        shapes = super().param_shapes()
        Lf, Lk = len(self.full_layers), len(self.lin_layers)
        Hl, Dl, K = self.kda_heads, self.kda_dim, self.conv_k
        shapes["layers"]["kv_a_norm"] = ((Lf, self.kv_lora_rank), jnp.float32)
        if self.q_lora_rank:
            shapes["layers"]["q_a_norm"] = ((Lf, int(self.q_lora_rank)),
                                            jnp.float32)
        shapes["layers"]["kda_conv"] = ((Lk, K, 3 * self.kda_proj),
                                        jnp.float32)
        shapes["layers"]["kda_dt_bias"] = ((Lk, Hl, Dl), jnp.float32)
        shapes["layers"]["kda_alog"] = ((Lk, Hl), jnp.float32)
        shapes["layers"]["kda_norm"] = ((Lk, Dl), jnp.float32)
        return shapes

    def merge_schema(self) -> Dict[str, tuple]:
        schema = super().merge_schema()
        Lf, Lk = len(self.full_layers), len(self.lin_layers)
        for name in ("q", "q_a", "q_b", "kv_a", "kv_b", "o"):
            if name in schema:
                schema[name] = (schema[name][0], schema[name][1], (0, Lf))
        schema["kda_qkvb"] = (
            ["kda.q_proj", "kda.k_proj", "kda.v_proj", "kda.b_proj"],
            "n", (0, Lk))
        schema["kda_fga"] = (["kda.f_a_proj", "kda.g_a_proj"], "n", (0, Lk))
        schema["kda_fb"] = (["kda.f_b_proj"], "n", (0, Lk))
        schema["kda_gb"] = (["kda.g_b_proj"], "n", (0, Lk))
        schema["kda_o"] = (["kda.o_proj"], "n", (0, Lk))
        return schema

    def pretranslate_tensors(self, tensors):
        """Renumber the two attention stacks to contiguous virtual indices
        (MLA -> self_attn.* at fi; KDA -> kda.* at li) and rename the MoE
        blocks (block_sparse_moe.* / experts.w1|w2|w3, the reference
        checkpoint layout `srt/models/kimi_linear.py:606-694`) to the
        DeepSeek names the base schema expects."""
        out = {}
        for name, arr in tensors.items():
            if ".layers." not in name:
                out[name] = arr
                continue
            parts = name.split(".")
            l = int(parts[2])
            rest = ".".join(parts[3:])
            if rest.startswith("self_attn."):
                sub = rest[len("self_attn."):]
                if self.layer_is_kda[l]:
                    out[f"model.layers.{self._li_lin[l]}.kda.{sub}"] = arr
                else:
                    out[f"model.layers.{self._li_full[l]}.self_attn.{sub}"] \
                        = arr
            elif rest.startswith("block_sparse_moe."):
                sub = rest[len("block_sparse_moe."):]
                if ".w1." in sub or ".w2." in sub or ".w3." in sub:
                    sub = sub.replace(".w1.", ".gate_proj.").replace(
                        ".w2.", ".down_proj.").replace(".w3.", ".up_proj.")
                out[f"model.layers.{l}.mlp.{sub}"] = arr
            else:
                out[name] = arr
        return super().pretranslate_tensors(out)

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        Lf, Lk = len(self.full_layers), len(self.lin_layers)
        k = self.first_k_dense
        out: Dict[str, jax.Array] = {
            "kv_a_norm": jnp.asarray(np.stack([
                t(f"model.layers.{l}.self_attn.kv_a_layernorm.weight")
                for l in range(Lf)
            ]), jnp.float32),
        }
        if self.q_lora_rank:
            out["q_a_norm"] = jnp.asarray(np.stack([
                t(f"model.layers.{l}.self_attn.q_a_layernorm.weight")
                for l in range(Lf)
            ]), jnp.float32)
        if self.num_experts:
            out["router"] = jnp.asarray(np.stack([
                t(f"model.layers.{l}.mlp.gate.weight").T
                for l in range(k, L)
            ]), jnp.bfloat16)
            if self.topk_method == "noaux_tc":
                out["router_bias"] = jnp.asarray(np.stack([
                    t(f"model.layers.{l}.mlp.gate.e_score_correction_bias")
                    for l in range(k, L)
                ]), jnp.float32)

        def conv_w(li, stream):
            w = np.asarray(t(f"model.layers.{li}.kda.{stream}_conv1d.weight"))
            if w.ndim == 3:  # nn.Conv1d layout [proj, 1, K]
                w = w[:, 0, :]
            return w  # [proj, K]

        out["kda_conv"] = jnp.asarray(np.stack([
            np.concatenate([conv_w(li, s) for s in ("q", "k", "v")], axis=0).T
            for li in range(Lk)
        ]), jnp.float32)  # [Lk, K, 3*proj]
        out["kda_dt_bias"] = jnp.asarray(np.stack([
            np.asarray(t(f"model.layers.{li}.kda.dt_bias")).reshape(
                self.kda_heads, self.kda_dim)
            for li in range(Lk)
        ]), jnp.float32)
        out["kda_alog"] = jnp.asarray(np.stack([
            np.asarray(t(f"model.layers.{li}.kda.A_log")).reshape(
                self.kda_heads)
            for li in range(Lk)
        ]), jnp.float32)
        out["kda_norm"] = jnp.asarray(np.stack([
            t(f"model.layers.{li}.kda.o_norm.weight") for li in range(Lk)
        ]), jnp.float32)
        return out

    # ------------------------------------------------------------------
    # KDA pieces
    # ------------------------------------------------------------------

    def _kda_inputs(self, lp, h, li):
        """Projections -> (mixed [T, 3p] conv stream, beta [T,H], g [T,H,Dk]
        decay logits, z [T, p] output-gate logits)."""
        p, Hl, Dl = self.kda_proj, self.kda_heads, self.kda_dim
        T = h.shape[0]
        qkvb = linear_apply(self.specs["kda_qkvb"], lp["kda_qkvb"], h, li)
        mixed = qkvb[:, : 3 * p]
        beta = jax.nn.sigmoid(qkvb[:, 3 * p:].astype(jnp.float32))  # [T, Hl]
        fga = linear_apply(self.specs["kda_fga"], lp["kda_fga"], h, li)
        g_raw = linear_apply(
            self.specs["kda_fb"], lp["kda_fb"], fga[:, :Dl], li)
        z = linear_apply(self.specs["kda_gb"], lp["kda_gb"], fga[:, Dl:], li)
        g = -jnp.exp(lp["kda_alog"][li])[None, :, None] * _softplus20(
            g_raw.astype(jnp.float32).reshape(T, Hl, Dl)
            + lp["kda_dt_bias"][li][None])
        return mixed, beta, g, z

    def _kda_qkv(self, y):
        """Post-conv stream -> l2-normalized q (scaled), k, v [T, H, D]."""
        p, Hl, Dl = self.kda_proj, self.kda_heads, self.kda_dim
        T = y.shape[0]
        q = _l2norm(y[:, :p].reshape(T, Hl, Dl)) * (Dl ** -0.5)
        k = _l2norm(y[:, p: 2 * p].reshape(T, Hl, Dl))
        v = y[:, 2 * p:].reshape(T, Hl, Dl)  # f32 (post-silu conv output)
        return q, k, v

    def _kda_out(self, lp, li, out, z):
        """Sigmoid-gated per-head RMSNorm (reference kda.py:230-233
        ACTIVATION == "sigmoid") + o-proj input reshape; f32 math."""
        T = out.shape[0]
        of = out.astype(jnp.float32)
        ms = jnp.mean(of * of, axis=-1, keepdims=True)
        on = of * jax.lax.rsqrt(ms + self.kda_norm_eps) * lp["kda_norm"][li]
        zf = z.astype(jnp.float32).reshape(T, self.kda_heads, self.kda_dim)
        o = on * jax.nn.sigmoid(zf)
        return o.reshape(T, self.kda_proj).astype(jnp.bfloat16)

    def _kda_decode(self, lp, h, li, rows, conv, rec):
        """One token per row.  conv [Lk,R,K-1,3p]; rec [Lk,R,H,Dk,Dv]."""
        B = h.shape[0]
        mixed, beta, g, z = self._kda_inputs(lp, h, li)
        cst = conv[li][rows]  # [B, K-1, 3p]
        window = jnp.concatenate([cst, mixed[:, None, :]], axis=1)
        y = jax.nn.silu(jnp.sum(
            window.astype(jnp.float32) * lp["kda_conv"][li][None], axis=1))
        conv = conv.at[li, rows].set(
            window[:, 1:].astype(conv.dtype), mode="drop")
        q, k, v = self._kda_qkv(y)
        S = rec[li][rows]  # [B, H, Dk, Dv] f32
        S = S * jnp.exp(g)[..., None]  # per-key-channel decay
        kv_mem = jnp.einsum("bhk,bhkv->bhv", k, S)
        delta = (v - kv_mem) * beta[..., None]
        S = S + jnp.einsum("bhk,bhv->bhkv", k, delta)
        out = jnp.einsum("bhk,bhkv->bhv", q, S)
        rec = rec.at[li, rows].set(S, mode="drop")
        o = self._kda_out(lp, li, out, z)
        return linear_apply(self.specs["kda_o"], lp["kda_o"], o, li), \
            conv, rec

    def _kda_extend(self, lp, h, li, conv, rec, seg, p_local, live,
                    q_lens, qb_base, state_rows, fresh, block_q,
                    ckpt_pos=None, ckpt_rows=None):
        """Segment-aware batched extend (qwen3_next.py `_deltanet_extend`
        structure: per-token conv-tail resolution across chunk edges, one
        lax.scan with per-segment state resets/final scatters)."""
        TQ = h.shape[0]
        B = q_lens.shape[0]
        K = self.conv_k
        mixed, beta, g, z = self._kda_inputs(lp, h, li)
        mixed = jnp.where(live[:, None], mixed, 0)
        segc = jnp.clip(seg, 0, B - 1)
        rows_tok = state_rows[segc]  # [TQ]
        fresh_tok = fresh[segc]
        cw = lp["kda_conv"][li]  # [K, 3p]

        y = mixed.astype(jnp.float32) * cw[K - 1]
        old_tail_rows = conv[li][jnp.clip(rows_tok, 0, None)]  # [TQ,K-1,3p]
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

        # new per-sequence conv tails (and page-aligned checkpoint tails)
        base = qb_base * block_q  # [B]
        lpos = q_lens[:, None] - (K - 1) + jnp.arange(K - 1)[None]  # [B,K-1]
        tok_idx = jnp.clip(base[:, None] + lpos, 0, TQ - 1)
        from_mixed = mixed[tok_idx]  # [B, K-1, 3p]
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

        q, k, v = self._kda_qkv(y)
        beta = jnp.where(live[:, None], beta, 0.0)  # dead tokens: no update
        g = jnp.where(live[:, None, None], g, 0.0)
        S_init = jnp.where(
            fresh[:, None, None, None], 0.0,
            rec[li][jnp.clip(state_rows, 0, None)],
        )  # [B, H, Dk, Dv]
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
            S = S * jnp.exp(g_t)[..., None]  # [H, Dk, 1]
            kv_mem = jnp.einsum("hk,hkv->hv", k_t, S)
            delta = (v_t - kv_mem) * beta_t[:, None]
            S = S + jnp.einsum("hk,hv->hkv", k_t, delta)
            o_t = jnp.einsum("hk,hkv->hv", q_t, S)
            rec_c = rec_c.at[li, row_t].set(S, mode="drop")
            rec_c = rec_c.at[li, ck_t].set(S, mode="drop")
            return (S, rec_c), o_t

        (S, rec), outs = lax.scan(
            step, (S_init[0], rec),
            (q, k, v, beta, g, is_start, end_rows, ck_rows_tok, segc),
        )  # outs [TQ, H, Dv]
        o = self._kda_out(lp, li, outs, z)
        return linear_apply(self.specs["kda_o"], lp["kda_o"], o, li), \
            conv, rec

    # ------------------------------------------------------------------
    # steps (unrolled hybrid layer walk)
    # ------------------------------------------------------------------

    def _walk_layers(self, params, kv, x, mla_of, kda_of):
        c = self.config
        lp = params["layers"]
        for l in range(c.num_layers):
            h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
            if self.layer_is_kda[l]:
                li = self._li_lin[l]
                o, conv, rec = kda_of(lp, h, li, kv["conv"], kv["rec"])
                kv = dict(kv, conv=conv, rec=rec)
            else:
                fi = self._li_full[l]
                o, kv = mla_of(h, fi, kv)
            x = x + o.astype(jnp.float32).astype(x.dtype)
            h2 = rms_norm(x, lp["post_norm"][l], c.rms_norm_eps)
            d = self._mlp(lp, h2, l)
            x = x + d.astype(jnp.float32).astype(x.dtype)
        return x, kv

    def decode_step(self, params, kv, rope_tab, tokens, positions, slots,
                    page_table, lengths, lora_idx=None, state_rows=None):
        assert lora_idx is None, "LoRA on kimi_linear: not supported"
        assert state_rows is not None, "hybrid decode needs state rows"
        x = self._pos_embed(params, self._embed(params, tokens), positions)
        use_xla = not is_tpu_backend()
        rows = state_rows

        def mla_of(h, fi, kv):
            def attn(q, krow, vrow, l):
                kv["pool"] = write_kv(
                    kv["pool"], krow, vrow, slots, l, mode="decode")
                fn = ragged_decode_xla if use_xla else ragged_decode
                return fn(
                    q[:, None], kv["pool"], page_table, lengths, l,
                    sm_scale=self.sm_scale,
                )[:, 0]

            o = self._mla_attn(params, h, fi, positions, rope_tab, attn)
            return o, kv

        def kda_of(lp, h, li, conv, rec):
            return self._kda_decode(lp, h, li, rows, conv, rec)

        x, kv = self._walk_layers(params, kv, x, mla_of, kda_of)
        return self._logits(params, x), kv

    def extend_step(self, params, kv, rope_tab, tokens, positions, slots,
                    page_table, kv_lens, q_lens, qb_base, block_q=128,
                    return_hidden=False, capture_hidden=False,
                    lora_idx=None, input_embeds=None, state_rows=None,
                    state_ckpt=None):
        assert lora_idx is None and input_embeds is None, (
            "kimi_linear extend v1: no LoRA / input_embeds")
        assert not capture_hidden, "kimi_linear + EAGLE: not supported"
        assert state_rows is not None
        TQ = tokens.shape[0]
        x = self._pos_embed(params, self._embed(params, tokens), positions)
        use_xla = not is_tpu_backend()
        tix = jnp.arange(TQ)
        seg = (
            jnp.sum(tix[:, None] >= (qb_base * block_q)[None, :], axis=1) - 1
        )  # [TQ]
        segc = jnp.clip(seg, 0, q_lens.shape[0] - 1)
        p_local = tix - qb_base[segc] * block_q
        live = (seg >= 0) & (p_local < q_lens[segc])
        fresh = kv_lens == q_lens  # [B]

        def mla_of(h, fi, kv):
            def attn(q, krow, vrow, l):
                kv["pool"] = write_kv(
                    kv["pool"], krow, vrow, slots, l, mode="prefill")
                fn = ragged_extend_xla if use_xla else ragged_extend
                return fn(
                    q, kv["pool"], page_table, kv_lens, q_lens, qb_base, l,
                    sm_scale=self.sm_scale, block_q=block_q,
                )

            o = self._mla_attn(params, h, fi, positions, rope_tab, attn)
            return o, kv

        ckpt_pos, ckpt_rows = state_ckpt if state_ckpt else (None, None)

        def kda_of(lp, h, li, conv, rec):
            return self._kda_extend(
                lp, h, li, conv, rec, seg, p_local, live, q_lens, qb_base,
                state_rows, fresh, block_q,
                ckpt_pos=ckpt_pos, ckpt_rows=ckpt_rows)

        x, kv = self._walk_layers(params, kv, x, mla_of, kda_of)
        last = jnp.clip(
            qb_base * block_q + jnp.maximum(q_lens, 1) - 1, 0, TQ - 1)
        h_last = x[last]
        if return_hidden:
            return self._final_norm(params, h_last).astype(jnp.float32), kv
        return self._logits(params, h_last), kv
