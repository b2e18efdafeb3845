"""EAGLE draft model: a shallow llama-style feature predictor.

Role model: reference `python/sglang/srt/models/llama_eagle.py` (draft
decoder with the first layer's input layernorm removed, fc merging
[embedding; target hidden] -> hidden) driven by
`srt/speculative/eagle_worker.py:79` (draft `:511`, verify `:670`).

TPU re-design: the draft is three jittable step shapes mirroring the
target's (extend / chain-decode / spec-width fixup), all writing into a
SEPARATE small KV pool that shares the target's page table and slot
arithmetic (draft pool has the draft's layer count, so it is ~L_target/
L_draft times smaller).  Draft KV is BEST-EFFORT: rejected-draft and
stale slots hold garbage that later writes overwrite — a bad draft only
lowers the acceptance length, never correctness, because every emitted
token comes from the target's verify pass.

Position convention (EAGLE shift): draft position i consumes
[target_hidden_i ; embed(token_{i+1})], so the draft sequence is one
shorter than the target's and "draft length" = target fill_len - 1.

Weight schema (public EAGLE checkpoints): `fc.weight` ([H, 2H] torch
layout), `layers.{l}.self_attn...` / `layers.{l}.mlp...` (llama names,
usually without the `model.` prefix), optional `norm.weight`; embeddings
and lm_head are the TARGET's (shared).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.layers.activation import silu_and_mul
from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope
from sglang_awq_tpu.mem_cache.kv_pool import write_kv
from sglang_awq_tpu.ops.ragged_attention import (
    ragged_decode,
    ragged_decode_xla,
    ragged_extend,
    ragged_extend_xla,
)
from sglang_awq_tpu.utils import is_tpu_backend


@dataclasses.dataclass
class EagleDraftModel:
    config: ModelConfig  # the DRAFT's config (num_layers = draft depth)
    tp_size: int = 1
    tp_axis: Optional[str] = None

    def __post_init__(self):
        c = self.config
        self.qh = c.num_attention_heads // self.tp_size
        self.kvh = max(c.num_kv_heads // self.tp_size, 1)
        self.head_dim = c.head_dim
        self.sm_scale = 1.0 / float(np.sqrt(c.head_dim))
        q = c.quant_config
        H = c.hidden_size
        qkv_n = (self.qh + 2 * self.kvh) * self.head_dim * self.tp_size
        self.specs: Dict[str, LinearSpec] = {
            "qkv": LinearSpec.make("qkv", H, qkv_n, q, "column", self.tp_size),
            "o": LinearSpec.make(
                "o", self.qh * self.head_dim * self.tp_size, H, q, "row",
                self.tp_size,
            ),
            "gate_up": LinearSpec.make(
                "gate_up", H, 2 * c.intermediate_size, q, "column", self.tp_size
            ),
            "down": LinearSpec.make(
                "down", c.intermediate_size, H, q, "row", self.tp_size
            ),
            # fc merges [embed ; hidden] -> hidden; replicated (tiny)
            "fc": LinearSpec.make("fc", 2 * H, H, None, None, 1),
        }

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H = c.num_layers, c.hidden_size
        shapes: Dict[str, Any] = {
            "fc": {"weight": ((2 * H, H), jnp.bfloat16)},
            "layers": {
                # layer 0's input norm is SKIPPED in the forward (EAGLE);
                # keep the array for uniform stacking
                "input_norm": ((L, H), jnp.float32),
                "post_norm": ((L, H), jnp.float32),
            },
            "final_norm": ((H,), jnp.float32),
        }
        for name, spec in self.specs.items():
            if name == "fc":
                continue
            shapes["layers"][name] = spec.param_shapes(L, tp_size=1)
        return shapes

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random draft weights (tests / bench: drafts will be near-chance,
        which only lowers acceptance, never correctness)."""
        rng = np.random.default_rng(seed)
        is_shape = (
            lambda x: isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], tuple)
        )
        out = jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s[0]) * 0.02, s[1]
            ),
            self.param_shapes(),
            is_leaf=is_shape,
        )
        out["layers"]["input_norm"] = jnp.ones_like(out["layers"]["input_norm"])
        out["layers"]["post_norm"] = jnp.ones_like(out["layers"]["post_norm"])
        out["final_norm"] = jnp.ones_like(out["final_norm"])
        return out

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def _maybe_psum(self, x):
        if self.tp_axis is not None:
            return jax.lax.psum(x, self.tp_axis)
        return x

    def _merge(self, embed_w, tokens, hidden):
        """fc([embed(tokens) ; hidden]) -> [T, H] bf16."""
        e = embed_w[tokens].astype(jnp.bfloat16)
        h = hidden.astype(jnp.bfloat16)
        x = jnp.concatenate([e, h], axis=-1)
        return jnp.dot(
            x, self._fc_weight, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    def _final_hidden(self, params, x):
        """Post-stack transform whose output is BOTH the chain-recurrence
        hidden and the head input (EAGLE1: the final RMSNorm).  EAGLE3
        overrides: the recurrence carries the PRE-norm hidden and the head
        applies the norm separately (head_input)."""
        return rms_norm(x, params["final_norm"], self.config.rms_norm_eps)

    def head_input(self, params, g):
        """Transform a recurrence hidden into the lm-head input."""
        return g

    def head_params(self, params, target_head):
        """The lm-head weights to score drafts with (EAGLE1 shares the
        target's; EAGLE3 checkpoints may carry their own draft-vocab
        head)."""
        return target_head

    def map_draft_ids(self, params, ids):
        """Draft-vocab token ids -> target-vocab ids (EAGLE3 d2t)."""
        return ids

    def start_hidden(self, params, h):
        """Normalize a chain-START feature to the recurrence width: EAGLE3
        fuses the [*, 3H] target aux concat through fc once; within-chain
        hiddens pass through."""
        return h

    def _layer(self, params, x, l, positions, rope_tab, attn_fn):
        c = self.config
        lp = params["layers"]
        T = x.shape[0]
        D = self.head_dim

        # EAGLE: layer 0 takes the fc output UN-normalized
        h = jax.lax.cond(
            jnp.asarray(l) == 0,
            lambda: x.astype(jnp.float32),
            lambda: rms_norm(x, lp["input_norm"][l], c.rms_norm_eps).astype(
                jnp.float32
            ),
        ).astype(x.dtype)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
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

        h2 = rms_norm(x, lp["post_norm"][l], c.rms_norm_eps)
        gu = linear_apply(self.specs["gate_up"], lp["gate_up"], h2, l)
        act = silu_and_mul(gu)
        d = linear_apply(self.specs["down"], lp["down"], act, l)
        x = x + self._maybe_psum(d.astype(jnp.float32)).astype(x.dtype)
        return x

    def extend_hidden(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,
        rope_tab: jax.Array,
        embed_w: jax.Array,  # target embedding [V, H]
        tokens: jax.Array,  # [TQ] SHIFTED tokens (t_{i+1} at draft pos i)
        hidden: jax.Array,  # [TQ, H] target hidden at draft pos i
        positions: jax.Array,  # [TQ]
        slots: jax.Array,  # [TQ] draft-pool slots (PAD_SLOT pads)
        page_table: jax.Array,  # [B, PMAX]
        kv_lens: jax.Array,  # [B] draft kv length incl. this chunk
        q_lens: jax.Array,  # [B]
        qb_base: jax.Array,  # [B]
        block_q: int = 128,
    ) -> jax.Array:
        """Draft prefill over a (chunk of a) prompt -> updated draft kv."""
        self._fc_weight = params["fc"]["weight"]
        x = self._merge(embed_w, tokens, hidden)
        use_xla = not is_tpu_backend()

        def body(carry, l):
            x, kv = carry

            def attn(q, k, v, l):
                st["kv"] = write_kv(st["kv"], k, v, slots, l, mode="prefill")
                fn = ragged_extend_xla if use_xla else ragged_extend
                return fn(
                    q, st["kv"], page_table, kv_lens, q_lens, qb_base, l,
                    sm_scale=self.sm_scale, block_q=block_q,
                )

            st = {"kv": kv}
            x = self._layer(params, x, l, positions, rope_tab, attn)
            return (x, st["kv"]), None

        (_, kv_cache), _ = jax.lax.scan(
            body, (x, kv_cache), jnp.arange(self.config.num_layers)
        )
        return kv_cache

    def decode_hidden(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,
        rope_tab: jax.Array,
        embed_w: jax.Array,
        tokens: jax.Array,  # [B] token t_{i+1}
        hidden: jax.Array,  # [B, H] hidden at draft position i
        positions: jax.Array,  # [B] draft position i
        slots: jax.Array,  # [B]
        page_table: jax.Array,
        lengths: jax.Array,  # [B] draft length incl. this position
    ) -> Tuple[jax.Array, jax.Array]:
        """One draft chain step -> (draft hidden [B, H] f32, kv)."""
        self._fc_weight = params["fc"]["weight"]
        x = self._merge(embed_w, tokens, hidden)
        use_xla = not is_tpu_backend()

        def body(carry, l):
            x, kv = carry

            def attn(q, k, v, l):
                st["kv"] = write_kv(st["kv"], k, v, slots, l, mode="decode")
                fn = ragged_decode_xla if use_xla else ragged_decode
                out = fn(
                    q[:, None], st["kv"], page_table, lengths, l,
                    sm_scale=self.sm_scale,
                )
                return out[:, 0]

            st = {"kv": kv}
            x = self._layer(params, x, l, positions, rope_tab, attn)
            return (x, st["kv"]), None

        (x, kv_cache), _ = jax.lax.scan(
            body, (x, kv_cache), jnp.arange(self.config.num_layers)
        )
        h = self._final_hidden(params, x)
        return h.astype(jnp.float32), kv_cache

    def tree_hidden(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,  # draft pool (READ-ONLY here: no tree writes)
        rope_tab: jax.Array,
        embed_w: jax.Array,
        tokens: jax.Array,  # [B, F] frontier node tokens
        hidden: jax.Array,  # [B, F, H] parent draft hiddens
        positions: jax.Array,  # [B] draft position of this level
        page_table: jax.Array,  # [B, PMAX]
        lengths: jax.Array,  # [B] draft prefix length (incl. the root row)
        nodes_k: jax.Array,  # [L, B, M, KVH*D] bf16 expanded-node K
        nodes_v: jax.Array,  # [L, B, M, KVH*D]
        anc: jax.Array,  # [B, F, M] bool: frontier ancestors among slots
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Score-driven tree expansion step: draft-forward F frontier nodes
        at once -> (hidden [B, F, H] f32, k [L, B, F, KVH*D], v [...]).

        Reference role: the per-level draft forward inside
        `eagle_worker.py:511` draft_forward with select_top_k_tokens — the
        reference carries a growing tree mask through the draft; here the
        PREFIX piece rides the paged megakernel via the head-fold trick
        (all F nodes see [0, len) uniformly) and the TREE tail attends the
        expanded nodes' K/V held in-hand, masked by ancestry, merged by
        softmax stats — no draft-pool writes, so a rejected branch never
        corrupts draft KV (the static-tree path's best-effort overwrite
        weakness)."""
        B, F = tokens.shape
        H = hidden.shape[-1]
        kvh, G, D = self.kvh, self.qh // self.kvh, self.head_dim
        n = self.qh
        M = nodes_k.shape[2]
        self._fc_weight = params["fc"]["weight"]
        x = self._merge(
            embed_w, tokens.reshape(-1), hidden.reshape(B * F, H)
        )
        flat_pos = jnp.repeat(positions, F)
        use_xla = not is_tpu_backend()

        def body(x, xs):
            l, nk_l, nv_l = xs

            def attn(q, k, v, l):
                st["k"], st["v"] = k, v  # [B*F, kvh, D]
                qs = q.reshape(B, F, kvh, G, D)
                # prefix: fold nodes into the head dim (uniform limit)
                qf = jnp.transpose(qs, (0, 2, 1, 3, 4)).reshape(
                    B, 1, F * n, D)
                fn = ragged_decode_xla if use_xla else ragged_decode
                o1, m1, l1 = fn(
                    qf, kv_cache, page_table, lengths, l,
                    sm_scale=self.sm_scale, want_stats=True,
                )
                o1 = o1.reshape(B, kvh, F, G, D)
                o1 = jnp.transpose(o1, (0, 2, 1, 3, 4)).reshape(B, F, n, D)
                m1 = jnp.transpose(
                    m1.reshape(B, kvh, F, G), (0, 2, 1, 3)).reshape(B, F, n)
                l1 = jnp.transpose(
                    l1.reshape(B, kvh, F, G), (0, 2, 1, 3)).reshape(B, F, n)
                if M:
                    kt = nk_l.reshape(B, M, kvh, D)
                    vt = nv_l.reshape(B, M, kvh, D)
                    s2 = jnp.einsum(
                        "bfkgd,bmkd->bkgfm", qs.astype(jnp.float32),
                        kt.astype(jnp.float32),
                    ) * self.sm_scale  # [B, KVH, G, F, M]
                    s2 = jnp.where(anc[:, None, None], s2, -1e30)
                    m2 = jnp.max(s2, axis=-1)  # [B, KVH, G, F]
                    p2 = jnp.exp(s2 - m2[..., None])
                    l2 = jnp.sum(p2, axis=-1)
                    a2 = jnp.einsum(
                        "bkgfm,bmkd->bfkgd", p2, vt.astype(jnp.float32))
                    m2 = jnp.transpose(m2, (0, 3, 1, 2)).reshape(B, F, n)
                    l2 = jnp.transpose(l2, (0, 3, 1, 2)).reshape(B, F, n)
                    a2 = a2.reshape(B, F, n, D)
                    m = jnp.maximum(m1, m2)
                    w1 = jnp.exp(m1 - m) * l1
                    w2 = jnp.exp(m2 - m)
                    denom = w1 + w2 * l2
                    denom = jnp.where(denom == 0.0, 1.0, denom)
                    out = (o1 * w1[..., None] + a2 * w2[..., None]) / (
                        denom[..., None])
                else:
                    out = o1
                return out.reshape(B * F, n, D)

            st = {}
            x = self._layer(params, x, l, flat_pos, rope_tab, attn)
            return x, (st["k"].reshape(B, F, kvh * D),
                       st["v"].reshape(B, F, kvh * D))

        L = self.config.num_layers
        x, (ks, vs) = jax.lax.scan(
            body, x, (jnp.arange(L), nodes_k, nodes_v)
        )
        g = self._final_hidden(params, x)
        return (
            g.reshape(B, F, H).astype(jnp.float32),
            ks.astype(jnp.bfloat16),
            vs.astype(jnp.bfloat16),
        )

    def spec_hidden(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,
        rope_tab: jax.Array,
        embed_w: jax.Array,
        tokens: jax.Array,  # [B, QS] shifted tokens
        hidden: jax.Array,  # [B, QS, H] target hidden per position
        positions: jax.Array,  # [B, QS]
        slots: jax.Array,  # [B, QS]
        page_table: jax.Array,
        lengths: jax.Array,  # [B] draft length incl. all QS positions
    ) -> jax.Array:
        """Post-verify fixup: re-run the draft over the verify window with
        TRUE target hiddens, repairing the chain's provisional KV -> kv."""
        B, QS = tokens.shape
        self._fc_weight = params["fc"]["weight"]
        x = self._merge(
            embed_w, tokens.reshape(-1), hidden.reshape(B * QS, -1)
        )
        flat_pos = positions.reshape(-1)
        flat_slots = slots.reshape(-1)
        use_xla = not is_tpu_backend()

        def body(carry, l):
            x, kv = carry

            def attn(q, k, v, l):
                st["kv"] = write_kv(st["kv"], k, v, flat_slots, l, mode="spec")
                qs = q.reshape(B, QS, self.qh, self.head_dim)
                fn = ragged_decode_xla if use_xla else ragged_decode
                out = fn(
                    qs, st["kv"], page_table, lengths, l, sm_scale=self.sm_scale
                )
                return out.reshape(B * QS, self.qh, self.head_dim)

            st = {"kv": kv}
            x = self._layer(params, x, l, flat_pos, rope_tab, attn)
            return (x, st["kv"]), None

        (_, kv_cache), _ = jax.lax.scan(
            body, (x, kv_cache), jnp.arange(self.config.num_layers)
        )
        return kv_cache


def load_draft_params(model: EagleDraftModel, tensors: Dict[str, np.ndarray]):
    """Flat EAGLE-named tensors -> stacked draft param pytree.

    Accepts both `layers.0...` (public EAGLE) and `model.layers.0...`
    naming; `norm.weight` is optional (identity when absent)."""
    from sglang_awq_tpu.model_loader.loader import load_params_from_tensors

    # normalize to the llama schema the shared loader expects
    t = {}
    H = model.config.hidden_size
    for k, v in tensors.items():
        k2 = k
        if k2.startswith("model."):
            k2 = k2[len("model."):]
        if k2.startswith("layers."):
            t["model." + k2] = v
        elif k2 in ("norm.weight",):
            t["model.norm.weight"] = v
        elif k2 in ("fc.weight", "fc.bias", "embed_tokens.weight",
                    "lm_head.weight"):
            t[k2] = v
    if "model.norm.weight" not in t:
        t["model.norm.weight"] = np.ones(H, np.float32)
    # loader requires embed/lm_head; draft shares the target's — dummies
    t.setdefault("model.embed_tokens.weight", np.zeros((1, H), np.float32))
    t.setdefault("lm_head.weight", np.zeros((1, H), np.float32))
    params = load_params_from_tensors(model, t)
    del params["embed"], params["lm_head"]
    fc = t["fc.weight"]
    params["fc"] = {"weight": jnp.asarray(fc.T, jnp.bfloat16)}  # [2H, H]
    return params


@dataclasses.dataclass
class Eagle3DraftModel(EagleDraftModel):
    """EAGLE3 draft (aux-hidden-fusion, reference
    `srt/models/llama_eagle3.py:186` LlamaForCausalLMEagle3).

    Differences vs EAGLE1, mapped onto the shared step functions:

    * the recurrence carries TWO streams — the new token's embedding and
      the previous hidden — normed SEPARATELY (input_layernorm on the
      embedding, hidden_norm on the hidden) and concatenated into a 2H-in
      qkv projection.  Here `_merge` returns the [T, 2H] concat and
      `_layer` splits it; the layer returns [embeds ; out] so the scan
      carry keeps its shape (a >1-layer EAGLE3 would re-consume the same
      embedding, matching the reference's single-midlayer constraint).
    * the FIRST draft step's hidden is fc(concat of THREE captured target
      layer hiddens) [T, 3*target_H]; later steps feed the previous draft
      hidden [T, H] straight through (`_merge` dispatches on width).
    * the residual is the HIDDEN stream (not the fused input).
    * the recurrence hidden is the PRE-final-norm output; only the head
      input is normed (`head_input`).
    * checkpoints may carry their own draft-vocab lm_head plus a `d2t`
      diff table: target_id = draft_id + d2t[draft_id] (`map_draft_ids`).
    """

    target_hidden_size: int = 0  # 0 = same as draft hidden_size

    def __post_init__(self):
        super().__post_init__()
        c = self.config
        H = c.hidden_size
        Ht = self.target_hidden_size or H
        self.aux_width = 3 * Ht
        assert c.num_layers == 1, "EAGLE3: single midlayer (reference)"
        # qkv consumes [normed embed ; normed hidden]
        q = c.quant_config
        qkv_n = (self.qh + 2 * self.kvh) * self.head_dim * self.tp_size
        self.specs["qkv"] = LinearSpec.make(
            "qkv", 2 * H, qkv_n, q, "column", self.tp_size)
        self.specs["fc"] = LinearSpec.make(
            "fc", self.aux_width, H, None, None, 1)

    def param_shapes(self):
        c = self.config
        H = c.hidden_size
        shapes = super().param_shapes()
        shapes["fc"] = {"weight": ((self.aux_width, H), jnp.bfloat16)}
        shapes["layers"]["hidden_norm"] = ((c.num_layers, H), jnp.float32)
        return shapes

    def random_params(self, seed: int = 0):
        out = super().random_params(seed)
        out["layers"]["hidden_norm"] = jnp.ones_like(
            out["layers"]["input_norm"])
        return out

    def _merge(self, embed_w, tokens, hidden):
        e = embed_w[tokens].astype(jnp.bfloat16)
        h = hidden.astype(jnp.bfloat16)
        if h.shape[-1] == self.aux_width:
            h = jnp.dot(
                h, self._fc_weight, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
        return jnp.concatenate([e, h], axis=-1)  # [T, 2H]

    def _layer(self, params, x, l, positions, rope_tab, attn_fn):
        c = self.config
        lp = params["layers"]
        H = c.hidden_size
        T = x.shape[0]
        D = self.head_dim
        e, h = x[:, :H], x[:, H:]
        en = rms_norm(e, lp["input_norm"][l], c.rms_norm_eps)
        hn = rms_norm(h, lp["hidden_norm"][l], c.rms_norm_eps)
        a_in = jnp.concatenate([en, hn], axis=-1)  # [T, 2H]
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], a_in, l)
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
        x1 = h + self._maybe_psum(o.astype(jnp.float32)).astype(h.dtype)
        h2 = rms_norm(x1, lp["post_norm"][l], c.rms_norm_eps)
        gu = linear_apply(self.specs["gate_up"], lp["gate_up"], h2, l)
        act = silu_and_mul(gu)
        d = linear_apply(self.specs["down"], lp["down"], act, l)
        out = x1 + self._maybe_psum(d.astype(jnp.float32)).astype(x1.dtype)
        return jnp.concatenate([e, out], axis=-1)

    def _final_hidden(self, params, x):
        H = self.config.hidden_size
        return x[:, H:]  # PRE-norm hidden drives the recurrence

    def head_input(self, params, g):
        return rms_norm(
            g.astype(jnp.bfloat16), params["final_norm"],
            self.config.rms_norm_eps,
        )

    def head_params(self, params, target_head):
        return params.get("lm_head") or target_head

    def map_draft_ids(self, params, ids):
        d2t = params.get("d2t")
        if d2t is None:
            return ids
        return (ids + d2t[ids]).astype(jnp.int32)

    def start_hidden(self, params, h):
        if h.shape[-1] != self.aux_width:
            return h
        return jnp.dot(
            h.astype(jnp.bfloat16),
            params["fc"]["weight"],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)


def load_draft_params_eagle3(model: Eagle3DraftModel,
                             tensors: Dict[str, np.ndarray]):
    """EAGLE3 checkpoint schema (`midlayer.*`, fc [H, 3*Ht] torch layout,
    optional draft-vocab lm_head + d2t diff table + own embed_tokens)."""
    t = {}
    H = model.config.hidden_size
    hidden_norm = None
    for k, v in tensors.items():
        k2 = k[len("model."):] if k.startswith("model.") else k
        if k2.startswith("midlayer."):
            rest = k2[len("midlayer."):]
            if rest == "hidden_norm.weight":
                hidden_norm = v
                continue
            t["model.layers.0." + rest] = v
        elif k2.startswith("layers.0."):
            if k2.endswith("hidden_norm.weight"):
                hidden_norm = v
                continue
            t["model." + k2] = v
        elif k2 == "norm.weight":
            t["model.norm.weight"] = v
        elif k2 in ("fc.weight", "fc.bias"):
            t[k2] = v
        elif k2 in ("embed_tokens.weight", "lm_head.weight", "d2t", "t2d"):
            t[k2] = v
    if "model.norm.weight" not in t:
        t["model.norm.weight"] = np.ones(H, np.float32)
    from sglang_awq_tpu.model_loader.loader import load_params_from_tensors

    lt = dict(t)
    lt.setdefault("model.embed_tokens.weight", np.zeros((1, H), np.float32))
    lt.setdefault("lm_head.weight", np.zeros((1, H), np.float32))
    lt.pop("d2t", None)
    lt.pop("t2d", None)
    lt.pop("fc.weight", None)
    lt.pop("fc.bias", None)
    lt.pop("embed_tokens.weight", None)
    params = load_params_from_tensors(model, lt)
    del params["embed"], params["lm_head"]
    params["fc"] = {
        "weight": jnp.asarray(np.asarray(t["fc.weight"]).T, jnp.bfloat16)
    }
    assert params["fc"]["weight"].shape == (model.aux_width, H), (
        params["fc"]["weight"].shape, model.aux_width)
    if hidden_norm is None:
        hidden_norm = np.ones(H, np.float32)
    params["layers"]["hidden_norm"] = jnp.asarray(
        hidden_norm, jnp.float32)[None]
    if "embed_tokens.weight" in t:
        params["embed_w"] = jnp.asarray(
            t["embed_tokens.weight"], jnp.bfloat16)
    if "lm_head.weight" in t:
        params["lm_head"] = {
            "weight": jnp.asarray(np.asarray(t["lm_head.weight"]).T,
                                  jnp.bfloat16)
        }
    if "d2t" in t:
        params["d2t"] = jnp.asarray(t["d2t"], jnp.int32)
    return params


def is_eagle3_checkpoint(tensors: Dict[str, np.ndarray],
                         hidden_size: int) -> bool:
    """Detect EAGLE3 drafts: midlayer naming, a d2t table, or a 3x-wide
    fusion fc."""
    for k in tensors:
        if "midlayer." in k or k.split(".")[-1] == "d2t":
            return True
        if k.endswith("fc.weight") and tensors[k].shape[-1] > 2 * hidden_size:
            return True
    return False
