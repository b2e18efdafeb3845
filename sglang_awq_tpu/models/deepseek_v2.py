"""DeepSeek-V2 / V3 (MLA + DeepSeekMoE) causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/deepseek_v2.py`
(DeepseekV2AttentionMLA — absorbed decode path, `MLATokenToKVPool`
`mem_cache/memory_pool.py:1396`) and the DeepSeekMoE gate
(`layers/moe/topk.py` group-limited / noaux-tc routing).

TPU re-design:

* **Absorbed MLA on the existing ragged kernels.**  The latent cache row
  is `[c_kv (rank) | k_pe (rope) | pad]`, padded to a 128-lane multiple
  (640 for rank=512, rope=64).  Per-head queries are absorbed into latent
  space: `q_abs_h = q_nope_h @ W_uk_h` so scores are
  `q_abs·c + q_pe·k_pe` — exactly one MQA dot against the latent row.
  The attention output in latent space is up-projected per head with
  `W_uv_h`.  This makes MLA literally a KVH=1, D=640 instance of
  `ragged_decode`/`ragged_extend`.  Round 4: the pool stores the latent
  row ONCE — the 4-dim "latent" layout ([L, P, ps, Xr], K == V, the
  reference's single-row MLA cache `memory_pool.py:1396`) halves the
  round-3 K/V-face-pair bytes to 1.0x minimal; the ragged kernels read
  the same chunk for both dots and token writes go through 8-row
  read-modify-write groups (HBM tile alignment).  tp>1 keeps the
  combined layout for now (replicated-latent sharding is rank-keyed).
* **Heterogeneous layer stacks via two-segment indexing.**  DeepSeek has
  `first_k_dense_replace` dense-MLP layers before the MoE layers.  The
  layer scan stays ONE scan over all layers; `_mlp` switches on
  `l < first_k_dense` with `lax.cond`, and each branch indexes its own
  stack (dense stacks `[k, ...]`, MoE stacks `[L-k, ...]`) with a clamped
  local index — no padding, no unrolling.
* **Dense all-expert MoE** (models/mixtral.py rationale) with the
  DeepSeek gates: softmax+greedy (V2-Lite), group-limited greedy (V2),
  sigmoid+noaux-tc with e_score_correction_bias (V3); shared experts
  always-on; `routed_scaling_factor` on the routed weights.
* `kv_b_proj` is always materialized bf16 (AWQ checkpoints de-quantize it
  at load): the absorb einsums contract it per head, which the packed
  kernel cannot do.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sglang_awq_tpu.layers.activation import silu_and_mul
from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope, rope_table
from sglang_awq_tpu.models.llama import LlamaForCausalLM


@dataclasses.dataclass
class DeepseekV2ForCausalLM(LlamaForCausalLM):
    def __post_init__(self):
        super().__post_init__()
        c = self.config
        hf = c.hf_config
        assert self.pp_size == 1, "MLA + PP: not supported yet"
        # MLA TP (reference deepseek_v2.py absorbed-MLA TP): q heads shard
        # over the model axis; the latent projections (kv_a) stay replicated
        # so every shard computes the same latent row, and the KVH=1 cache
        # is replicated per shard (the pool's kv_heads=1-per-shard geometry
        # gives each shard its own full-width latent copy).  o is
        # row-parallel over heads; the psum after o is the head combine.
        self.q_lora_rank = hf.get("q_lora_rank")
        self.kv_lora_rank = int(hf["kv_lora_rank"])
        self.qk_nope = int(hf["qk_nope_head_dim"])
        self.qk_rope = int(hf["qk_rope_head_dim"])
        self.v_dim = int(hf["v_head_dim"])
        self.n_heads = int(hf["num_attention_heads"])
        assert self.n_heads % self.tp_size == 0, (self.n_heads, self.tp_size)
        self.n_local = self.n_heads // self.tp_size
        # HF DeepseekV2Attention.scaling = qk_head_dim ** -0.5
        self.sm_scale = float((self.qk_nope + self.qk_rope) ** -0.5)
        rs = c.rope_scaling
        if rs and rs.get("rope_type", rs.get("type")) == "yarn" and rs.get(
            "mscale_all_dim"
        ):
            # DeepSeek yarn: score scale gains mscale(factor*mscale_all)^2
            # (reference deepseek_v2.py yarn_get_mscale); HF folds the same
            # factor into attention_scaling of cos/sin for the pe part —
            # our rope_table does too, so only warn if both disagree.
            pass
        # interleaved rope (HF view_as_complex pairs): permute pe features
        # even-first so the half-split apply_rope matches (llama.py
        # rope_interleaved trick, applied to the 64-dim pe slice only)
        self._pe_perm = np.concatenate(
            [np.arange(0, self.qk_rope, 2), np.arange(1, self.qk_rope, 2)]
        )

        # --- MoE geometry ---
        self.num_experts = int(hf.get("n_routed_experts") or 0)
        self.first_k_dense = (
            int(hf.get("first_k_dense_replace", 0)) if self.num_experts else c.num_layers
        )
        if self.first_k_dense >= c.num_layers:  # every layer dense
            self.num_experts = 0
            self.first_k_dense = c.num_layers
        if self.num_experts:
            assert int(hf.get("moe_layer_freq", 1)) == 1, "moe_layer_freq != 1"
            self.top_k = int(hf["num_experts_per_tok"])
            self.moe_inter = int(hf["moe_intermediate_size"])
            self.n_shared = int(hf.get("n_shared_experts") or 0)
            self.routed_scale = float(hf.get("routed_scaling_factor", 1.0))
            self.topk_method = hf.get("topk_method") or (
                "noaux_tc" if hf.get("scoring_func") == "sigmoid" else "greedy"
            )
            self.n_group = int(hf.get("n_group") or 1)
            self.topk_group = int(hf.get("topk_group") or 1)
            self.norm_topk = bool(hf.get("norm_topk_prob", False))
            self.expert_inter = self.moe_inter
            assert self.num_experts % self.tp_size == 0, (
                self.num_experts, self.tp_size)
            self.experts_local = self.num_experts // self.tp_size
        self.expert_dist_sink = None  # EPLB observability (mixtral parity)

        # --- specs: replace the llama qkv/o/mlp set ---
        q = c.quant_config
        H = c.hidden_size
        qk_head = self.qk_nope + self.qk_rope
        self.specs = {}
        if self.q_lora_rank:
            self.specs["q_a"] = LinearSpec.make(
                "q_a", H, int(self.q_lora_rank), q, None)
            self.specs["q_b"] = LinearSpec.make(
                "q_b", int(self.q_lora_rank), self.n_heads * qk_head, q,
                "column", self.tp_size)
        else:
            self.specs["q"] = LinearSpec.make(
                "q", H, self.n_heads * qk_head, q, "column", self.tp_size)
        self.specs["kv_a"] = LinearSpec.make(
            "kv_a", H, self.kv_lora_rank + self.qk_rope, q, None)
        # kv_b stays bf16 (absorb einsums need the plain [rank, H*(nope+v)])
        self.specs["kv_b"] = LinearSpec.make(
            "kv_b", self.kv_lora_rank, self.n_heads * (self.qk_nope + self.v_dim),
            None, "column", self.tp_size)
        self.specs["o"] = LinearSpec.make(
            "o", self.n_heads * self.v_dim, H, q, "row", self.tp_size)
        k = self.first_k_dense
        tp = self.tp_size
        if k > 0:
            self.specs["dense_gate_up"] = LinearSpec.make(
                "dense_gate_up", H, 2 * c.intermediate_size, q, "column", tp)
            self.specs["dense_down"] = LinearSpec.make(
                "dense_down", c.intermediate_size, H, q, "row", tp)
        if self.num_experts:
            E, I = self.num_experts, self.moe_inter
            self.specs["gate_up"] = LinearSpec.make(
                "gate_up", H, E * 2 * I, q, "column", tp)
            self.specs["down"] = LinearSpec.make(
                "down", E * I, H, q, "row", tp, k_align=I)
            if self.n_shared:
                si = self.n_shared * I
                self.specs["shared_gate_up"] = LinearSpec.make(
                    "shared_gate_up", H, 2 * si, q, "column", tp)
                self.specs["shared_down"] = LinearSpec.make(
                    "shared_down", si, H, q, "row", tp)

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------

    def _seg_layers(self, name: str) -> int:
        """Leading (layer) dim of a spec's stack."""
        L = self.config.num_layers
        if name.startswith("dense_"):
            return self.first_k_dense
        if name in ("gate_up", "down", "shared_gate_up", "shared_down"):
            return L - self.first_k_dense
        return L

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H, V = c.num_layers, c.hidden_size, c.vocab_size
        shapes: Dict[str, Any] = {
            "embed": {"weight": ((V, H), jnp.bfloat16)},
            "layers": {
                "input_norm": ((L, H), jnp.float32),
                "post_norm": ((L, H), jnp.float32),
                "kv_a_norm": ((L, self.kv_lora_rank), jnp.float32),
            },
            "final_norm": ((H,), jnp.float32),
            "lm_head": {"weight": ((H, V), jnp.bfloat16)},
        }
        if self.q_lora_rank:
            shapes["layers"]["q_a_norm"] = (
                (L, int(self.q_lora_rank)), jnp.float32)
        for name, spec in self.specs.items():
            shapes["layers"][name] = spec.param_shapes(self._seg_layers(name))
        if self.num_experts:
            Lm = L - self.first_k_dense
            shapes["layers"]["router"] = (
                (Lm, H, self.num_experts), jnp.bfloat16)
            if self.topk_method == "noaux_tc":
                shapes["layers"]["router_bias"] = (
                    (Lm, self.num_experts), jnp.float32)
        return shapes

    def merge_schema(self) -> Dict[str, tuple]:
        L = self.config.num_layers
        k = self.first_k_dense
        schema: Dict[str, tuple] = {
            "kv_a": (["self_attn.kv_a_proj_with_mqa"], "n"),
            "kv_b": (["self_attn.kv_b_proj"], "n"),
            "o": (["self_attn.o_proj"], "n"),
        }
        if self.q_lora_rank:
            schema["q_a"] = (["self_attn.q_a_proj"], "n")
            schema["q_b"] = (["self_attn.q_b_proj"], "n")
        else:
            schema["q"] = (["self_attn.q_proj"], "n")
        if k > 0:
            schema["dense_gate_up"] = (
                ["mlp.gate_proj", "mlp.up_proj"], "n", (0, k))
            schema["dense_down"] = (["mlp.down_proj"], "n", (0, k))
        if self.num_experts:
            E = self.num_experts
            schema["gate_up"] = (
                [f"mlp.experts.{e}.{w}" for e in range(E)
                 for w in ("gate_proj", "up_proj")],
                "ne", (k, L))
            schema["down"] = (
                [f"mlp.experts.{e}.down_proj" for e in range(E)], "k", (k, L))
            if self.n_shared:
                schema["shared_gate_up"] = (
                    ["mlp.shared_experts.gate_proj",
                     "mlp.shared_experts.up_proj"], "n", (k, L))
                schema["shared_down"] = (
                    ["mlp.shared_experts.down_proj"], "n", (k, L))
        return schema

    def pretranslate_tensors(self, tensors):
        """De-quantize kv_b_proj when the checkpoint packs it as AWQ: the
        absorbed einsums need the plain bf16 [rank -> heads*(nope+v)]."""
        from sglang_awq_tpu.quantization.awq_config import awq_dequantize_ref

        qc = self.config.quant_config
        out = dict(tensors)
        for l in range(self.config.num_layers):
            base = f"model.layers.{l}.self_attn.kv_b_proj"
            if base + ".qweight" in out:
                w = awq_dequantize_ref(
                    out[base + ".qweight"],
                    out[base + ".scales"],
                    out.get(base + ".qzeros"),
                    qc.group_size if qc else 128,
                )  # [K, N]
                out[base + ".weight"] = np.ascontiguousarray(w.T)  # torch [out, in]
                for suf in (".qweight", ".scales", ".qzeros"):
                    out.pop(base + suf, None)
        return out

    def extra_layer_params(self, t, L: int) -> Dict[str, jax.Array]:
        k = self.first_k_dense
        out: Dict[str, jax.Array] = {
            "kv_a_norm": jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.self_attn.kv_a_layernorm.weight")
                    for l in range(L)
                ]), jnp.float32),
        }
        if self.q_lora_rank:
            out["q_a_norm"] = jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.self_attn.q_a_layernorm.weight")
                    for l in range(L)
                ]), jnp.float32)
        if self.num_experts:
            out["router"] = jnp.asarray(
                np.stack([
                    t(f"model.layers.{l}.mlp.gate.weight").T
                    for l in range(k, L)
                ]), jnp.bfloat16)
            if self.topk_method == "noaux_tc":
                out["router_bias"] = jnp.asarray(
                    np.stack([
                        t(f"model.layers.{l}.mlp.gate.e_score_correction_bias")
                        for l in range(k, L)
                    ]), jnp.float32)
        return out

    def rope(self) -> jax.Array:
        c = self.config
        return rope_table(
            c.context_length, self.qk_rope, c.rope_theta, c.rope_scaling,
            trained_max=c.max_position_embeddings,
        )

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,  # [T, H] bf16
        l: jax.Array,
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
        lora_idx: Optional[jax.Array] = None,
    ) -> jax.Array:
        assert lora_idx is None, "LoRA on MLA models: not supported (v1)"
        c = self.config
        lp = params["layers"]

        h = rms_norm(x, lp["input_norm"][l], c.rms_norm_eps)
        o = self._mla_attn(params, h, l, positions, rope_tab, attn_fn)
        x = x + self._maybe_psum(o.astype(jnp.float32)).astype(x.dtype)

        h2 = rms_norm(x, lp["post_norm"][l], c.rms_norm_eps)
        d = self._mlp(lp, h2, l)
        x = x + self._maybe_psum(d.astype(jnp.float32)).astype(x.dtype)
        return x

    def _mla_attn(
        self,
        params: Dict[str, Any],
        h: jax.Array,  # [T, H] bf16 (post input-norm)
        l,  # traced or python layer index INTO THE ATTENTION STACKS
        positions: jax.Array,
        rope_tab: jax.Array,
        attn_fn,
    ) -> jax.Array:
        """Absorbed-MLA attention sub-block -> o-proj output [T, H].

        Split out of `_layer` so hybrid models (kimi_linear) can drive it
        per full-attention layer with compact stack indices.  When
        `self.mla_nope` (Kimi's `mla_use_nope`, reference
        `srt/models/deepseek_v2.py:1397` skip_rope), the pe slice passes
        through raw — no rotation, position-independent scores."""
        c = self.config
        lp = params["layers"]
        T = h.shape[0]
        rank, rope_d = self.kv_lora_rank, self.qk_rope
        nope, vd, n = self.qk_nope, self.v_dim, self.n_local
        Dp = self.head_dim  # padded latent row width (pool lane dim)

        # --- queries ---
        if self.q_lora_rank:
            qa = linear_apply(self.specs["q_a"], lp["q_a"], h, l)
            qa = rms_norm(qa, lp["q_a_norm"][l], c.rms_norm_eps)
            q = linear_apply(self.specs["q_b"], lp["q_b"], qa, l)
        else:
            q = linear_apply(self.specs["q"], lp["q"], h, l)
        q = q.reshape(T, n, nope + rope_d)
        q_nope, q_pe = q[..., :nope], q[..., nope:]

        # --- latent kv row ---
        kva = linear_apply(self.specs["kv_a"], lp["kv_a"], h, l)
        ckv = rms_norm(kva[:, :rank], lp["kv_a_norm"][l], c.rms_norm_eps)
        k_pe = kva[:, rank:]

        if not getattr(self, "mla_nope", False):
            perm = jnp.asarray(self._pe_perm)
            q_pe = q_pe[..., perm]
            k_pe = k_pe[:, perm]
            q_pe, k_pe = apply_rope(
                q_pe, k_pe[:, None, :], positions, rope_tab)
            k_pe = k_pe[:, 0]

        # --- absorb q into latent space ---
        kv_b = lax.dynamic_index_in_dim(
            lp["kv_b"]["weight"], jnp.asarray(l, jnp.int32), 0, keepdims=False
        ).reshape(rank, n, nope + vd)
        w_uk = kv_b[..., :nope]  # [rank, n, nope]
        w_uv = kv_b[..., nope:]  # [rank, n, vd]
        q_abs = jnp.einsum(
            "thd,rhd->thr", q_nope.astype(jnp.bfloat16), w_uk
        )  # [T, n, rank]

        pad = Dp - rank - rope_d
        q_full = jnp.concatenate(
            [
                q_abs.astype(jnp.bfloat16),
                q_pe.astype(jnp.bfloat16),
                jnp.zeros((T, n, pad), jnp.bfloat16),
            ],
            axis=-1,
        )
        row = jnp.concatenate(
            [
                ckv.astype(jnp.bfloat16),
                k_pe.astype(jnp.bfloat16),
                jnp.zeros((T, pad), jnp.bfloat16),
            ],
            axis=-1,
        )[:, None, :]

        ctx = attn_fn(q_full, row, row, l)  # [T, n, Dp] f32

        o_h = jnp.einsum(
            "thr,rhd->thd", ctx[..., :rank].astype(jnp.bfloat16), w_uv
        )  # [T, n, vd]
        return linear_apply(
            self.specs["o"], lp["o"], o_h.reshape(T, n * vd).astype(jnp.bfloat16), l
        )

    # ------------------------------------------------------------------
    # MoE with first-k-dense switch
    # ------------------------------------------------------------------

    def _dense_mlp(self, lp, h2, l):
        li = jnp.minimum(jnp.asarray(l, jnp.int32), self.first_k_dense - 1)
        gu = linear_apply(self.specs["dense_gate_up"], lp["dense_gate_up"], h2, li)
        act = silu_and_mul(gu)
        return linear_apply(self.specs["dense_down"], lp["dense_down"], act, li)

    def _record_experts(self, topi: jax.Array, l) -> None:
        if self.expert_dist_sink is None:
            return
        cnt = jnp.sum(
            jax.nn.one_hot(topi.reshape(-1), self.num_experts, dtype=jnp.int32),
            axis=0,
        )
        jax.experimental.io_callback(self.expert_dist_sink, None, l, cnt,
                                     ordered=False)

    def _experts_apply(self, lp, h2, topi, topv, li):
        from sglang_awq_tpu.models.mixtral import MixtralForCausalLM

        return MixtralForCausalLM._experts_apply(self, lp, h2, topi, topv, li)

    def _moe_mlp(self, lp, h2, l):
        E, K, I = self.num_experts, self.top_k, self.moe_inter
        T = h2.shape[0]
        li = jnp.maximum(jnp.asarray(l, jnp.int32) - self.first_k_dense, 0)

        logits = jnp.dot(
            h2, lp["router"][li], preferred_element_type=jnp.float32
        )  # [T, E]
        if self.topk_method == "noaux_tc":  # DeepSeek-V3
            scores = jax.nn.sigmoid(logits)
            choice = scores + lp["router_bias"][li][None, :]
        elif self.topk_method == "noaux_softmax":  # ERNIE 4.5 MoE
            scores = jax.nn.softmax(logits, axis=-1)
            choice = scores + lp["router_bias"][li][None, :]
        else:
            scores = jax.nn.softmax(logits, axis=-1)
            choice = scores
        if self.topk_method in ("group_limited_greedy", "noaux_tc") \
                and self.n_group > 1:
            gsz = E // self.n_group
            gview = choice.reshape(T, self.n_group, gsz)
            if self.topk_method == "noaux_tc":
                gscore = jnp.sum(lax.top_k(gview, 2)[0], axis=-1)
            else:
                gscore = jnp.max(gview, axis=-1)
            _, gidx = lax.top_k(gscore, self.topk_group)  # [T, topk_group]
            gmask = jnp.sum(
                jax.nn.one_hot(gidx, self.n_group, dtype=choice.dtype), axis=1
            )  # [T, n_group]
            choice = (gview * gmask[..., None]).reshape(T, E)
        topv, topi = lax.top_k(choice, K)
        self._record_experts(topi, li)
        # weights are the ORIGINAL scores of the selected experts (matters
        # for noaux_tc, where the bias shapes selection only)
        sel = jax.nn.one_hot(topi, E, dtype=scores.dtype)  # [T, K, E]
        w_sel = jnp.sum(sel * scores[:, None, :], axis=-1)  # [T, K]
        if self.norm_topk:
            w_sel = w_sel / (jnp.sum(w_sel, axis=-1, keepdims=True) + 1e-20)
        w_sel = w_sel * self.routed_scale
        out = self._experts_apply(lp, h2, topi, w_sel, li)
        if self.n_shared:
            sgu = linear_apply(
                self.specs["shared_gate_up"], lp["shared_gate_up"], h2, li)
            out = out + linear_apply(
                self.specs["shared_down"], lp["shared_down"],
                silu_and_mul(sgu), li)
        return out

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        del lora, lora_idx
        if not self.num_experts:
            return self._dense_mlp(lp, h2, l)
        if self.first_k_dense == 0:
            return self._moe_mlp(lp, h2, l)
        return lax.cond(
            jnp.asarray(l, jnp.int32) < self.first_k_dense,
            lambda: self._dense_mlp(lp, h2, l),
            lambda: self._moe_mlp(lp, h2, l),
        )


@dataclasses.dataclass
class DeepseekV3ForCausalLM(DeepseekV2ForCausalLM):
    """DeepSeek-V3 / R1: same MLA graph; sigmoid noaux-tc routing (handled
    by config detection in the V2 base)."""
