"""Llama-family causal LM, TPU-native.

Role model: reference `python/sglang/srt/models/llama.py` (`LlamaAttention:109`
QKVParallelLinear + RoPE + RadixAttention, `LlamaMLP:61`,
`LlamaForCausalLM.forward:460`).  TPU re-design:

* Functional: params are a pytree of LAYER-STACKED arrays; the forward is a
  `lax.scan` over layers, so one layer is traced/compiled once regardless of
  depth.  Quantized weights stay packed in the pytree; Pallas kernels index
  the stack with the scan's layer counter (no per-layer weight copies).
* Two jitted step shapes replace the reference's eager/graph split
  (SURVEY.md §7 decision 2): `decode_step` over a padded batch with paged
  attention, and `extend_step` over one request's padded token chunk with
  prefix-offset flash attention (chunked prefill).
* qkv / gate_up are merged at load (checkpoint q,k,v merge along N — valid
  because AWQ groups run along K).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.layers.activation import gelu_and_mul, silu_and_mul
from sglang_awq_tpu.layers.linear import LinearSpec, linear_apply, mlp_apply
from sglang_awq_tpu.layers.norm import rms_norm
from sglang_awq_tpu.layers.rotary import apply_rope, rope_table
from sglang_awq_tpu.mem_cache.kv_pool import PAD_SLOT, write_kv
from sglang_awq_tpu.ops.ragged_attention import (
    ragged_decode,
    ragged_decode_xla,
    ragged_extend,
    ragged_extend_xla,
)
from sglang_awq_tpu.utils import is_tpu_backend


@dataclasses.dataclass
class LlamaForCausalLM:
    config: ModelConfig
    tp_size: int = 1
    tp_axis: Optional[str] = None  # mesh axis name when running under shard_map
    qkv_bias: bool = False  # Qwen2 sets True
    qk_norm: bool = False  # Qwen3: per-head RMSNorm on q and k before RoPE
    qk_norm_full: bool = False  # OLMoE: RMSNorm over the FLAT q / k vectors
    qk_norm_post_rope: bool = False  # HunYuan: per-head norm AFTER RoPE
    embed_multiplier: float = 1.0  # Gemma scales embeddings by sqrt(H)
    residual_multiplier: float = 1.0  # Granite scales sub-block outputs
    rope_interleaved: bool = False  # Helium/Cohere-style (2i, 2i+1) pairs
    mlp_act: str = "silu"  # "silu" | "gelu" (Gemma GeGLU)
    layer_windows: tuple = None  # per-layer sliding window (0/None = full)
    attn_softcap: float = 0.0  # Gemma2 attn-logit softcapping
    alibi_slopes = None  # [QH] np.ndarray: ALiBi positional bias (baichuan 13B)
    attn_sinks: bool = False  # GPT-OSS learned per-head sink logits
    qkv_clip: float = 0.0  # clamp fused qkv outputs (OLMo/DBRX clip_qkv)
    pp_size: int = 1  # pipeline stages over the "stage" mesh axis
    stage_axis: Optional[str] = None
    pp_microbatches: int = 0  # decode microbatches per step (0 = 2*pp)
    # EAGLE3: capture the inputs of these layers as the draft's aux
    # hiddens (set by the runner; () = capture pre-final-norm hidden)
    aux_capture_layers: tuple = ()

    def __post_init__(self):
        c = self.config
        if self.pp_size > 1:
            assert c.num_layers % self.pp_size == 0, (
                c.num_layers, self.pp_size)
            assert not self.layer_windows, (
                "per-layer windows + pp need global-layer bookkeeping"
            )
        if self.rope_interleaved:
            # permute features (even indices first) so interleaved rotation
            # becomes the standard half-split one; q and k share the
            # permutation, so attention dots and the cached K are unchanged.
            # With partial rotary (GLM) only the rotated prefix interleaves.
            D0 = c.head_dim
            rot = int(D0 * float(
                c.hf_config.get("partial_rotary_factor", 1.0)
            ))
            self._rope_perm = np.concatenate(
                [np.arange(0, rot, 2), np.arange(1, rot, 2),
                 np.arange(rot, D0)]
            )
        if not self.layer_windows:
            # Mistral-style uniform sliding window (subclasses with
            # per-layer patterns overwrite after this); Qwen2-class configs
            # carry sliding_window with use_sliding_window=False — skip
            sw = int(c.hf_config.get("sliding_window") or 0)
            if sw and c.hf_config.get("use_sliding_window", True) \
                    and sw < c.context_length:
                assert self.pp_size == 1, (
                    "sliding-window + pp needs global-layer bookkeeping")
                self.layer_windows = tuple(sw for _ in range(c.num_layers))
        assert c.num_attention_heads % self.tp_size == 0
        assert c.num_kv_heads % self.tp_size == 0 or self.tp_size % c.num_kv_heads == 0
        self.qh = c.num_attention_heads // self.tp_size
        self.kvh = max(c.num_kv_heads // self.tp_size, 1)
        self.head_dim = c.head_dim
        self.sm_scale = 1.0 / float(np.sqrt(c.head_dim))
        q = c.quant_config
        H = c.hidden_size
        qkv_n = (self.qh + 2 * self.kvh) * self.head_dim * self.tp_size
        self.specs: Dict[str, LinearSpec] = {
            # K/N are FULL sizes; shard axis tells the sharder which dim splits
            "qkv": LinearSpec.make("qkv", H, qkv_n, q, "column", self.tp_size),
            "o": LinearSpec.make(
                "o", self.qh * self.head_dim * self.tp_size, H, q, "row", self.tp_size
            ),
            "gate_up": LinearSpec.make(
                "gate_up", H, 2 * c.intermediate_size, q, "column", self.tp_size
            ),
            "down": LinearSpec.make(
                "down", c.intermediate_size, H, q, "row", self.tp_size
            ),
        }

    # ------------------------------------------------------------------
    # parameter construction
    # ------------------------------------------------------------------

    def param_shapes(self) -> Dict[str, Any]:
        c = self.config
        L, H, V = c.num_layers, c.hidden_size, c.vocab_size
        shapes: Dict[str, Any] = {
            "embed": {"weight": ((V, H), jnp.bfloat16)},
            "layers": {
                "input_norm": ((L, H), jnp.float32),
                "post_norm": ((L, H), jnp.float32),
            },
            "final_norm": ((H,), jnp.float32),
            "lm_head": {"weight": ((H, V), jnp.bfloat16)},
        }
        for name, spec in self.specs.items():
            # GLOBAL shapes — NamedSharding performs the per-device split
            shapes["layers"][name] = spec.param_shapes(L, tp_size=1)
        if self.qkv_bias:
            qn = (self.qh + 2 * self.kvh) * self.head_dim
            shapes["layers"]["qkv"]["bias"] = ((L, qn * self.tp_size), jnp.bfloat16)
        if self.qk_norm:
            shapes["layers"]["q_norm"] = ((L, self.head_dim), jnp.float32)
            shapes["layers"]["k_norm"] = ((L, self.head_dim), jnp.float32)
        if self.qk_norm_full:
            D = self.head_dim
            shapes["layers"]["q_norm"] = (
                (L, self.qh * D * self.tp_size), jnp.float32
            )
            shapes["layers"]["k_norm"] = (
                (L, self.kvh * D * self.tp_size), jnp.float32
            )
        return shapes

    def random_params(self, seed: int = 0) -> Dict[str, Any]:
        """Dummy weights for benchmarking / compile checks (reference
        dummy-random loader role, model_loader/loader.py:1178).

        Built ON DEVICE inside one jit: packed quantized tensors get random
        bytes (layout-realistic), floats are zeros, norms are ones — values
        never affect compile or throughput, and host->device transfer of GBs
        is avoided entirely (pathologically slow on some device paths)."""
        is_shape = (
            lambda x: isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], tuple)
        )
        shapes = self.param_shapes()
        leaves, treedef = jax.tree.flatten(shapes, is_leaf=is_shape)

        @jax.jit
        def mk(key):
            out = []
            for shape, dtype in leaves:
                if dtype == jnp.uint8:
                    key, sub = jax.random.split(key)
                    out.append(jax.random.bits(sub, shape, jnp.uint8))
                else:
                    out.append(jnp.zeros(shape, dtype))
            return out

        params = jax.tree.unflatten(treedef, mk(jax.random.PRNGKey(seed)))
        params["layers"]["input_norm"] = jnp.ones_like(params["layers"]["input_norm"])
        params["layers"]["post_norm"] = jnp.ones_like(params["layers"]["post_norm"])
        params["final_norm"] = jnp.ones_like(params["final_norm"])
        return params

    def rope(self) -> jax.Array:
        c = self.config
        rs = c.rope_scaling
        if rs and rs.get("rope_type", rs.get("type")) == "longrope" \
                and "original_max_position_embeddings" not in rs:
            # Phi-3 keeps the trained window top-level in the HF config
            rs = dict(rs, original_max_position_embeddings=c.hf_config.get(
                "original_max_position_embeddings",
                c.max_position_embeddings,
            ))
        rot_dim = int(
            c.head_dim * float(c.hf_config.get("partial_rotary_factor", 1.0))
        )
        return rope_table(
            c.context_length, rot_dim, c.rope_theta, rs,
            trained_max=c.max_position_embeddings,
        )

    # ------------------------------------------------------------------
    # forward building blocks (shard-local shapes)
    # ------------------------------------------------------------------

    def _maybe_psum(self, x):
        if self.tp_axis is not None:
            return jax.lax.psum(x, self.tp_axis)
        return x

    @property
    def layers_local(self) -> int:
        return self.config.num_layers // self.pp_size

    def _pp_mb(self, B: int) -> int:
        """Decode microbatch count: the largest configured M dividing B."""
        if self.pp_size == 1:
            return 1
        M = self.pp_microbatches or 2 * self.pp_size
        while M > 1 and B % M:
            M //= 2
        return max(M, 1)

    def _run_layers(self, params, x, kv, per_tick):
        """Run all layers: direct local scan (pp=1) or PIPELINE rotation.

        Pipeline (reference PP role, TPU-SPMD form): the layer stack is
        stage-sharded; every stage runs its local layers on whatever batch
        copy it holds, then the activations ppermute to the next stage.
        The copy that starts on stage 0 traverses stages in order — only
        its KV writes are real, so per_tick gates writes on
        `t == stage_index` (garbage copies write PAD_SLOT).  After S hops
        the valid copy is back on stage 0; a masked psum re-replicates it.
        Wall clock equals the un-pipelined layer walk (bubbles burn idle
        compute, not time); per-device weights/KV shrink by S — the point
        of inference PP.  Microbatch overlap is the next upgrade."""
        if self.pp_size == 1:
            return per_tick(x, kv, None)
        S = self.pp_size
        perm = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            x, kv = carry
            live = jnp.equal(t, jax.lax.axis_index(self.stage_axis))
            x, kv = per_tick(x, kv, live)
            x = jax.lax.ppermute(x, self.stage_axis, perm)
            return (x, kv), None

        (x, kv), _ = jax.lax.scan(tick, (x, kv), jnp.arange(S))
        keep = jnp.equal(jax.lax.axis_index(self.stage_axis), 0)
        x = jax.lax.psum(
            jnp.where(keep, x.astype(jnp.float32), 0.0), self.stage_axis
        ).astype(x.dtype)
        return x, kv

    def _run_layers_mb(self, params, xs, kv, per_tick, metas):
        """Microbatched pipeline rotation (GPipe schedule, SPMD form).

        Reference role: `srt/managers/scheduler_pp_mixin.py` microbatch
        event loop + PPProxyTensors — collapsed into ONE jitted rotation:

        xs    [M, Bm, H]  microbatch activations
        metas pytree of [M, ...] per-microbatch step metadata
        per_tick(x, kv, live, meta) runs this stage's local layers.

        Tick t: stage s processes microbatch m = t - s (warm stages all do
        REAL work — the un-microbatched rotation ran one live stage per
        tick).  Stage 0 ingests microbatch t; stage S-1 banks its finished
        microbatch.  M + S - 1 ticks total; per-device compute drops from
        S*(L/S)*B to (M+S-1)*(L/S)*(B/M) — the pipeline actually pipelines.
        """
        S = self.pp_size
        M = xs.shape[0]
        perm = [(i, (i + 1) % S) for i in range(S)]
        s_idx = jax.lax.axis_index(self.stage_axis)

        def tick(carry, t):
            x_cur, kv, out = carry
            m = t - s_idx
            live = (m >= 0) & (m < M)
            mc = jnp.clip(m, 0, M - 1)
            meta = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, mc, 0, keepdims=False), metas)
            # stage 0 ingests microbatch t at the start of its tick
            x_in = jnp.where(
                s_idx == 0,
                jax.lax.dynamic_index_in_dim(
                    xs, jnp.clip(t, 0, M - 1), 0, keepdims=False),
                x_cur,
            )
            x_out, kv = per_tick(x_in, kv, live, meta)
            # last stage banks its finished microbatch
            bank = jnp.where(
                (s_idx == S - 1) & live,
                x_out,
                jax.lax.dynamic_index_in_dim(out, mc, 0, keepdims=False),
            )
            out = jax.lax.dynamic_update_index_in_dim(out, bank, mc, 0)
            x_next = jax.lax.ppermute(x_out, self.stage_axis, perm)
            return (x_next, kv, out), None

        out0 = jnp.zeros_like(xs)
        (x_cur, kv, out), _ = jax.lax.scan(
            tick, (xs[0], kv, out0), jnp.arange(M + S - 1)
        )
        # the banked outputs are valid only on stage S-1: re-replicate
        keep = jnp.equal(s_idx, S - 1)
        out = jax.lax.psum(
            jnp.where(keep, out.astype(jnp.float32), 0.0), self.stage_axis
        ).astype(xs.dtype)
        return out, kv

    def _post_rope_qk(self, q, k, positions, l):
        """Hook after rotary: llama4 overrides (qk l2norm + position-
        temperature scaling); default is identity."""
        return q, k

    def _rope_for_layer(self, rope_tab, l):
        """Hook: per-layer rope-table selection (SmolLM3 NoPE, Gemma3
        dual tables use it); default = one table for every layer."""
        return rope_tab

    def _win(self, l):
        """Per-layer sliding window as a traced scalar (0 = full)."""
        if not self.layer_windows:
            return 0
        return jnp.asarray(np.asarray(self.layer_windows, np.int32))[l]

    def _norm(self, x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
        """Pre/post-attention norm; DBRX overrides with LayerNorm."""
        return rms_norm(x, w, eps)

    def _rms_full(self, x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
        """RMSNorm over a flat head-sharded vector (OLMoE q/k norms): the
        mean square crosses TP shards, so psum the local sum of squares;
        the stored weight is global — slice this shard's strip."""
        xf = x.astype(jnp.float32)
        ss = jnp.sum(xf * xf, axis=-1, keepdims=True)
        denom = x.shape[-1]
        if self.tp_axis is not None:
            ss = jax.lax.psum(ss, self.tp_axis)
            denom = denom * self.tp_size
            w = jax.lax.dynamic_slice_in_dim(
                w, jax.lax.axis_index(self.tp_axis) * x.shape[-1], x.shape[-1]
            )
        xf = xf * jax.lax.rsqrt(ss / denom + eps)
        return (xf * w).astype(x.dtype)

    def _alibi(self):
        if self.alibi_slopes is None:
            return None
        import jax.numpy as _jnp
        return _jnp.asarray(self.alibi_slopes, _jnp.float32)

    def _sinks(self, params, l):
        """Per-head learned sink logits [QH_local] (GPT-OSS), or None."""
        if not self.attn_sinks:
            return None
        sk = params["layers"]["sinks"][l]  # [QH global]
        if self.tp_axis is not None:
            sk = jax.lax.dynamic_slice_in_dim(
                sk, jax.lax.axis_index(self.tp_axis) * self.qh, self.qh
            )
        return sk

    def _kv_scale_io(self, params, l):
        """(quantize_kv, scale_q, scale_out) closures for per-layer KV
        scales (int8/fp8 pools; reference kv_cache.py k_scale/v_scale).
        Scale algebra stays OUTSIDE the kernels: q*ks before the dots,
        out*vs after, round(k/ks) on the write path."""
        sc = params["layers"].get("kv_scales")
        if sc is None:
            return None
        ks = sc[0, l]
        vs = sc[1, l]

        def quant(k, v):
            kq = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127, 127)
            vq = jnp.clip(jnp.round(v.astype(jnp.float32) / vs), -127, 127)
            return kq.astype(k.dtype), vq.astype(v.dtype)

        return quant, ks, vs

    def _embed(self, params, tokens):
        x = params["embed"]["weight"][tokens]
        if self.embed_multiplier != 1.0:
            x = (x.astype(jnp.float32) * self.embed_multiplier).astype(x.dtype)
        return x

    def _pos_embed(self, params, x, positions):
        """Hook: learned ABSOLUTE position embeddings added to the token
        embeddings (GPT-2 wpe / OPT offset table).  Rope models: identity."""
        return x

    # ---- EAGLE3 aux-hidden capture (reference llama.py:314
    # layers_to_capture / set_eagle3_layers_to_capture) ----------------
    # When set (by the runner for EAGLE3 drafts), capture_hidden paths
    # return the concat of the INPUTS of these layers ([T, 3H]) instead
    # of the pre-final-norm hidden.
    def default_aux_layers(self):
        L = self.config.num_layers
        return (min(2, L - 1), L // 2, max(L - 3, 0))

    def _aux_init(self, T):
        cap = getattr(self, "aux_capture_layers", ())
        if not cap:
            return None
        return jnp.zeros(
            (len(cap), T, self.config.hidden_size), jnp.bfloat16)

    def _aux_update(self, aux, l, x):
        if aux is None:
            return None
        for j, cl in enumerate(self.aux_capture_layers):
            aux = aux.at[j].set(
                jnp.where(jnp.asarray(l) == cl, x.astype(jnp.bfloat16),
                          aux[j]))
        return aux

    def _aux_payload(self, aux, x):
        """The capture_hidden payload: aux concat when enabled, else the
        pre-final-norm hidden."""
        if aux is None:
            return x
        return jnp.moveaxis(aux, 0, 1).reshape(aux.shape[1], -1)

    def _lora_delta(self, pool, name: str, x: jax.Array, l, lora_idx):
        """Dense-over-slots LoRA: contract x against every adapter slot and
        select with the per-token one-hot (idx -1 -> zeros -> exact base
        output).  Two MXU einsums, no gather — reference role: the batched
        LoRA sgemm (`lora/triton_ops/sgemm_lora_a.py`)."""
        p = pool[name]
        A = jax.lax.dynamic_index_in_dim(p["A"], l, 1, keepdims=False)
        B = jax.lax.dynamic_index_in_dim(p["B"], l, 1, keepdims=False)
        oh = jax.nn.one_hot(lora_idx, A.shape[0], dtype=jnp.bfloat16)  # [T, S]
        z = jnp.einsum("tk,skr,ts->tr", x.astype(jnp.bfloat16), A, oh)
        return jnp.einsum("tr,srn,ts->tn", z, B, oh)

    def _layer(
        self,
        params: Dict[str, Any],
        x: jax.Array,  # [T, H] bf16
        l: jax.Array,
        positions: jax.Array,  # [T]
        rope_tab: jax.Array,
        attn_fn,  # (q [T, QH, D], k [T,KVH,D], v, l) -> [T, QH, D] f32
        lora_idx: Optional[jax.Array] = None,  # [T] adapter slot (-1 = none)
    ) -> jax.Array:
        c = self.config
        lp = params["layers"]
        lora = params.get("lora") if lora_idx is not None else None
        T = x.shape[0]
        D = self.head_dim

        h = self._norm(x, lp["input_norm"][l], c.rms_norm_eps)
        qkv = linear_apply(self.specs["qkv"], lp["qkv"], h, l)
        if lora is not None:
            qkv = qkv + self._lora_delta(lora, "qkv", h, l, lora_idx)
        if "bias" in lp["qkv"]:
            qkv = qkv + lp["qkv"]["bias"][l]
        if self.qkv_clip:
            qkv = jnp.clip(qkv, -self.qkv_clip, self.qkv_clip)
        q, k, v = jnp.split(
            qkv, [self.qh * D, (self.qh + self.kvh) * D], axis=-1
        )
        if self.qk_norm_full:
            # OLMoE: RMSNorm over the whole flat q / k projections.  Under
            # TP the mean square spans every shard's heads: psum the local
            # sum of squares and slice this shard's weight strip.
            q = self._rms_full(q, lp["q_norm"][l], c.rms_norm_eps)
            k = self._rms_full(k, lp["k_norm"][l], c.rms_norm_eps)
        q = q.reshape(T, self.qh, D)
        k = k.reshape(T, self.kvh, D)
        v = v.reshape(T, self.kvh, D)
        if self.qk_norm and not self.qk_norm_post_rope:
            q = rms_norm(q, lp["q_norm"][l], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"][l], c.rms_norm_eps)
        if self.rope_interleaved:
            perm = jnp.asarray(self._rope_perm)
            q, k = q[..., perm], k[..., perm]
        q, k = apply_rope(
            q, k, positions, self._rope_for_layer(rope_tab, l),
            mrope_section=getattr(self, "mrope_section", None),
        )
        if self.qk_norm and self.qk_norm_post_rope:
            q = rms_norm(q, lp["q_norm"][l], c.rms_norm_eps)
            k = rms_norm(k, lp["k_norm"][l], c.rms_norm_eps)
        q, k = self._post_rope_qk(q, k, positions, l)

        attn = attn_fn(q, k, v, l)  # [T, QH, D] f32
        attn = attn.reshape(T, self.qh * D).astype(jnp.bfloat16)
        o = linear_apply(self.specs["o"], lp["o"], attn, l)
        if lora is not None:
            o = o + self._lora_delta(lora, "o", attn, l, lora_idx)
        rm = self.residual_multiplier
        oc = self._maybe_psum(o.astype(jnp.float32))
        if "bias" in lp["o"]:  # row-parallel: bias once, after the psum
            oc = oc + lp["o"]["bias"][l].astype(jnp.float32)
        x = x + (oc * rm if rm != 1.0 else oc).astype(x.dtype)

        h2 = self._norm(x, lp["post_norm"][l], c.rms_norm_eps)
        d = self._mlp(lp, h2, l, lora=lora, lora_idx=lora_idx)
        dc = self._maybe_psum(d.astype(jnp.float32))
        x = x + (dc * rm if rm != 1.0 else dc).astype(x.dtype)
        return x

    def _mlp(self, lp: Dict[str, Any], h2: jax.Array, l, lora=None,
             lora_idx=None) -> jax.Array:
        """Dense SwiGLU MLP; MoE models override (models/mixtral.py)."""
        if lora is None and self.mlp_act in ("silu", "gelu"):
            # fused megakernel when eligible (gate_up + act + down in one
            # dispatch; falls back to the two-dispatch path internally)
            return mlp_apply(
                self.specs["gate_up"], lp["gate_up"],
                self.specs["down"], lp["down"],
                h2, l, act=self.mlp_act,
            )
        gu = linear_apply(self.specs["gate_up"], lp["gate_up"], h2, l)
        if lora is not None:
            gu = gu + self._lora_delta(lora, "gate_up", h2, l, lora_idx)
        act_fn = silu_and_mul if self.mlp_act == "silu" else gelu_and_mul
        act = act_fn(gu)
        d = linear_apply(self.specs["down"], lp["down"], act, l)
        if lora is not None:
            d = d + self._lora_delta(lora, "down", act, l, lora_idx)
        return d

    def _final_norm(self, params, h: jax.Array) -> jax.Array:
        return self._norm(h, params["final_norm"], self.config.rms_norm_eps)

    def _logits(self, params, h: jax.Array) -> jax.Array:
        h = self._final_norm(params, h)
        head = params["lm_head"]
        if "weight_q" in head:
            # int8 per-column lm_head (--lm-head-dtype int8): the [H, V]
            # stream is the single biggest decode tensor after the AWQ
            # weights (~1 GB bf16/step at V=128k); int8 halves it.  The
            # convert fuses into the dot's operand read; the column scale
            # rides the f32 epilogue.
            logits = jnp.dot(
                h, head["weight_q"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * head["scale"][None, :]
        else:
            logits = jnp.dot(
                h, head["weight"], preferred_element_type=jnp.float32
            )
        # vocab-parallel lm_head: gather shards along vocab dim
        if self.tp_axis is not None:
            logits = jax.lax.all_gather(
                logits, self.tp_axis, axis=-1, tiled=True
            )
        return logits

    # ------------------------------------------------------------------
    # step functions (called inside jit by the ModelRunner)
    # ------------------------------------------------------------------

    def _supports_decode_stack(self, params) -> bool:
        """Eligibility for the whole-stack decode megakernel
        (ops/decode_stack.py).  Every feature the kernel does not model
        falls back to the per-op path; subclass overrides of the layer
        math disqualify via method-identity checks."""
        import os

        # default OFF until the megakernel beats the per-op path in-context
        # (round-4 ablations: staging relayouts + in-walk attention still
        # cost ~6 ms over the per-op path; see docs/kernels.md round 4)
        mode = os.environ.get("SGLT_DECODE_MEGA", "0")
        if mode != "1":
            return False
        base = LlamaForCausalLM
        if not (
            type(self)._layer is base._layer
            and type(self)._mlp is base._mlp
            and type(self)._norm is base._norm
            and type(self)._post_rope_qk is base._post_rope_qk
            and type(self)._rope_for_layer is base._rope_for_layer
        ):
            return False
        if (
            self.tp_axis is not None
            or self.pp_size > 1
            or self.layer_windows
            or self.attn_softcap
            or self.alibi_slopes is not None
            or self.attn_sinks
            or self.qk_norm
            or self.qk_norm_full
            or self.rope_interleaved
            or self.qkv_clip
            or self.residual_multiplier != 1.0
            or self.mlp_act not in ("silu", "gelu")
            or self.qh % self.kvh
        ):
            return False
        lp = params["layers"]
        for name in ("qkv", "o", "gate_up", "down"):
            spec = self.specs[name]
            if not spec.quantized or spec.unpack != "pair":
                return False
            if "bias" in lp[name] or "qweight" not in lp[name]:
                return False
        # split bf16 pool and full-width rotary are checked at call time
        return True

    def _decode_stack(self, params, kv_cache, rope_tab, x, positions, slots,
                      page_table, lengths):
        from sglang_awq_tpu.ops.decode_stack import decode_stack_step

        lp = params["layers"]
        return decode_stack_step(
            x, kv_cache, rope_tab, positions, slots, page_table, lengths,
            lp["input_norm"], lp["post_norm"],
            lp["qkv"]["qweight"], lp["qkv"]["scales"], lp["qkv"]["zbias"],
            lp["o"]["qweight"], lp["o"]["scales"], lp["o"]["zbias"],
            lp["gate_up"]["qweight"], lp["gate_up"]["scales"],
            lp["gate_up"]["zbias"],
            lp["down"]["qweight"], lp["down"]["scales"], lp["down"]["zbias"],
            pb_qkv=self.specs["qkv"].pack_block,
            pb_o=self.specs["o"].pack_block,
            pb_gu=self.specs["gate_up"].pack_block,
            pb_d=self.specs["down"].pack_block,
            group_size=self.specs["qkv"].group_size,
            sm_scale=self.sm_scale,
            eps=self.config.rms_norm_eps,
            act=self.mlp_act,
            qh=self.qh,
            kvh=self.kvh,
            head_dim=self.head_dim,
        )


    # ------------------------------------------------------------------
    # hybrid global/SWA page rings (round 4)
    #
    # Models mixing full-attention and sliding-window layers (Gemma2/3,
    # GPT-OSS) previously stored every layer's KV in ONE page space, so a
    # single global layer pinned full-length prefixes and SWA layers
    # could never free window-expired KV (README round-3 known gap;
    # reference: srt/mem_cache/swa_radix_cache.py two-tier pools).  TPU
    # design: the pools split by layer GROUP —
    #   kv = {"pool": [L_full, P, ...] paged KV (radix-managed),
    #         "swa":  [L_swa, rows * nring, ...] per-request page RINGS}
    # where each request's SWA ring is nring = ceil(W/ps) + 2 fixed pages
    # addressed by a device-computed CYCLIC page table
    # (pt[i] = row*nring + i % nring): the attention kernels' window skip
    # (s0) never reads walk indices below the window, and each ring page
    # appears exactly once inside the live window span, so page aliasing
    # below the window is masked by construction.  Writes overwrite the
    # expired span in place (nring's +2 margin keeps the overwritten page
    # strictly below every query's window).  SWA KV bytes become
    # O(window) per request instead of O(context).
    #
    # v1 scope: tp=1/pp=1, bf16 KV, no LoRA/spec; prefix caching is
    # disabled for these models (a radix hit would need the ring content
    # for the matched prefix's last W tokens — the documented next step
    # is recompute-last-W on hit).  Rows ride the sampling-state row
    # lifecycle exactly like the linear-attention state pools.
    # ------------------------------------------------------------------

    @property
    def swa_ring_eligible(self) -> bool:
        w = self.layer_windows or ()
        ws = set(x for x in w if x)
        return bool(
            w
            and any(not x for x in w)  # mixed global/local
            and len(ws) == 1
            and next(iter(ws)) > 0  # uniform positive window (not chunked)
            # tp>1 (round 5): ring pages shard over the head/lane axis
            # exactly like the main pool (kv_pspec applies per leaf)
            and self.pp_size == 1
        )

    def enable_swa_rings(self, page_size: int, chunk_tokens: int):
        """Runner handshake: split the KV pools by layer group.  Called
        before pool allocation when the serving config allows it.

        The ring must hold the window PLUS one full prefill chunk: a
        single extend dispatch writes all its page groups before the
        attention walk, so positions overwritten by the dispatch's tail
        must already be below every in-dispatch query's window."""
        assert self.swa_ring_eligible
        self.swa_window = int(next(x for x in self.layer_windows if x))
        self._swa_full = [i for i, x in enumerate(self.layer_windows)
                          if not x]
        self._swa_win = [i for i, x in enumerate(self.layer_windows) if x]
        self._swa_fi = {l: i for i, l in enumerate(self._swa_full)}
        self._swa_wi = {l: i for i, l in enumerate(self._swa_win)}
        self._swa_ps = int(page_size)
        self._swa_chunk_tokens = int(chunk_tokens)
        self._swa_nring = (
            -(-self.swa_window // page_size)
            + -(-int(chunk_tokens) // page_size) + 1
        )
        self._swa_rings = True
        # scheduler: prefix reuse rides the hybrid state-checkpoint radix
        # (round 5, VERDICT #3): global layers' pages live in the tree,
        # and the RING content is checkpointed by copying ring pages after
        # a prompt-completing dispatch — valid because the ring holds
        # window + one full chunk, so everything >= the boundary - W is
        # still resident, and reads above the restored length are masked.
        # (Reference keeps full radix reuse for hybrids via the two-tier
        # swa_radix_cache; the ring form trades tree-resident SWA KV for
        # O(window) checkpoints.)
        self.has_linear_state = True
        self.has_state_ckpts = True
        self.ring_ckpt_by_copy = True  # scheduler: checkpoint = row copy
        # only full-attention layers own radix-managed KV pages
        self.config.num_kv_layers = len(self._swa_full)
        # INSTANCE attributes: hasattr(model, "wrap_kv_state") is the
        # runner's hybrid-pool switch, so these must not exist on the
        # class (every llama subclass would take the hybrid path)
        self.wrap_kv_state = self._swa_wrap_kv_state
        self.linear_state_bytes = self._swa_linear_state_bytes

    def _swa_linear_state_bytes(self, rows: int) -> int:
        itemsize = 2  # bf16 rings
        return (
            len(self._swa_win) * rows * self._swa_nring * self._swa_ps
            * 2 * self.kvh * self.head_dim * itemsize
        )

    def _swa_wrap_kv_state(self, pool, rows: int):
        from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec

        assert getattr(self, "_swa_rings", False)
        assert pool.dtype == jnp.bfloat16, "SWA rings: bf16 KV only (v1)"
        self._swa_rows = rows
        spec = KVPoolSpec(
            len(self._swa_win), self.kvh * self.tp_size,
            rows * self._swa_nring, self._swa_ps, self.head_dim,
        )  # GLOBAL lanes; NamedSharding splits the head axis per shard
        return {"pool": pool, "swa": spec.alloc()}

    def _ring_pt(self, rows_b: jax.Array, pmax: int) -> jax.Array:
        i = jnp.arange(pmax, dtype=jnp.int32)[None, :]
        return rows_b[:, None] * self._swa_nring + (i % self._swa_nring)

    def _ring_slot(self, rows_b: jax.Array, pos: jax.Array) -> jax.Array:
        ps = self._swa_ps
        page = rows_b * self._swa_nring + (pos // ps) % self._swa_nring
        return page * ps + pos % ps

    def _decode_step_rings(self, params, kv, rope_tab, tokens, positions,
                           slots, page_table, lengths, state_rows):
        assert state_rows is not None, "SWA rings need state rows"
        x = self._pos_embed(params, self._embed(params, tokens), positions)
        use_xla = not is_tpu_backend()
        rows = jnp.asarray(state_rows, jnp.int32)
        pos = jnp.maximum(lengths - 1, 0)
        live = lengths > 0
        pt_swa = self._ring_pt(rows, page_table.shape[1])
        slots_swa = jnp.where(live, self._ring_slot(rows, pos), PAD_SLOT)
        kvd = dict(kv)
        # UNROLLED layer walk (python branch per layer): conditional
        # in-place updates of two pools under lax.cond would copy them
        for l in range(self.config.num_layers):
            win = self.layer_windows[l]
            if win:
                key, li, pt_l, sl_l = (
                    "swa", self._swa_wi[l], pt_swa, slots_swa)
            else:
                key, li, pt_l, sl_l = ("pool", self._swa_fi[l], page_table,
                                       slots)

            def attn(q, k, v, _l, key=key, li=li, pt_l=pt_l, sl_l=sl_l,
                     win=win, gl=l):
                kvd[key] = write_kv(kvd[key], k, v, sl_l, li, mode="decode")
                fn = ragged_decode_xla if use_xla else ragged_decode
                return fn(
                    q[:, None], kvd[key], pt_l, lengths, li,
                    sm_scale=self.sm_scale, window=int(win or 0),
                    softcap=self.attn_softcap,
                    sinks=self._sinks(params, gl),
                )[:, 0]

            x = self._layer(params, x, jnp.asarray(l, jnp.int32), positions,
                            rope_tab, attn)
        return self._logits(params, x), kvd

    def _extend_step_rings(self, params, kv, rope_tab, tokens, positions,
                           slots, page_table, kv_lens, q_lens, qb_base,
                           block_q, return_hidden, state_rows, spans=None,
                           input_embeds=None):
        assert state_rows is not None, "SWA rings need state rows"
        TQ = tokens.shape[0]
        if input_embeds is not None:
            x = input_embeds.astype(jnp.bfloat16)
        else:
            x = self._pos_embed(params, self._embed(params, tokens),
                                positions)
        use_xla = not is_tpu_backend()
        rows = jnp.asarray(state_rows, jnp.int32)
        B = page_table.shape[0]
        tix = jnp.arange(TQ)
        seg = jnp.sum(
            tix[:, None] >= (qb_base * block_q)[None, :], axis=1) - 1
        segc = jnp.clip(seg, 0, B - 1)
        # liveness from the segment arithmetic, NOT slots >= 0: in-group
        # pad tokens keep real full-pool slots for the page-aligned write
        # contract but carry position 0 — mapping them through _ring_slot
        # would clobber the ring page that holds the request's position 0
        p_local = tix - qb_base[segc] * block_q
        live_tok = (seg >= 0) & (p_local < q_lens[segc])
        slots_swa = jnp.where(
            live_tok, self._ring_slot(rows[segc], positions), PAD_SLOT)
        pt_swa = self._ring_pt(rows, page_table.shape[1])
        kvd = dict(kv)
        for l in range(self.config.num_layers):
            win = self.layer_windows[l]
            if win:
                key, li, pt_l, sl_l = (
                    "swa", self._swa_wi[l], pt_swa, slots_swa)
            else:
                key, li, pt_l, sl_l = ("pool", self._swa_fi[l], page_table,
                                       slots)

            def attn(q, k, v, _l, key=key, li=li, pt_l=pt_l, sl_l=sl_l,
                     win=win, gl=l):
                kvd[key] = write_kv(kvd[key], k, v, sl_l, li, mode="prefill")
                if spans is not None:
                    # Gemma3-mm image spans attend bidirectionally on
                    # BOTH global and sliding layers (reference
                    # prepare_attn_masks ORs the span mask into each)
                    return ragged_extend_xla(
                        q, kvd[key], pt_l, kv_lens, q_lens, qb_base, li,
                        sm_scale=self.sm_scale, block_q=block_q,
                        window=int(win or 0), softcap=self.attn_softcap,
                        sinks=self._sinks(params, gl), spans=spans,
                    )
                fn = ragged_extend_xla if use_xla else ragged_extend
                return fn(
                    q, kvd[key], pt_l, kv_lens, q_lens, qb_base, li,
                    sm_scale=self.sm_scale, block_q=block_q,
                    window=int(win or 0), softcap=self.attn_softcap,
                    sinks=self._sinks(params, gl),
                )

            x = self._layer(params, x, jnp.asarray(l, jnp.int32), positions,
                            rope_tab, attn)
        last = jnp.clip(
            qb_base * block_q + jnp.maximum(q_lens, 1) - 1, 0, TQ - 1)
        h_last = x[last]
        if return_hidden:
            return self._final_norm(params, h_last).astype(jnp.float32), kvd
        return self._logits(params, h_last), kvd

    def decode_step(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,  # [L, P, ps, 2*KVH, D]
        rope_tab: jax.Array,
        tokens: jax.Array,  # [B] int32
        positions: jax.Array,  # [B] int32 (= lengths - 1; 0 for pads)
        slots: jax.Array,  # [B] int32 flat KV slot for the new token (pad = PAD_SLOT)
        page_table: jax.Array,  # [B, PMAX] int32
        lengths: jax.Array,  # [B] int32 incl. the new token (0 for pads)
        lora_idx: Optional[jax.Array] = None,  # [B] adapter slots
        state_rows: Optional[jax.Array] = None,  # [B] linear-state rows
    ) -> Tuple[jax.Array, jax.Array]:
        """One decode step for a padded batch -> (logits [B, V], kv)."""
        if getattr(self, "_swa_rings", False):
            return self._decode_step_rings(
                params, kv_cache, rope_tab, tokens, positions, slots,
                page_table, lengths, state_rows)
        del state_rows  # hybrid linear-attention models consume these
        B = tokens.shape[0]
        x = self._pos_embed(params, self._embed(params, tokens), positions)
        use_xla_attn = not is_tpu_backend()

        if (
            lora_idx is None
            and kv_cache.ndim == 6
            and kv_cache.dtype == jnp.bfloat16
            and rope_tab.shape[-1] == self.head_dim
            and B % 8 == 0
            and self._supports_decode_stack(params)
        ):
            hidden, kv_cache = self._decode_stack(
                params, kv_cache, rope_tab, x, positions, slots,
                page_table, lengths,
            )
            return self._logits(params, hidden), kv_cache

        def run_tick(x, kv, slots_t, positions_t, page_table_t, lengths_t,
                     lora_t):
            def body(carry, l):
                x, kv = carry

                def attn(q, k, v, l):
                    io = self._kv_scale_io(params, l)
                    if io is not None:
                        quant, ks, vs = io
                        k, v = quant(k, v)
                        q = (q.astype(jnp.float32) * ks).astype(q.dtype)
                    import os as _os

                    if (
                        io is None
                        and not use_xla_attn
                        and state["kv"].ndim == 6
                        and state["kv"].dtype == jnp.bfloat16
                        and _os.environ.get("SGLT_DECODE_FUSE_NEW") == "1"
                    ):
                        # fused write+attend (opt-in): measured a LOSS at
                        # bench geometry — write_kv is ~1.5 us/layer while
                        # the fused kernel's per-row scalar work costs ~15
                        # (docs/kernels.md round 4); kept for geometries
                        # where dispatch count dominates (tiny batches)
                        out, state["kv"] = ragged_decode(
                            q[:, None], state["kv"], page_table_t, lengths_t,
                            l, sm_scale=self.sm_scale, window=self._win(l),
                            softcap=self.attn_softcap,
                            sinks=self._sinks(params, l),
                            new_kv=(k, v, slots_t),
                        )
                        return out[:, 0]
                    state["kv"] = write_kv(
                        state["kv"], k, v, slots_t, l, mode="decode"
                    )
                    fn = ragged_decode_xla if use_xla_attn else ragged_decode
                    out = fn(
                        q[:, None], state["kv"], page_table_t, lengths_t, l,
                        sm_scale=self.sm_scale, window=self._win(l),
                        softcap=self.attn_softcap,
                        sinks=self._sinks(params, l),
                        alibi=self._alibi(),
                    )  # [B, 1, QH, D]
                    if io is not None:
                        out = out * vs
                    return out[:, 0]

                state = {"kv": kv}
                x = self._layer(params, x, l, positions_t, rope_tab, attn,
                                lora_idx=lora_t)
                return (x, state["kv"]), None

            import os as _os

            # scan-tail lever (docs/kernels.md round 4): unrolling the layer
            # scan lets XLA overlap iteration i+1's weight-slice gathers
            # with iteration i's tail kernels instead of re-entering the
            # loop body cold every layer
            unroll = int(_os.environ.get("SGLT_LAYER_UNROLL", "1"))
            (x, kv), _ = jax.lax.scan(
                body, (x, kv), jnp.arange(self.layers_local),
                unroll=max(1, unroll),
            )
            return x, kv

        M = self._pp_mb(B)
        if M > 1:
            Bm = B // M
            xs = x.reshape(M, Bm, -1)
            metas = dict(
                slots=slots.reshape(M, Bm),
                positions=positions.reshape(M, Bm),
                page_table=page_table.reshape(M, Bm, -1),
                lengths=lengths.reshape(M, Bm),
            )
            if lora_idx is not None:
                metas["lora"] = lora_idx.reshape(M, Bm)

            def per_tick_mb(x, kv, live, meta):
                slots_t = jnp.where(live, meta["slots"], PAD_SLOT)
                return run_tick(x, kv, slots_t, meta["positions"],
                                meta["page_table"], meta["lengths"],
                                meta.get("lora"))

            out, kv_cache = self._run_layers_mb(
                params, xs, kv_cache, per_tick_mb, metas
            )
            x = out.reshape(B, -1)
        else:
            def per_tick(x, kv, live):
                slots_t = (
                    slots if live is None
                    else jnp.where(live, slots, PAD_SLOT)
                )
                return run_tick(x, kv, slots_t, positions, page_table,
                                lengths, lora_idx)

            x, kv_cache = self._run_layers(params, x, kv_cache, per_tick)
        logits = self._logits(params, x)
        return logits, kv_cache

    def spec_verify_step(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,
        rope_tab: jax.Array,
        tokens: jax.Array,  # [B, QS] int32: [last_sampled, draft_1..draft_{QS-1}]
        positions: jax.Array,  # [B, QS]
        slots: jax.Array,  # [B, QS] contiguous per row (PAD_SLOT rows skipped)
        page_table: jax.Array,  # [B, PMAX]
        lengths: jax.Array,  # [B] TOTAL length incl. all QS tokens (0 = pad)
        capture_hidden: bool = False,  # also return pre-final-norm hidden
        lora_idx: Optional[jax.Array] = None,  # [B] adapter slots
    ) -> Tuple[jax.Array, ...]:
        """Speculative-decode verify: one step scores QS tokens per sequence
        -> (logits [B, QS, V], kv[, hidden [B, QS, H]]).  Reference role:
        TARGET_VERIFY forward mode (forward_batch_info.py:70); hidden
        capture feeds the EAGLE draft (CaptureHiddenMode.FULL role)."""
        assert self.alibi_slopes is None, "speculative + ALiBi: not supported"
        B, QS = tokens.shape
        flat_pos = positions.reshape(-1)
        x = self._pos_embed(
            params, self._embed(params, tokens.reshape(-1)), flat_pos
        )  # [B*QS, H]
        use_xla_attn = not is_tpu_backend()
        flat_slots = slots.reshape(-1)
        flat_lora = jnp.repeat(lora_idx, QS) if lora_idx is not None else None

        def per_tick(x, kv, live):
            slots_t = (
                flat_slots if live is None
                else jnp.where(live, flat_slots, PAD_SLOT)
            )

            def body(carry, l):
                x, kv, aux = carry

                def attn(q, k, v, l):
                    state["kv"] = write_kv(
                        state["kv"], k, v, slots_t, l, mode="spec"
                    )
                    qs = q.reshape(B, QS, self.qh, self.head_dim)
                    fn = ragged_decode_xla if use_xla_attn else ragged_decode
                    out = fn(
                        qs, state["kv"], page_table, lengths, l,
                        sm_scale=self.sm_scale, window=self._win(l),
                        softcap=self.attn_softcap,
                        sinks=self._sinks(params, l),
                    )
                    return out.reshape(B * QS, self.qh, self.head_dim)

                state = {"kv": kv}
                aux = self._aux_update(aux, l, x)
                x = self._layer(params, x, l, flat_pos, rope_tab, attn,
                                lora_idx=flat_lora)
                return (x, state["kv"], aux), None

            (x, kv, aux), _ = jax.lax.scan(
                body, (x, kv, self._aux_init(x.shape[0])),
                jnp.arange(self.layers_local)
            )
            st["aux"] = aux
            return x, kv

        st = {}
        x, kv_cache = self._run_layers(params, x, kv_cache, per_tick)
        logits = self._logits(params, x)  # [B*QS, V]
        if capture_hidden:
            hid = self._aux_payload(st.get("aux"), x)
            return (logits.reshape(B, QS, -1), kv_cache,
                    hid.reshape(B, QS, hid.shape[-1]))
        return logits.reshape(B, QS, -1), kv_cache

    def spec_verify_tree_step(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,
        rope_tab: jax.Array,
        tokens: jax.Array,  # [B, QS] node tokens (node 0 = committed root)
        positions: jax.Array,  # [B, QS] = fill + depth(node)
        slots: jax.Array,  # [B, QS] pool slots (PAD_SLOT rows skipped)
        page_table: jax.Array,  # [B, PMAX]
        prefix_lens: jax.Array,  # [B] tokens BEFORE the tree (0 = pad row)
        tree_mask: np.ndarray,  # [QS, QS] bool STATIC ancestor-incl-self mask
        capture_hidden: bool = False,  # also return [B, QS, H] pre-norm hidden
    ) -> Tuple[jax.Array, ...]:
        """Tree-speculative verify: scores every draft-tree node in one
        step -> (logits [B, QS, V], kv).

        Reference role: EAGLE tree-mask verify (`eagle_worker.py:670`,
        `build_tree_kernel_efficient`).  TPU split: the PREFIX attention
        (every node attends [0, prefix) identically) runs on the paged
        megakernel with a uniform limit — tree nodes FOLD into the head dim
        (q_span=1), so no kernel change — returning softmax stats; the
        TAIL attention over the QS tree nodes applies the STATIC topology
        mask in XLA (QS^2 is tiny); the two merge by their (m, l) stats.
        Tree-node KV writes into the pool at distinct tail slots; the
        accepted path is relocated post-accept (runner.kv_relocate)."""
        assert self.alibi_slopes is None, "speculative + ALiBi: not supported"
        B, QS = tokens.shape
        n, D = self.qh, self.head_dim
        kvh = self.kvh
        G = n // kvh
        flat_pos = positions.reshape(-1)
        x = self._pos_embed(
            params, self._embed(params, tokens.reshape(-1)), flat_pos
        )  # [B*QS, H]
        use_xla_attn = not is_tpu_backend()
        flat_slots = slots.reshape(-1)
        # topology may be a static np [QS, QS] (fixed-shape trees) or a
        # traced [B, QS, QS] (score-driven trees: topology is DATA)
        mask_b = jnp.asarray(tree_mask, bool)
        if mask_b.ndim == 2:
            mask_b = jnp.broadcast_to(mask_b, (B, QS, QS))

        def per_tick(x, kv, live):
            slots_t = (
                flat_slots if live is None
                else jnp.where(live, flat_slots, PAD_SLOT)
            )

            def body(carry, l):
                x, kv, aux = carry

                def attn(q, k, v, l):
                    state["kv"] = write_kv(
                        state["kv"], k, v, slots_t, l, mode="spec"
                    )
                    qs = q.reshape(B, QS, n, D)
                    # --- prefix piece: uniform limit via head-fold ---
                    qf = qs.reshape(B, QS, kvh, G, D)
                    qf = jnp.transpose(qf, (0, 2, 1, 3, 4)).reshape(
                        B, 1, QS * n, D)
                    fn = ragged_decode_xla if use_xla_attn else ragged_decode
                    o1, m1, l1 = fn(
                        qf, state["kv"], page_table, prefix_lens, l,
                        sm_scale=self.sm_scale, want_stats=True,
                    )
                    # unfold rows (h, t, g) -> [B, QS, QH]
                    o1 = o1.reshape(B, kvh, QS, G, D)
                    o1 = jnp.transpose(o1, (0, 2, 1, 3, 4)).reshape(
                        B, QS, n, D)
                    m1 = jnp.transpose(
                        m1.reshape(B, kvh, QS, G), (0, 2, 1, 3)
                    ).reshape(B, QS, n)
                    l1 = jnp.transpose(
                        l1.reshape(B, kvh, QS, G), (0, 2, 1, 3)
                    ).reshape(B, QS, n)
                    # --- tail piece: tree-masked attention over the QS
                    # new nodes (k/v in hand, pre-pool) ---
                    kt = k.reshape(B, QS, kvh, D)
                    vt = v.reshape(B, QS, kvh, D)
                    qg = qs.reshape(B, QS, kvh, G, D)
                    s2 = jnp.einsum(
                        "bikgd,bjkd->bkgij", qg.astype(jnp.float32),
                        kt.astype(jnp.float32),
                    ) * self.sm_scale  # [B, KVH, G, QS, QS]
                    s2 = jnp.where(mask_b[:, None, None], s2, -1e30)
                    m2 = jnp.max(s2, axis=-1)  # [B, KVH, G, QS]
                    p2 = jnp.exp(s2 - m2[..., None])
                    l2 = jnp.sum(p2, axis=-1)
                    a2 = jnp.einsum(
                        "bkgij,bjkd->bikgd", p2, vt.astype(jnp.float32)
                    )  # [B, QS, KVH, G, D]
                    m2 = jnp.transpose(m2, (0, 3, 1, 2)).reshape(B, QS, n)
                    l2 = jnp.transpose(l2, (0, 3, 1, 2)).reshape(B, QS, n)
                    a2 = a2.reshape(B, QS, n, D)
                    # --- two-piece softmax merge ---
                    m = jnp.maximum(m1, m2)
                    w1 = jnp.exp(m1 - m) * l1
                    w2 = jnp.exp(m2 - m)
                    denom = w1 + w2 * l2
                    denom = jnp.where(denom == 0.0, 1.0, denom)
                    out = (o1 * w1[..., None] + a2 * w2[..., None]) / (
                        denom[..., None])
                    return out.reshape(B * QS, n, D)

                state = {"kv": kv}
                aux = self._aux_update(aux, l, x)
                x = self._layer(params, x, l, flat_pos, rope_tab, attn)
                return (x, state["kv"], aux), None

            (x, kv, aux), _ = jax.lax.scan(
                body, (x, kv, self._aux_init(x.shape[0])),
                jnp.arange(self.layers_local)
            )
            st["aux"] = aux
            return x, kv

        st = {}
        x, kv_cache = self._run_layers(params, x, kv_cache, per_tick)
        logits = self._logits(params, x)  # [B*QS, V]
        if capture_hidden:
            hid = self._aux_payload(st.get("aux"), x)
            return (logits.reshape(B, QS, -1), kv_cache,
                    hid.reshape(B, QS, hid.shape[-1]))
        return logits.reshape(B, QS, -1), kv_cache

    def extend_step(
        self,
        params: Dict[str, Any],
        kv_cache: jax.Array,
        rope_tab: jax.Array,
        tokens: jax.Array,  # [TQ] int32 token-major, per-seq regions BQ-aligned
        positions: jax.Array,  # [TQ] int32 absolute positions
        slots: jax.Array,  # [TQ] int32 (PAD_SLOT for pads); page-aligned groups
        page_table: jax.Array,  # [B, PMAX] int32 (prefix + new pages per seq)
        kv_lens: jax.Array,  # [B] int32 total kv incl. this chunk (0 = pad row)
        q_lens: jax.Array,  # [B] int32 live new tokens per seq
        qb_base: jax.Array,  # [B] int32 first q block per seq (TQ offset / BQ)
        return_hidden: bool = False,  # embeddings: pooled hidden, skip lm_head
        block_q: int = 128,
        capture_hidden: bool = False,  # also return [TQ, H] pre-norm hidden
        lora_idx: Optional[jax.Array] = None,  # [TQ] adapter slots
        input_embeds: Optional[jax.Array] = None,  # [TQ, H] replaces lookup
        state_rows: Optional[jax.Array] = None,  # [B] linear-state rows
        spans: Optional[jax.Array] = None,  # [TQ] image-span ids (0 = text):
        # same-nonzero-span tokens attend BIDIRECTIONALLY (Gemma3-mm);
        # span batches ride the XLA attention path on every backend
    ) -> Tuple[jax.Array, ...]:
        """Batched (multi-request) chunked-prefill step -> (per-seq last-token
        logits [B, V] — or normed hidden [B, H] when return_hidden — plus kv;
        with capture_hidden additionally the full-sequence pre-final-norm
        hidden states [TQ, H] for the EAGLE draft).

        Reference role: `get_new_batch_prefill` extend batch
        (`scheduler.py:1783`) + `extend_attention.py` ragged qo_indptr batch.
        """
        if getattr(self, "_swa_rings", False):
            return self._extend_step_rings(
                params, kv_cache, rope_tab, tokens, positions, slots,
                page_table, kv_lens, q_lens, qb_base, block_q,
                return_hidden, state_rows, spans=spans,
                input_embeds=input_embeds)
        del state_rows  # hybrid linear-attention models consume these
        TQ = tokens.shape[0]
        B = page_table.shape[0]
        if input_embeds is not None:
            # multimodal / embedding-injection path (reference
            # GenerateReqInput.input_embeds, io_struct.py:158)
            x = input_embeds.astype(jnp.bfloat16)
        else:
            x = self._embed(params, tokens)
        x = self._pos_embed(params, x, positions)
        use_xla_attn = not is_tpu_backend()

        def run_layers_once(x, kv, slots_t, positions_t, kv_lens_t,
                            q_lens_t, qb_base_t, lora_t):
            def body(carry, l):
                x, kv, aux = carry

                def attn(q, k, v, l):
                    io = self._kv_scale_io(params, l)
                    if io is not None:
                        quant, ks, vs = io
                        k, v = quant(k, v)
                        q = (q.astype(jnp.float32) * ks).astype(q.dtype)
                    state["kv"] = write_kv(
                        state["kv"], k, v, slots_t, l, mode="prefill"
                    )
                    if spans is not None:
                        # bidirectional image spans: exact via the XLA
                        # gather path (the paged Pallas extend stays
                        # causal; image prefills are rare and small)
                        out = ragged_extend_xla(
                            q, state["kv"], page_table, kv_lens_t, q_lens_t,
                            qb_base_t, l, sm_scale=self.sm_scale,
                            block_q=block_q, window=self._win(l),
                            softcap=self.attn_softcap,
                            sinks=self._sinks(params, l), spans=spans,
                            alibi=self._alibi(),
                        )
                        if io is not None:
                            out = out * vs
                        return out
                    fn = ragged_extend_xla if use_xla_attn else ragged_extend
                    out = fn(
                        q, state["kv"], page_table, kv_lens_t, q_lens_t,
                        qb_base_t,
                        l, sm_scale=self.sm_scale, block_q=block_q,
                        window=self._win(l), softcap=self.attn_softcap,
                        sinks=self._sinks(params, l),
                        alibi=self._alibi(),
                    )
                    if io is not None:
                        out = out * vs
                    return out

                state = {"kv": kv}
                aux = self._aux_update(aux, l, x)
                x = self._layer(params, x, l, positions_t, rope_tab, attn,
                                lora_idx=lora_t)
                return (x, state["kv"], aux), None

            (x, kv, aux), _ = jax.lax.scan(
                body, (x, kv, self._aux_init(x.shape[0])),
                jnp.arange(self.layers_local)
            )
            st_aux["v"] = aux
            return x, kv

        st_aux = {}
        # extend-side PP microbatching (reference scheduler_pp_mixin.py:
        # micro-batches span prefill too): split the token-major buffer at
        # q-block boundaries into M chunks and GPipe-rotate them, so every
        # warm stage prefills real tokens each tick instead of idling
        # through one un-pipelined rotation.  Chunk m's attention reads
        # chunk m-1's KV from the pool — written one tick earlier at the
        # same stage, exactly the chunked-prefill contract.
        M = 0
        if (
            self.pp_size > 1
            and positions.ndim == 1
            and not capture_hidden
            and lora_idx is None
        ):
            nb = TQ // block_q
            M = min(self.pp_microbatches or 2 * self.pp_size, nb)
            while M > 1 and nb % M:
                M -= 1
        if M > 1:
            TQm = TQ // M
            BQ = block_q
            starts = qb_base * BQ
            ends = starts + q_lens
            lo = jnp.arange(M)[:, None] * TQm
            hi = lo + TQm
            ilo = jnp.maximum(starts[None], lo)
            ihi = jnp.minimum(ends[None], hi)
            qlm = jnp.maximum(ihi - ilo, 0)  # [M, B]
            qbm = jnp.where(qlm > 0, (ilo - lo) // BQ, 0)
            kvm = jnp.where(
                qlm > 0,
                kv_lens[None] - jnp.maximum(ends[None] - hi, 0),
                0,
            )
            metas = dict(
                slots=slots.reshape(M, TQm),
                positions=positions.reshape(M, TQm),
                kv_lens=kvm, q_lens=qlm, qb_base=qbm,
            )

            def per_tick_mb(xm, kv, live, meta):
                slots_t = jnp.where(live, meta["slots"], PAD_SLOT)
                return run_layers_once(
                    xm, kv, slots_t, meta["positions"], meta["kv_lens"],
                    meta["q_lens"], meta["qb_base"], None,
                )

            out, kv_cache = self._run_layers_mb(
                params, x.reshape(M, TQm, -1), kv_cache, per_tick_mb, metas
            )
            x = out.reshape(TQ, -1)
        else:
            def per_tick(x, kv, live):
                # prefill writes are whole-page: gate by blanking the PAGES
                slots_t = (
                    slots if live is None
                    else jnp.where(live, slots, PAD_SLOT)
                )
                return run_layers_once(
                    x, kv, slots_t, positions, kv_lens, q_lens, qb_base,
                    lora_idx,
                )

            x, kv_cache = self._run_layers(params, x, kv_cache, per_tick)
        # gather each sequence's last live row
        last = jnp.clip(qb_base * block_q + jnp.maximum(q_lens, 1) - 1, 0, TQ - 1)
        h_last = x[last]  # [B, H]
        if return_hidden:
            h_norm = self._final_norm(params, h_last)
            return h_norm.astype(jnp.float32), kv_cache
        logits = self._logits(params, h_last)
        if capture_hidden:
            return logits, kv_cache, self._aux_payload(st_aux.get("v"), x)
        return logits, kv_cache
