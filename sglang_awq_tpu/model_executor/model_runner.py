"""Model runner: owns device state and the bucketed-jit step functions.

Role model: reference `ModelRunner`
(`python/sglang/srt/model_executor/model_runner.py:271` — distributed init,
model load, KV pool sizing `profile_max_num_token:1411`/`init_memory_pool:1682`,
graph capture `init_device_graphs:2498`, forward dispatch `forward:2721`).

TPU re-design (SURVEY.md §7 decisions 2-4):
* CUDA graphs -> BUCKETED JIT: one compiled executable per
  (mode, padded size) key; decode buckets on batch size, prefill buckets on
  (total tokens, batch rows) (reference bucket table role, §A.5).
* Each step fuses model forward + sampling into ONE dispatch (host-device
  round trips are the enemy; sampled ids return as a small array).
* Prefill is a BATCHED multi-request ragged extend (round 2) — reference
  `get_new_batch_prefill` extend batches.
* `decode_multi` runs N decode steps inside one jit via `lax.scan`, feeding
  sampled tokens straight back into the next step on device — the TPU
  analogue of the reference's overlap scheduling + multi-step decode
  (`--num-continuous-decode-steps`), with KV paging advanced in-jit over a
  pre-allocated page table.
* The combined KV cache is donated through every step (functional in-place
  update; layout in mem_cache/kv_pool.py).
"""

from __future__ import annotations

import logging
import os
import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.layers.sampler import (
    SamplingInfo,
    apply_penalties,
    logprob_outputs,
    sample,
    spec_accept_sample,
)
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT
from sglang_awq_tpu.model_executor.forward_batch import (
    DecodeInput,
    ExtendBatchInput,
    SamplingBatch,
)
from sglang_awq_tpu.model_loader.loader import load_model
from sglang_awq_tpu.server_args import ServerArgs
from sglang_awq_tpu.utils import (
    cdiv,
    default_decode_bs_buckets,
    default_prefill_token_buckets,
    pick_bucket,
    round_up,
)

logger = logging.getLogger(__name__)

_COMP_CACHE_SET = False


def _enable_compilation_cache(cache_dir: str) -> None:
    """Persist compiled executables across process restarts.

    Reference comparison: CUDA-graph capture is a per-boot cost there too,
    but our full bucket-sweep warmup (~3 min at 8B geometry) times every DP
    replica on every boot — the XLA compilation cache amortizes it to one
    cold boot per (model, config).  "" disables (--jit-cache-dir '').
    """
    global _COMP_CACHE_SET
    if _COMP_CACHE_SET or not cache_dir:
        return
    # test mode keeps the suite off the user's default cache, but a test
    # that passes an EXPLICIT dir gets the real behavior (warm-start test)
    if os.environ.get("SGLT_TEST_MODE") and cache_dir.startswith("~/.cache"):
        return
    path = os.path.expanduser(cache_dir)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every executable that took real compile time; the bucket
        # sweep's value is in the many medium-sized step fns
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _COMP_CACHE_SET = True
        logger.info("XLA compilation cache at %s", path)
    except Exception as e:  # pragma: no cover - best effort
        logger.warning("compilation cache disabled: %s", e)

HBM_BYTES_DEFAULT = 16 * 1024**3  # v5e
RESERVE_BYTES = 1536 * 1024**2  # workspace + fragmentation headroom

EXTEND_BS_BUCKETS = [1, 2, 4, 8, 16, 32]


def _sampling_info(sb: SamplingBatch) -> SamplingInfo:
    return SamplingInfo(
        temperatures=jnp.asarray(sb.temperatures),
        top_ps=jnp.asarray(sb.top_ps),
        top_ks=jnp.asarray(sb.top_ks),
        min_ps=jnp.asarray(sb.min_ps),
        seeds=jnp.asarray(sb.seeds),
        frequency_penalties=jnp.asarray(sb.frequency_penalties),
        presence_penalties=jnp.asarray(sb.presence_penalties),
        repetition_penalties=jnp.asarray(sb.repetition_penalties),
        min_new_tokens=jnp.asarray(sb.min_new_tokens),
    )


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: Optional[ModelConfig] = None,
        tensors: Optional[Dict[str, np.ndarray]] = None,
        draft_config: Optional[ModelConfig] = None,  # EAGLE draft (tests)
        draft_tensors: Optional[Dict[str, np.ndarray]] = None,
    ):
        self.server_args = server_args
        _enable_compilation_cache(server_args.jit_cache_dir)
        self._draft_cfg = None
        if server_args.speculative_algorithm == "eagle":
            if draft_config is not None:
                self._draft_cfg = draft_config
            else:
                assert server_args.speculative_draft_model_path, (
                    "--speculative-algorithm eagle needs "
                    "--speculative-draft-model-path"
                )
                self._draft_cfg = ModelConfig.from_model_path(
                    server_args.speculative_draft_model_path
                )
        self._draft_tensors = draft_tensors
        if model_config is None:
            model_config = ModelConfig.from_model_path(
                server_args.model_path,
                context_length=server_args.context_length,
                quantization=server_args.quantization,
            )
        self.model_config = model_config
        self.tp_size = server_args.tp_size
        self.pp_size = server_args.pp_size
        self.mesh = None
        tp_axis = stage_axis = None
        if self.tp_size > 1 or self.pp_size > 1:
            from sglang_awq_tpu.parallel.mesh import (
                MODEL_AXIS,
                STAGE_AXIS,
                make_mesh,
            )

            self.mesh = make_mesh(
                dp_size=1, tp_size=self.tp_size, pp_size=self.pp_size
            )
            tp_axis = MODEL_AXIS if self.tp_size > 1 else None
            stage_axis = STAGE_AXIS if self.pp_size > 1 else None
        if self.pp_size > 1:
            assert server_args.speculative_algorithm is None, (
                "speculative decoding + pp lands later"
            )
            assert not server_args.lora_paths, "LoRA + pp lands later"
        self.model, self.params = load_model(
            model_config,
            tp_size=server_args.tp_size,
            tp_axis=tp_axis,
            tensors=tensors,
            random_weights=server_args.random_weights,
            pp_size=self.pp_size,
            stage_axis=stage_axis,
            pp_microbatches=server_args.pp_microbatches,
        )
        if server_args.lm_head_dtype == "int8" and \
                "weight" in self.params.get("lm_head", {}):
            # per-column symmetric int8: halves the largest non-AWQ decode
            # stream (reference lm-head stays bf16; this is the TPU DMA
            # trade — opt-in via --lm-head-dtype int8)
            w = self.params["lm_head"].pop("weight")  # [H, V] bf16
            scale = (jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
                     / 127.0 + 1e-30)
            wq = jnp.clip(
                jnp.round(w.astype(jnp.float32) / scale[None, :]),
                -127, 127).astype(jnp.int8)
            self.params["lm_head"] = {"weight_q": wq, "scale": scale}
        if self.mesh is not None:
            self._shard_state()
        self.rope_tab = jax.device_put(self.model.rope())
        self.page_size = server_args.page_size
        # extend q-block: per-seq q regions are padded to this; must be a
        # page multiple so prefill KV write groups never straddle sequences
        self.block_q = max(128, self.page_size)
        assert self.block_q % self.page_size == 0

        # hybrid global/SWA models: split the KV pools by layer group (SWA
        # layers move into per-request page rings, O(window) bytes) when
        # the serving config allows it — see llama.enable_swa_rings
        if (
            getattr(self.model, "swa_ring_eligible", False)
            and self.pp_size == 1
            and server_args.speculative_algorithm is None
            and not server_args.lora_paths
            and server_args.kv_cache_dtype in ("auto", "bfloat16")
            and not server_args.disable_swa_rings
        ):
            # a single extend dispatch can carry up to one q-block even
            # when the chunk budget is smaller (block_q is the scheduler's
            # admission granularity) — the ring must hold that span
            self.model.enable_swa_rings(
                self.page_size,
                max(server_args.chunked_prefill_size, self.block_q))

        self._init_memory_pool()

        self.decode_bs_buckets = server_args.decode_bs_buckets or default_decode_bs_buckets(
            server_args.max_running_requests
        )
        self.prefill_token_buckets = [
            round_up(t, self.block_q)
            for t in (
                server_args.prefill_token_buckets
                or default_prefill_token_buckets(server_args.chunked_prefill_size)
            )
        ]
        self._fns: Dict[Any, Any] = {}
        # static per-server EOS set (min_new_tokens suppression in-sampler)
        self._eos_ids = tuple(sorted(model_config.eos_token_ids()))
        self.decode_steps_counter = 0
        # device-resident per-request sampling state (overlap scheduling):
        # last sampled ids + penalty counts stay on device between steps
        from sglang_awq_tpu.model_executor.sampling_state import (
            DeviceSamplingState,
        )

        # capacity: running cap + prefill-batch headroom (rows are acquired
        # at admission, before the running-count cap is re-checked)
        self.sampling_state = DeviceSamplingState(
            server_args.max_running_requests + 24, model_config.vocab_size
        )
        # page-table width buckets: the attention grid iterates pmax/ppc
        # chunks per sequence — sizing to the live batch's max pages (not
        # the context limit) kills dead grid steps
        self.pmax_buckets = []
        w = 8
        while w < self.pmax:
            self.pmax_buckets.append(w)
            w *= 2
        self.pmax_buckets.append(self.pmax)

        self._init_draft()
        # per-row last target hidden: the EAGLE chain's start feature
        # (+1 spare slot so trash-row writes land harmlessly).  EAGLE1
        # rows hold the pre-final-norm hidden [H]; EAGLE3 rows hold the
        # concat of the three captured aux layer hiddens [3H].
        hid_w = model_config.hidden_size
        if self.draft is not None and getattr(self.draft, "aux_width", 0):
            hid_w = self.draft.aux_width
        self.spec_hidden_row = jnp.zeros(
            (self.sampling_state.capacity + 1, hid_w), jnp.bfloat16,
        )
        self._init_lora()

    def _init_lora(self):
        """LoRA adapter pool (reference lora/lora_manager.py:50).  The
        stacked pool arrays ride inside `params["lora"]`, so every step
        executable sees them without signature changes; per-token slot
        indices are an extra replicated input when enabled."""
        self.lora = None
        sa = self.server_args
        if not sa.lora_paths:
            return
        from sglang_awq_tpu.lora.lora_manager import LoraManager

        self.lora = LoraManager(
            self.model, sa.max_loras_per_batch, sa.max_lora_rank
        )
        for spec in sa.lora_paths:
            name, _, path = spec.partition("=")
            if not path:
                name, path = os.path.basename(spec.rstrip("/")), spec
            self.lora.load_adapter(name, path)
        self.params["lora"] = self.lora.as_params()
        self._place_lora()

    def refresh_lora(self):
        """Re-publish pool arrays after dynamic load/unload (shapes are
        fixed by max_lora_rank, so executables stay valid)."""
        if self.lora is not None:
            self.params["lora"] = self.lora.as_params()
            self._place_lora()

    def _place_lora(self):
        """Lay the LoRA pool over the mesh (init runs _shard_state before
        _init_lora, so the pool places itself)."""
        if self.lora is None or self.mesh is None:
            return
        from jax.sharding import NamedSharding

        from sglang_awq_tpu.parallel.sharding import lora_pspecs

        specs = lora_pspecs(self.model)
        self.params["lora"] = jax.tree.map(
            lambda x, sp: jax.device_put(x, NamedSharding(self.mesh, sp)),
            self.params["lora"], specs,
        )
        if getattr(self, "_param_specs", None) is not None:
            self._param_specs["lora"] = specs  # shard_map in_specs pytree

    def _init_draft(self):
        """EAGLE draft model + its (small) KV pool + the per-row hidden
        buffer (reference eagle_worker.py:79 init)."""
        self.draft = None
        if self._draft_cfg is None:
            return
        assert self.pp_size == 1, "EAGLE + pp lands later"
        from sglang_awq_tpu.speculative.eagle_draft import (
            Eagle3DraftModel,
            EagleDraftModel,
            is_eagle3_checkpoint,
            load_draft_params,
            load_draft_params_eagle3,
        )

        dc = self._draft_cfg
        tensors = self._draft_tensors
        if tensors is None and not self.server_args.random_weights:
            from sglang_awq_tpu.model_loader.loader import iterate_safetensors

            tensors = dict(iterate_safetensors(dc.model_path))
        eagle3 = (
            dc.hf_config.get("eagle3", False)
            or (tensors is not None
                and is_eagle3_checkpoint(tensors, dc.hidden_size))
        )
        if eagle3:
            self.draft = Eagle3DraftModel(
                config=dc,
                target_hidden_size=self.model_config.hidden_size,
            )
            if tensors is not None:
                self.draft_params = load_draft_params_eagle3(
                    self.draft, tensors)
            else:
                self.draft_params = self.draft.random_params()
            # the target must expose aux hiddens at the reference's
            # capture points (inputs of layers [2, L//2, L-3])
            self.model.aux_capture_layers = self.model.default_aux_layers()
        else:
            self.draft = EagleDraftModel(config=dc)
            if tensors is not None:
                self.draft_params = load_draft_params(self.draft, tensors)
            else:
                self.draft_params = self.draft.random_params()
        from sglang_awq_tpu.layers.rotary import rope_table

        self.draft_rope = jax.device_put(
            rope_table(
                self.model_config.context_length, dc.head_dim, dc.rope_theta,
                dc.rope_scaling,
            )
        )
        dspec = KVPoolSpec(
            dc.num_layers, self.draft.kvh, self.kv_spec.num_pages,
            self.page_size, dc.head_dim,
        )
        self.draft_kv = dspec.alloc()
        if self.mesh is not None:
            # tp>1 (round-5 endgame): the draft is tiny — REPLICATE its
            # params/KV/rope over the mesh and let the plain-jit draft
            # fns run under GSPMD (the sharded target lm_head input makes
            # XLA insert the vocab all-gather at the draft's logit dot;
            # the target-side verify already rides the wrapped step)
            from jax.sharding import NamedSharding, PartitionSpec as _P

            rep = NamedSharding(self.mesh, _P())
            self.draft_params = jax.tree.map(
                lambda x: jax.device_put(x, rep), self.draft_params)
            self.draft_kv = jax.device_put(self.draft_kv, rep)
            self.draft_rope = jax.device_put(self.draft_rope, rep)
        self._draft_head = self.draft.head_params(
            self.draft_params, None)  # None -> use the target's at call time
        self._verify_hidden = None
        logger.info(
            "EAGLE draft: %d layer(s), draft pool %.2f GiB%s",
            dc.num_layers, self.draft_kv.nbytes / 1024**3,
            " (EAGLE3)" if eagle3 else "",
        )

    def _draft_embed_w(self):
        """Draft input embedding: EAGLE3 checkpoints may carry their own
        table; EAGLE1 shares the target's."""
        w = self.draft_params.get("embed_w")
        return w if w is not None else self.params["embed"]["weight"]

    def _draft_head_p(self):
        return self.draft.head_params(self.draft_params, self.params["lm_head"])

    # ------------------------------------------------------------------
    # sharding (tp > 1)
    # ------------------------------------------------------------------

    def _shard_state(self):
        """Lay params out over the mesh per parallel/sharding.py specs."""
        from jax.sharding import NamedSharding

        from sglang_awq_tpu.parallel.sharding import param_pspecs

        self._param_specs = param_pspecs(self.model, self.params)
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            self.params,
            self._param_specs,
        )

    def _wrap_step(
        self,
        fn,
        n_replicated_in: int,
        n_replicated_out: int = 1,
        n_state_out: int = 0,
    ):
        """shard_map a step function: params/KV sharded, batch inputs and
        outputs replicated (every shard computes identical logits/ids).
        `n_state_out` replicated device-state outputs follow the kv output
        (sampling state arrays updated in-step)."""
        from jax.sharding import PartitionSpec as P

        from sglang_awq_tpu.parallel.sharding import kv_pspec

        if self.mesh is None:
            return fn
        kvp = kv_pspec(len(self.kv_spec.shape))
        in_specs = (
            self._param_specs,
            kvp,
            P(),  # rope
        ) + (P(),) * n_replicated_in
        out_specs = (P(),) * n_replicated_out + (kvp,) + (P(),) * n_state_out
        try:
            return jax.shard_map(
                fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        except TypeError:  # older arg name
            return jax.shard_map(
                fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False,
            )

    # ------------------------------------------------------------------
    # memory pool
    # ------------------------------------------------------------------

    def _init_memory_pool(self):
        sa, mc = self.server_args, self.model_config
        kv_heads_local = max(mc.num_kv_heads // sa.tp_size, 1)
        layers_local = getattr(mc, "num_kv_layers", mc.num_layers) \
            // max(sa.pp_size, 1)
        # per-DEVICE bytes/token governs the budget; the page dim is global
        kv_dtype = (
            "bfloat16" if sa.kv_cache_dtype in ("auto", "bfloat16") else sa.kv_cache_dtype
        )
        if kv_dtype == "int8":
            raise NotImplementedError(
                "int8 KV cache needs per-head scales (not yet built); "
                "use --kv-cache-dtype fp8_e4m3"
            )
        if kv_dtype == "fp8_e4m3":
            from sglang_awq_tpu.utils import is_tpu_backend

            xr = kv_heads_local * mc.head_dim // 2  # lanes per face row
            if is_tpu_backend() and xr % 128 != 0:
                raise ValueError(
                    f"fp8 KV faces have {xr} lanes (kv_heads/shard="
                    f"{kv_heads_local} x head_dim={mc.head_dim} / 2); Mosaic "
                    f"requires a multiple of 128 — lower --tp-size or use "
                    f"bf16 KV for this geometry"
                )
        # MLA (shared K/V latent row): store the latent ONCE — the 4-dim
        # "latent" pool layout halves KV bytes for DeepSeek-class models
        # tp>1 (round 5): the latent pool is REPLICATED over the model
        # axis (kv_a is replicated, every shard computes the same row) —
        # kv_pspec(4) marks it; pool bytes stay 1.0x minimal per device
        use_latent = (
            bool(getattr(mc, "is_mla", False))
            and kv_dtype == "bfloat16"
        )
        probe = KVPoolSpec(
            layers_local, kv_heads_local, 1, self.page_size, mc.head_dim,
            dtype=kv_dtype, shared_kv=use_latent,
        )
        extra_bpt = 0
        if self._draft_cfg is not None:  # EAGLE draft pool rides along
            dc = self._draft_cfg
            extra_bpt = KVPoolSpec(
                dc.num_layers, max(dc.num_kv_heads // sa.tp_size, 1), 1,
                self.page_size, dc.head_dim,
            ).bytes_per_token()
        if sa.max_total_tokens is not None:
            tokens = sa.max_total_tokens
        else:
            hbm = self._device_hbm_bytes()
            weight_bytes = (
                sum(x.nbytes for x in jax.tree.leaves(self.params)) // max(sa.tp_size, 1)
            )
            state_bytes = 0
            if hasattr(self.model, "linear_state_bytes"):
                state_bytes = self.model.linear_state_bytes(
                    sa.max_running_requests + 24 + 1
                    + sa.hybrid_state_ckpts
                )
            budget = int(
                (hbm - weight_bytes - state_bytes - RESERVE_BYTES)
                * sa.mem_fraction_static
            )
            if budget <= 0:
                raise RuntimeError(
                    f"no HBM left for KV cache (weights {weight_bytes>>20} MiB/device)"
                )
            tokens = budget // (probe.bytes_per_token() + extra_bpt)
        num_pages = max(tokens // self.page_size, 8)
        self.kv_spec = KVPoolSpec(
            getattr(mc, "num_kv_layers", mc.num_layers),
            1 if use_latent else (
                kv_heads_local * sa.tp_size if sa.tp_size > 1
                else kv_heads_local),
            num_pages,
            self.page_size,
            mc.head_dim,
            dtype=kv_dtype,
            shared_kv=use_latent,
        )
        self.max_total_tokens = num_pages * self.page_size
        self.pmax = cdiv(mc.context_length, self.page_size)
        self.kv_cache = self._alloc_kv()
        logger.info(
            "KV pool: %d pages x %d tokens (%.2f GiB global)",
            num_pages,
            self.page_size,
            sum(x.nbytes for x in jax.tree.leaves(self.kv_cache)) / 1024**3,
        )

    def copy_state_rows(self, src_rows, dst_rows) -> None:
        """conv/rec rows src -> dst (hybrid prefix-cache state restore /
        checkpoint interchange).  Reference role: MambaPool.copy_from
        (`srt/mem_cache/memory_pool.py` mamba state fork)."""
        if not hasattr(self.model, "wrap_kv_state"):
            return
        if "swa" in self.kv_cache and "conv" not in self.kv_cache:
            # SWA page rings: a row's state is its nring ring pages
            nring = self.model._swa_nring
            if getattr(self, "_copy_ring_fn", None) is None:
                @partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
                def _copy_ring(kv, src, dst, nring):
                    swa = kv["swa"]
                    ar = jnp.arange(nring, dtype=jnp.int32)
                    sp = (src[:, None] * nring + ar).reshape(-1)
                    dp = (dst[:, None] * nring + ar).reshape(-1)
                    swa = swa.at[:, dp].set(swa[:, sp], mode="drop")
                    return dict(kv, swa=swa)

                self._copy_ring_fn = _copy_ring
            self.kv_cache = self._copy_ring_fn(
                self.kv_cache,
                jnp.asarray(np.asarray(src_rows, np.int32)),
                jnp.asarray(np.asarray(dst_rows, np.int32)),
                nring,
            )
            return
        if "conv" not in self.kv_cache:
            return
        if getattr(self, "_copy_state_fn", None) is None:
            @partial(jax.jit, donate_argnums=(0,))
            def _copy(kv, src, dst):
                conv = kv["conv"]
                rec = kv["rec"]
                conv = conv.at[:, dst].set(conv[:, src], mode="drop")
                rec = rec.at[:, dst].set(rec[:, src], mode="drop")
                return dict(kv, conv=conv, rec=rec)

            self._copy_state_fn = _copy
        self.kv_cache = self._copy_state_fn(
            self.kv_cache,
            jnp.asarray(np.asarray(src_rows, np.int32)),
            jnp.asarray(np.asarray(dst_rows, np.int32)),
        )

    def _alloc_kv(self):
        if hasattr(self.model, "wrap_kv_state"):
            rings = getattr(self.model, "_swa_rings", False)
            assert self.mesh is None or rings, (
                "recurrent-state hybrids run tp=1/pp=1 (v1); SWA rings "
                "shard over the head axis")
            assert self.server_args.speculative_algorithm is None, (
                "speculative decoding + hybrid linear attention: later")
            # mirrors DeviceSamplingState capacity (+ trash row); the pool
            # allocates before the sampling state exists.  Checkpoint rows
            # (the mamba-radix prefix-cache states) sit past the trash row.
            rows = self.server_args.max_running_requests + 24 + 1
            self.state_ckpt_base = rows
            self.n_state_ckpts = (
                self.server_args.hybrid_state_ckpts
                if getattr(self.model, "has_state_ckpts", True) else 0
            )
            rows += self.n_state_ckpts
            state = self.model.wrap_kv_state(self.kv_spec.alloc(), rows)
            if self.mesh is not None:
                from jax.sharding import NamedSharding

                from sglang_awq_tpu.parallel.sharding import kv_pspec

                state = jax.tree.map(
                    lambda x: jax.device_put(
                        x, NamedSharding(self.mesh, kv_pspec(x.ndim))),
                    state,
                )
            return state
        if self.mesh is None:
            return self.kv_spec.alloc()
        from jax.sharding import NamedSharding

        from sglang_awq_tpu.parallel.sharding import kv_pspec

        sh = NamedSharding(self.mesh, kv_pspec(len(self.kv_spec.shape)))
        shape, dt = self.kv_spec.shape, self.kv_spec.jdtype
        alloc = jax.jit(lambda: jnp.zeros(shape, dt), out_shardings=sh)
        return alloc()

    def _device_hbm_bytes(self) -> int:
        try:
            stats = jax.devices()[0].memory_stats()
            if stats and "bytes_limit" in stats:
                return int(stats["bytes_limit"])
        except Exception:
            pass
        return HBM_BYTES_DEFAULT

    # ------------------------------------------------------------------
    # jitted step builders
    # ------------------------------------------------------------------

    def _extend_fn(self, tq: int, bs: int, pt_w: int, all_greedy: bool,
                   want_lp: bool, want_mask: bool = False,
                   want_pen: bool = False, want_hidden: bool = False,
                   want_embeds: bool = False, want_bias: bool = False,
                   want_ckpt: bool = False, want_spans: bool = False):
        key = ("extend", tq, bs, pt_w, all_greedy, want_lp, want_mask,
               want_pen, want_hidden, want_embeds, want_bias, want_ckpt,
               want_spans)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        block_q = self.block_q
        lora_on = self.lora is not None

        def raw(params, kv, rope, last_ids, *rest):
            rest = list(rest)
            counts = rest.pop(0) if want_pen else None
            hidden_row = rest.pop(0) if want_hidden else None
            (tokens, positions, slots, page_table, kv_lens, q_lens,
             qb_base, row_ids, info, steps) = rest[:10]
            tail = list(rest[10:])
            lidx = tail.pop(0) if lora_on else None
            embeds = tail.pop(0) if want_embeds else None
            bias = tail.pop(0) if want_bias else None
            ckpt = (
                (tail.pop(0), tail.pop(0)) if want_ckpt else None
            )  # (ckpt_pos, ckpt_rows)
            spans_arr = tail.pop(0) if want_spans else None
            mask = tail
            extra = {"state_ckpt": ckpt} if want_ckpt else {}
            if want_spans:
                extra["spans"] = spans_arr
            step_out = model.extend_step(
                params, kv, rope, tokens, positions, slots, page_table,
                kv_lens, q_lens, qb_base, block_q=block_q,
                capture_hidden=want_hidden, lora_idx=lidx,
                input_embeds=embeds, state_rows=row_ids, **extra,
            )
            if want_hidden:
                logits, kv, hidden = step_out
                # per-row chain-start feature for the EAGLE draft
                last = jnp.clip(
                    qb_base * block_q + jnp.maximum(q_lens, 1) - 1, 0,
                    tokens.shape[0] - 1,
                )
                hidden_row = hidden_row.at[row_ids].set(
                    hidden[last].astype(hidden_row.dtype), mode="drop"
                )
            else:
                logits, kv = step_out
            if want_bias:  # OpenAI logit_bias on the bonus-token sample
                logits = logits + bias
            vm = mask[0] if want_mask else None
            ids = sample(logits, info, steps, all_greedy=all_greedy, vocab_mask=vm,
                         eos_ids=self._eos_ids)
            # publish sampled ids (and first penalty count) into the
            # device sampling state so the NEXT decode step can be
            # dispatched before the host ever fetches these ids
            last_ids = last_ids.at[row_ids].set(ids, mode="drop")
            outs = (ids,)
            if want_lp:
                lp, top_ids, top_vals = logprob_outputs(logits, ids)
                outs = (ids, lp, top_ids, top_vals)
            if want_hidden:
                outs = outs + (hidden,)
            outs = outs + (kv, last_ids)
            if want_pen:
                counts = counts.at[row_ids, ids].add(1, mode="drop")
            if want_pen:
                outs = outs + (counts,)
            if want_hidden:
                outs = outs + (hidden_row,)
            return outs

        donate = [1, 3]
        idx = 4
        if want_pen:
            donate.append(idx)
            idx += 1
        if want_hidden:
            donate.append(idx)
        fn = jax.jit(
            self._wrap_step(
                raw,
                11 + (1 if want_mask else 0) + (1 if want_pen else 0)
                + (1 if want_hidden else 0) + (1 if lora_on else 0)
                + (1 if want_embeds else 0) + (1 if want_bias else 0)
                + (2 if want_ckpt else 0),
                n_replicated_out=(4 if want_lp else 1) + (1 if want_hidden else 0),
                n_state_out=1 + (1 if want_pen else 0) + (1 if want_hidden else 0),
            ),
            donate_argnums=tuple(donate),
        )
        self._fns[key] = fn
        return fn

    def _decode_overlap_fn(self, bs: int, pt_w: int, all_greedy: bool,
                           want_lp: bool, want_pen: bool):
        """Decode step whose input tokens come from the device sampling
        state — the TPU analogue of the reference's overlap-mode FutureMap
        (`managers/overlap_utils.py:32`): the host dispatches step N+1
        before fetching step N's sampled ids."""
        key = ("decode_ov", bs, pt_w, all_greedy, want_lp, want_pen)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        vocab = self.model_config.vocab_size

        lora_on = self.lora is not None

        def raw(params, kv, rope, last_ids, *rest):
            rest = list(rest)
            counts = rest.pop(0) if want_pen else None
            lidx = rest.pop() if lora_on else None
            row_ids, positions, slots, page_table, lengths, info, steps = rest
            tokens = last_ids[row_ids]
            logits, kv = model.decode_step(
                params, kv, rope, tokens, positions, slots, page_table,
                lengths, lora_idx=lidx, state_rows=row_ids,
            )
            if want_pen:
                logits = apply_penalties(logits, counts[row_ids], info, vocab)
            ids = sample(logits, info, steps, all_greedy=all_greedy,
                         eos_ids=self._eos_ids)
            last_ids = last_ids.at[row_ids].set(ids, mode="drop")
            outs = (ids,)
            if want_lp:
                lp, top_ids, top_vals = logprob_outputs(logits, ids)
                outs = (ids, lp, top_ids, top_vals)
            outs = outs + (kv, last_ids)
            if want_pen:
                counts = counts.at[row_ids, ids].add(1, mode="drop")
                outs = outs + (counts,)
            return outs

        fn = jax.jit(
            self._wrap_step(
                raw,
                8 + (1 if want_pen else 0) + (1 if lora_on else 0),
                n_replicated_out=4 if want_lp else 1,
                n_state_out=2 if want_pen else 1,
            ),
            donate_argnums=(1, 3, 4) if want_pen else (1, 3),
        )
        self._fns[key] = fn
        return fn

    def encode_images(self, pixels: np.ndarray) -> np.ndarray:
        """VLM vision encode: [N, 3, S, S] f32 -> projected features
        [N, tokens_per_image, H] f32 (models/llava.py encode_images)."""
        key = ("mm_encode", pixels.shape)
        if key not in self._fns:
            model = self.model
            self._fns[key] = jax.jit(
                lambda params, px: model.encode_images(params, px)
            )
        emb = self._fns[key](self.params, jnp.asarray(pixels, jnp.float32))
        return np.asarray(emb)

    def embed_tokens(self, ids: np.ndarray) -> np.ndarray:
        """Token embedding lookup (host side of the multimodal splice)."""
        key = ("mm_embed_tokens", len(ids))
        if key not in self._fns:
            model = self.model
            self._fns[key] = jax.jit(
                lambda params, i: model._embed(params, i)
            )
        return np.asarray(
            self._fns[key](self.params, jnp.asarray(ids, jnp.int32))
        )

    def _decode_logits_fn(self, bs: int, pt_w: int, want_pen: bool):
        """Phase A of the two-phase constrained-overlap decode: forward to
        logits only (device-resident input tokens), penalties applied.
        The host builds grammar masks while this runs — the TPU analogue of
        the reference's same-stream bitmask pipelining
        (`srt/constrained/xgrammar_backend.py:94`)."""
        key = ("decode_logits", bs, pt_w, want_pen)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        vocab = self.model_config.vocab_size
        lora_on = self.lora is not None

        def raw(params, kv, rope, last_ids, *rest):
            rest = list(rest)
            counts = rest.pop(0) if want_pen else None
            lidx = rest.pop() if lora_on else None
            row_ids, positions, slots, page_table, lengths, info = rest
            tokens = last_ids[row_ids]
            logits, kv = model.decode_step(
                params, kv, rope, tokens, positions, slots, page_table,
                lengths, lora_idx=lidx, state_rows=row_ids,
            )
            if want_pen:
                logits = apply_penalties(logits, counts[row_ids], info, vocab)
            return logits, kv

        fn = jax.jit(
            self._wrap_step(
                raw,
                7 + (1 if want_pen else 0) + (1 if lora_on else 0),
                n_replicated_out=1,
                n_state_out=0,
            ),
            donate_argnums=(1,),
        )
        self._fns[key] = fn
        return fn

    def _sample_masked_fn(self, bs: int, all_greedy: bool, want_lp: bool,
                          want_pen: bool, want_bias: bool):
        """Phase B: bit-packed vocab mask (+ logit_bias) -> sample -> row
        publish.  Plain jit (replicated data only — no params/KV)."""
        key = ("sample_masked", bs, all_greedy, want_lp, want_pen, want_bias)
        if key in self._fns:
            return self._fns[key]
        vocab = self.model_config.vocab_size
        eos_ids = self._eos_ids

        def raw(last_ids, logits, *rest):
            rest = list(rest)
            counts = rest.pop(0) if want_pen else None
            row_ids, info, steps, mask_u8 = rest[:4]
            if want_bias:
                logits = logits + rest[4]
            bits = (mask_u8[:, :, None] >> jnp.arange(8, dtype=jnp.uint8)) & 1
            vm = bits.reshape(mask_u8.shape[0], -1)[:, :vocab].astype(bool)
            ids = sample(logits, info, steps, all_greedy=all_greedy,
                         vocab_mask=vm, eos_ids=eos_ids)
            last_ids = last_ids.at[row_ids].set(ids, mode="drop")
            outs = (ids,)
            if want_lp:
                lp, top_ids, top_vals = logprob_outputs(logits, ids)
                outs = (ids, lp, top_ids, top_vals)
            outs = outs + (last_ids,)
            if want_pen:
                counts = counts.at[row_ids, ids].add(1, mode="drop")
                outs = outs + (counts,)
            return outs

        fn = jax.jit(raw, donate_argnums=(0, 2) if want_pen else (0,))
        self._fns[key] = fn
        return fn

    def forward_decode_logits(self, d: DecodeInput, update_counts: bool = False):
        """Dispatch phase A (forward -> device logits).  Returns an opaque
        context consumed by `sample_constrained` after the host has the
        grammar masks for this step."""
        bs = len(d.lengths)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(d.page_table.shape[1], self.pmax_buckets)
        st = self.sampling_state
        fn = self._decode_logits_fn(bs_pad, pt_w, update_counts)
        _, positions, slots, pt, lengths = self._pad_decode(d, bs_pad, pt_w)
        info = _sampling_info(d.sampling_padded(bs_pad))
        steps = np.zeros(bs_pad, np.int32)
        if d.sample_steps is not None:
            steps[: bs] = d.sample_steps
        rows = self._pad_rows(d.row_ids, bs, bs_pad)
        self.decode_steps_counter += 1
        args = (
            self.params, self.kv_cache, self.rope_tab, st.last_ids,
            *((st.ensure_counts(),) if update_counts else ()),
            rows, positions, slots, pt, lengths, info,
        )
        if self.lora is not None:
            args = args + (jnp.asarray(self._pad_i32(
                d.lora_idx if d.lora_idx is not None else [], bs_pad, fill=-1
            )),)
        logits, kv = fn(*args)
        self.kv_cache = kv
        return {
            "logits": logits, "rows": rows, "info": info,
            "steps": jnp.asarray(steps), "bs_pad": bs_pad,
            "all_greedy": d.all_greedy(), "want_pen": update_counts,
        }

    def sample_constrained(
        self,
        ctx: dict,
        vocab_mask: Optional[np.ndarray] = None,  # [B, V] bool
        logit_bias: Optional[np.ndarray] = None,  # [B, V] f32
        want_logprobs: bool = False,
    ):
        """Dispatch phase B on a phase-A context -> (ids, lp) device arrays."""
        bs_pad = ctx["bs_pad"]
        st = self.sampling_state
        V = self.model_config.vocab_size
        vm = np.ones((bs_pad, V), bool)
        if vocab_mask is not None:
            vm[: vocab_mask.shape[0]] = vocab_mask
        mask_u8 = np.packbits(vm, axis=1, bitorder="little")
        fn = self._sample_masked_fn(
            bs_pad, ctx["all_greedy"], want_logprobs, ctx["want_pen"],
            logit_bias is not None,
        )
        args = [st.last_ids, ctx["logits"]]
        if ctx["want_pen"]:
            args.append(st.ensure_counts())
        args += [ctx["rows"], ctx["info"], ctx["steps"], jnp.asarray(mask_u8)]
        if logit_bias is not None:
            lb = np.zeros((bs_pad, V), np.float32)
            lb[: logit_bias.shape[0]] = logit_bias
            args.append(jnp.asarray(lb))
        outs = list(fn(*args))
        if ctx["want_pen"]:
            st.out_counts = outs.pop()
        st.last_ids = outs.pop()
        lp = None
        if want_logprobs:
            lp = {
                "logprobs": outs[1],
                "top_ids": outs[2],
                "top_logprobs": outs[3],
            }
        return outs[0], lp

    def _decode_fn(
        self, bs: int, pt_w: int, all_greedy: bool, want_lp: bool,
        want_mask: bool = False, want_pen: bool = False,
        want_bias: bool = False,
    ):
        key = ("decode", bs, pt_w, all_greedy, want_lp, want_mask, want_pen,
               want_bias)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        vocab = self.model_config.vocab_size

        lora_on = self.lora is not None

        def raw(params, kv, rope, tokens, positions, slots, page_table, lengths, info, steps, rows, *extra):
            extra = list(extra)
            lidx = extra.pop() if lora_on else None
            logits, kv = model.decode_step(
                params, kv, rope, tokens, positions, slots, page_table,
                lengths, lora_idx=lidx, state_rows=rows,
            )
            if want_pen:
                counts = extra.pop(0)
                logits = apply_penalties(logits, counts, info, vocab)
            if want_bias:  # OpenAI logit_bias (reference sampler order)
                logits = logits + extra.pop(0)
            vm = extra.pop(0) if want_mask else None
            ids = sample(logits, info, steps, all_greedy=all_greedy, vocab_mask=vm,
                         eos_ids=self._eos_ids)
            if want_lp:
                lp, top_ids, top_vals = logprob_outputs(logits, ids)
                return ids, lp, top_ids, top_vals, kv
            return ids, kv

        fn = jax.jit(
            self._wrap_step(
                raw,
                8 + (1 if want_mask else 0) + (1 if want_pen else 0)
                + (1 if want_bias else 0) + (1 if lora_on else 0),
                n_replicated_out=4 if want_lp else 1,
            ),
            donate_argnums=(1,),
        )
        self._fns[key] = fn
        return fn

    def _decode_multi_fn(self, bs: int, pt_w: int, n_steps: int, all_greedy: bool):
        key = ("decode_multi", bs, pt_w, n_steps, all_greedy)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        ps = self.page_size
        lora_on = self.lora is not None

        def raw(params, kv, rope, tokens0, lengths0, page_table, info, steps0,
                rows, *extra):
            lidx = extra[0] if lora_on else None

            def body(carry, s):
                kv, toks, lens = carry
                live = lens > 0
                pos = jnp.maximum(lens - 1, 0)
                page = page_table[jnp.arange(bs), pos // ps]
                slots = jnp.where(live, page * ps + pos % ps, PAD_SLOT)
                logits, kv = model.decode_step(
                    params, kv, rope, toks, pos, slots, page_table, lens,
                    lora_idx=lidx, state_rows=rows,
                )
                ids = sample(logits, info, steps0 + s, all_greedy=all_greedy,
                             eos_ids=self._eos_ids)
                lens = jnp.where(live, lens + 1, lens)
                return (kv, ids, lens), ids

            (kv, _, _), all_ids = jax.lax.scan(
                body, (kv, tokens0, lengths0), jnp.arange(n_steps)
            )
            return all_ids, kv

        fn = jax.jit(
            self._wrap_step(raw, 6 + (1 if lora_on else 0), n_replicated_out=1),
            donate_argnums=(1,),
        )
        self._fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    # public forward API (numpy in, numpy out)
    # ------------------------------------------------------------------

    def _pad_extend(self, ext: ExtendBatchInput):
        """Pad an extend batch to (tq, bs, pt_w) buckets -> jnp arrays."""
        TQ = len(ext.tokens)
        B = len(ext.kv_lens)
        tq_pad = pick_bucket(max(TQ, self.block_q), self.prefill_token_buckets)
        bs_pad = pick_bucket(B, EXTEND_BS_BUCKETS)
        pt_w = pick_bucket(max(ext.page_table.shape[1], 1), self.pmax_buckets)

        tokens = np.zeros(tq_pad, np.int32)
        tokens[:TQ] = ext.tokens
        pos_in = np.asarray(ext.positions)
        if pos_in.ndim == 2:  # mrope: [3, TQ] position streams
            positions = np.zeros((3, tq_pad), np.int32)
            positions[:, :TQ] = pos_in
        else:
            positions = np.zeros(tq_pad, np.int32)
            positions[:TQ] = pos_in
        slots = np.full(tq_pad, PAD_SLOT, np.int32)
        slots[:TQ] = ext.slots
        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(ext.page_table.shape[1], pt_w)
        pt[:B, :w] = ext.page_table[:, :w]
        kv_lens = np.zeros(bs_pad, np.int32)
        kv_lens[:B] = ext.kv_lens
        q_lens = np.zeros(bs_pad, np.int32)
        q_lens[:B] = ext.q_lens
        qb_base = np.zeros(bs_pad, np.int32)
        qb_base[:B] = ext.qb_base
        steps = np.zeros(bs_pad, np.int32)
        if ext.sample_steps is not None:
            steps[:B] = ext.sample_steps
        return (
            tq_pad, bs_pad, pt_w,
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(slots),
            jnp.asarray(pt), jnp.asarray(kv_lens), jnp.asarray(q_lens),
            jnp.asarray(qb_base), jnp.asarray(steps),
        )

    def _pad_rows(self, row_ids: Optional[np.ndarray], bs: int, bs_pad: int):
        st = self.sampling_state
        rows = np.full(bs_pad, st.trash_row, np.int32)
        if row_ids is not None:
            rows[:bs] = row_ids
        return jnp.asarray(rows)

    def _input_lp_fn(self, tq: int):
        """Prompt-token logprobs from captured hidden states: row i scores
        next_tokens[i] given the prefix through position i (reference
        extend-token logprobs, logits_processor.py:233).  Vocab-blocked
        lax.map keeps the [TQ, V] logits out of memory."""
        key = ("input_lp", tq)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        blk = 128
        assert tq % blk == 0

        def raw(params, hidden, next_tokens):
            def one(args):
                h, t = args
                logits = model._logits(params, h.astype(jnp.bfloat16))
                lp = jax.nn.log_softmax(logits, axis=-1)
                chosen = jnp.take_along_axis(lp, t[:, None], axis=-1)[:, 0]
                tv, ti = jax.lax.top_k(lp, 20)
                return chosen, ti.astype(jnp.int32), tv

            H = hidden.shape[-1]
            chosen, ti, tv = jax.lax.map(
                one, (hidden.reshape(-1, blk, H), next_tokens.reshape(-1, blk))
            )
            return chosen.reshape(tq), ti.reshape(tq, 20), tv.reshape(tq, 20)

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            specs = dict(
                mesh=self.mesh,
                in_specs=(self._param_specs, P(), P()),
                out_specs=(P(), P(), P()),
            )
            try:
                raw_w = jax.shard_map(raw, check_vma=False, **specs)
            except TypeError:
                raw_w = jax.shard_map(raw, check_rep=False, **specs)
        else:
            raw_w = raw
        fn = jax.jit(raw_w)
        self._fns[key] = fn
        return fn

    def forward_extend_batch(
        self,
        ext: ExtendBatchInput,
        want_logprobs: bool = False,
        vocab_mask: Optional[np.ndarray] = None,  # [B, V] bool
        update_counts: bool = False,
        async_result: bool = False,
        want_input_lp: bool = False,
        logit_bias: Optional[np.ndarray] = None,  # [B, V] f32
        state_ckpt=None,  # (ckpt_pos [B], ckpt_rows [B]) hybrid prefix cache
    ):
        """Run one batched prefill step -> (ids [bs_pad], logprobs|None).

        ids[b] is only meaningful for rows finishing their prompt this step.
        Sampled ids are also published to the device sampling state at
        ext.row_ids, so a decode step can consume them before the host
        fetches.  With async_result the returned arrays stay on device.
        """
        if getattr(self.model, "_swa_rings", False):
            # ring-capacity invariant: one dispatch must never carry more
            # new tokens per request than the ring was sized for (the
            # dispatch's tail would overwrite pages its own earlier
            # queries still read)
            assert int(np.max(ext.q_lens)) <= self.model._swa_chunk_tokens, (
                int(np.max(ext.q_lens)), self.model._swa_chunk_tokens)

        (tq_pad, bs_pad, pt_w, tokens, positions, slots, pt,
         kv_lens, q_lens, qb_base, steps) = self._pad_extend(ext)
        st = self.sampling_state
        want_hidden = self.draft is not None or want_input_lp
        if want_input_lp and getattr(self.model, "aux_capture_layers", ()):
            raise NotImplementedError(
                "prompt logprobs + EAGLE3 (the capture channel carries the "
                "draft's aux hiddens, not the head hidden) — disable "
                "speculative decoding for logprob_start_len requests"
            )
        want_embeds = ext.input_embeds is not None
        want_spans = ext.spans is not None
        fn = self._extend_fn(
            tq_pad, bs_pad, pt_w, ext.all_greedy(), want_logprobs,
            vocab_mask is not None, update_counts, want_hidden, want_embeds,
            logit_bias is not None, state_ckpt is not None, want_spans,
        )
        info = _sampling_info(ext.sampling_padded(bs_pad))
        rows = self._pad_rows(ext.row_ids, len(ext.kv_lens), bs_pad)
        state_args = (st.last_ids,) + (
            (st.ensure_counts(),) if update_counts else ()
        ) + ((self.spec_hidden_row,) if want_hidden else ())
        args = (
            self.params, self.kv_cache, self.rope_tab, *state_args,
            tokens, positions, slots, pt, kv_lens, q_lens, qb_base,
            rows, info, steps,
        )
        if self.lora is not None:
            args = args + (jnp.asarray(
                self._pad_i32(
                    ext.lora_idx if ext.lora_idx is not None else [],
                    tq_pad, fill=-1,
                )
            ),)
        if want_embeds:
            emb = np.zeros((tq_pad, ext.input_embeds.shape[1]), np.float32)
            emb[: len(ext.input_embeds)] = ext.input_embeds
            args = args + (jnp.asarray(emb, jnp.bfloat16),)
        if logit_bias is not None:
            lb = np.zeros((bs_pad, logit_bias.shape[1]), np.float32)
            lb[: logit_bias.shape[0]] = logit_bias
            args = args + (jnp.asarray(lb),)
        if state_ckpt is not None:
            cp = self._pad_i32(state_ckpt[0], bs_pad, fill=-1)
            cr = self._pad_i32(state_ckpt[1], bs_pad, fill=-1)
            args = args + (jnp.asarray(cp), jnp.asarray(cr))
        if want_spans:
            args = args + (jnp.asarray(
                self._pad_i32(ext.spans, tq_pad, fill=0)),)
        if vocab_mask is not None:
            vm = np.ones((bs_pad, vocab_mask.shape[1]), bool)
            vm[: vocab_mask.shape[0]] = vocab_mask
            args = args + (jnp.asarray(vm),)
        outs = list(fn(*args))
        if want_hidden:
            self.spec_hidden_row = outs.pop()
        if update_counts:
            st.out_counts = outs.pop()
        st.last_ids = outs.pop()
        self.kv_cache = outs.pop()
        input_lp = None
        if want_hidden:
            hidden = outs.pop()  # [tq_pad, H] device
            if self.draft is not None and ext.draft_tokens is not None:
                self._eagle_prefill(ext, hidden, tq_pad, bs_pad, pt_w, pt)
            if want_input_lp:
                nxt = self._pad_i32(ext.draft_tokens, tq_pad)
                chosen, ti, tv = self._input_lp_fn(tq_pad)(
                    self.params, hidden, jnp.asarray(nxt)
                )
                input_lp = {"logprobs": chosen, "top_ids": ti,
                            "top_logprobs": tv}
        ids = outs[0]
        lp = None
        if want_logprobs:
            lp = {
                "logprobs": outs[1],
                "top_ids": outs[2],
                "top_logprobs": outs[3],
            }
        if want_input_lp:  # 3-tuple contract for input-logprob callers
            if async_result:
                return ids, lp, input_lp
            return (
                np.asarray(ids),
                {k: np.asarray(v) for k, v in lp.items()} if lp else None,
                {k: np.asarray(v) for k, v in input_lp.items()},
            )
        if async_result:
            return ids, lp
        ids = np.asarray(ids)
        if lp is not None:
            lp = {k: np.asarray(v) for k, v in lp.items()}
        return ids, lp

    def forward_decode_overlap(
        self,
        d: DecodeInput,
        want_logprobs: bool = False,
        update_counts: bool = False,
    ):
        """One decode step reading input tokens from the device sampling
        state (d.row_ids) — returns DEVICE arrays (ids, logprobs|None) so the
        scheduler can dispatch the next step before fetching these.  The
        sampled ids are re-published to the rows in-step; penalty counts
        live on device (update_counts applies + accumulates them)."""
        bs = len(d.lengths)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(d.page_table.shape[1], self.pmax_buckets)
        st = self.sampling_state
        fn = self._decode_overlap_fn(
            bs_pad, pt_w, d.all_greedy(), want_logprobs, update_counts
        )
        _, positions, slots, pt, lengths = self._pad_decode(d, bs_pad, pt_w)
        info = _sampling_info(d.sampling_padded(bs_pad))
        steps = np.zeros(bs_pad, np.int32)
        if d.sample_steps is not None:
            steps[:bs] = d.sample_steps
        rows = self._pad_rows(d.row_ids, bs, bs_pad)
        self.decode_steps_counter += 1
        state_args = (st.last_ids,) + (
            (st.ensure_counts(),) if update_counts else ()
        )
        args = (
            self.params, self.kv_cache, self.rope_tab, *state_args,
            rows, positions, slots, pt, lengths, info, jnp.asarray(steps),
        )
        if self.lora is not None:
            args = args + (jnp.asarray(self._pad_i32(
                d.lora_idx if d.lora_idx is not None else [], bs_pad, fill=-1
            )),)
        outs = list(fn(*args))
        if update_counts:
            st.out_counts = outs.pop()
        st.last_ids = outs.pop()
        self.kv_cache = outs.pop()
        lp = None
        if want_logprobs:
            lp = {
                "logprobs": outs[1],
                "top_ids": outs[2],
                "top_logprobs": outs[3],
            }
        return outs[0], lp

    def forward_decode(
        self,
        d: DecodeInput,
        want_logprobs: bool = False,
        vocab_mask: Optional[np.ndarray] = None,
        output_counts: Optional[np.ndarray] = None,  # [B, V] i32 (penalties)
        logit_bias: Optional[np.ndarray] = None,  # [B, V] f32
    ) -> Tuple[np.ndarray, Optional[dict]]:
        """One decode step over a padded batch -> (ids [bs_pad], logprobs)."""
        bs = len(d.tokens)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(d.page_table.shape[1], self.pmax_buckets)
        fn = self._decode_fn(
            bs_pad, pt_w, d.all_greedy(), want_logprobs,
            vocab_mask is not None, output_counts is not None,
            logit_bias is not None,
        )
        arrays = self._pad_decode(d, bs_pad, pt_w)
        info = _sampling_info(d.sampling_padded(bs_pad))
        steps = np.zeros(bs_pad, np.int32)
        if d.sample_steps is not None:
            steps[:bs] = d.sample_steps
        self.decode_steps_counter += 1
        args = (
            self.params, self.kv_cache, self.rope_tab,
            *arrays, info, jnp.asarray(steps),
            self._pad_rows(d.row_ids, bs, bs_pad),
        )
        if output_counts is not None:
            oc = np.zeros((bs_pad, output_counts.shape[1]), np.int32)
            oc[:bs] = output_counts
            args = args + (jnp.asarray(oc),)
        if logit_bias is not None:
            lb = np.zeros((bs_pad, logit_bias.shape[1]), np.float32)
            lb[:bs] = logit_bias
            args = args + (jnp.asarray(lb),)
        if vocab_mask is not None:
            vm = np.ones((bs_pad, vocab_mask.shape[1]), bool)
            vm[:bs] = vocab_mask
            args = args + (jnp.asarray(vm),)
        if self.lora is not None:
            args = args + (jnp.asarray(self._pad_i32(
                d.lora_idx if d.lora_idx is not None else [], bs_pad, fill=-1
            )),)
        if want_logprobs:
            ids, lp, top_ids, top_vals, self.kv_cache = fn(*args)
            return np.asarray(ids), {
                "logprobs": np.asarray(lp),
                "top_ids": np.asarray(top_ids),
                "top_logprobs": np.asarray(top_vals),
            }
        ids, self.kv_cache = fn(*args)
        return np.asarray(ids), None

    def forward_decode_multi(self, d: DecodeInput, n_steps: int) -> np.ndarray:
        """n_steps decode steps in one dispatch -> ids [n_steps, bs_pad].

        Pages for all steps must already be in d.page_table.
        """
        bs = len(d.tokens)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(d.page_table.shape[1], self.pmax_buckets)
        fn = self._decode_multi_fn(bs_pad, pt_w, n_steps, d.all_greedy())
        tokens, _, _, page_table, lengths = self._pad_decode(d, bs_pad, pt_w)
        info = _sampling_info(d.sampling_padded(bs_pad))
        steps0 = np.zeros(bs_pad, np.int32)
        if d.sample_steps is not None:
            steps0[:bs] = d.sample_steps
        self.decode_steps_counter += n_steps
        args = (
            self.params, self.kv_cache, self.rope_tab,
            tokens, lengths, page_table, info, jnp.asarray(steps0),
            self._pad_rows(d.row_ids, bs, bs_pad),
        )
        if self.lora is not None:
            args = args + (jnp.asarray(self._pad_i32(
                d.lora_idx if d.lora_idx is not None else [], bs_pad, fill=-1
            )),)
        all_ids, self.kv_cache = fn(*args)
        return np.asarray(all_ids)

    def _pad_decode(self, d: DecodeInput, bs_pad: int, pt_w: int):
        bs = len(d.tokens)
        tokens = np.zeros(bs_pad, np.int32)
        tokens[:bs] = d.tokens
        positions = np.zeros(bs_pad, np.int32)
        positions[:bs] = d.positions
        slots = np.full(bs_pad, PAD_SLOT, np.int32)
        slots[:bs] = d.slots
        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(d.page_table.shape[1], pt_w)
        pt[:bs, :w] = d.page_table[:, :w]
        lengths = np.zeros(bs_pad, np.int32)
        lengths[:bs] = d.lengths
        return (
            jnp.asarray(tokens),
            jnp.asarray(positions),
            jnp.asarray(slots),
            jnp.asarray(pt),
            jnp.asarray(lengths),
        )

    def _embed_fn(self, tq: int, bs: int, pt_w: int):
        key = ("embed", tq, bs, pt_w)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        block_q = self.block_q

        def raw(params, kv, rope, tokens, positions, slots, page_table,
                kv_lens, q_lens, qb_base):
            hidden, kv = model.extend_step(
                params, kv, rope, tokens, positions, slots, page_table,
                kv_lens, q_lens, qb_base, return_hidden=True, block_q=block_q,
            )
            return hidden, kv

        fn = jax.jit(self._wrap_step(raw, 7, n_replicated_out=1), donate_argnums=(1,))
        self._fns[key] = fn
        return fn

    def forward_embed(self, ext: ExtendBatchInput) -> np.ndarray:
        """Per-seq last-token pooled hidden states [B, H]
        (reference /encode /v1/embeddings)."""
        (tq_pad, bs_pad, pt_w, tokens, positions, slots, pt,
         kv_lens, q_lens, qb_base, _) = self._pad_extend(ext)
        fn = self._embed_fn(tq_pad, bs_pad, pt_w)
        hidden, self.kv_cache = fn(
            self.params, self.kv_cache, self.rope_tab,
            tokens, positions, slots, pt, kv_lens, q_lens, qb_base,
        )
        out = np.asarray(hidden)[: len(ext.kv_lens)]
        if getattr(self.model, "is_reward_model", False):
            # reward/classification heads: scores, not raw hidden
            out = self.model.apply_score_head(self.params, out)
        return out

    def _spec_verify_fn(self, bs: int, q_span: int, pt_w: int,
                        want_hidden: bool = False, all_greedy: bool = True,
                        want_bias: bool = False, want_pen: bool = False):
        key = ("spec_verify", bs, q_span, pt_w, want_hidden, all_greedy,
               want_bias, want_pen)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        vocab = self.model_config.vocab_size
        lora_on = self.lora is not None

        def raw(params, kv, rope, tokens, positions, slots, page_table,
                lengths, info, steps, *extra):
            extra = list(extra)
            lidx = extra.pop(0) if lora_on else None
            bias0 = extra.pop(0) if want_bias else None
            caps = extra.pop(0) if want_bias else None
            row_ids = extra.pop(0) if want_pen else None
            counts = extra.pop(0) if want_pen else None
            out = model.spec_verify_step(
                params, kv, rope, tokens, positions, slots, page_table,
                lengths, capture_hidden=want_hidden, lora_idx=lidx,
            )
            logits, kv = out[0], out[1]
            if want_pen:
                # per-request penalties under speculation (reference runs
                # spec per-request; round-3 disabled spec batch-wide on any
                # penalty).  Position j's candidate distribution penalizes
                # the base counts PLUS the chain prefix draft_1..draft_j —
                # exactly the counts a non-spec decode would see had those
                # drafts been committed, so accepted chains reproduce the
                # non-spec output.
                run = counts[row_ids]  # [B, V]
                pls = []
                for j in range(q_span):
                    pls.append(apply_penalties(logits[:, j], run, info, vocab))
                    if j + 1 < q_span:
                        run = run.at[
                            jnp.arange(bs), tokens[:, j + 1]
                        ].add(1, mode="drop")
                logits = jnp.stack(pls, axis=1)
            # chain accept/reject on device (distribution-preserving for
            # sampled rows; argmax-match for greedy rows); constrained rows
            # participate width-1 with their grammar/bias at position 0
            emit_ids, emit_len, ids = spec_accept_sample(
                logits, tokens, info, steps, all_greedy=all_greedy,
                bias0=bias0, caps=caps,
            )
            if want_pen:
                # commit emitted tokens into the device count rows
                jr = jnp.arange(q_span)[None, :]
                add = (jr < emit_len[:, None]).astype(jnp.int32)
                for j in range(q_span):
                    counts = counts.at[row_ids, emit_ids[:, j]].add(
                        add[:, j], mode="drop")
            outs = (ids, emit_ids, emit_len)
            if want_hidden:
                outs = outs + (out[2],)
            outs = outs + (kv,)
            if want_pen:
                outs = outs + (counts,)
            return outs

        fn = jax.jit(
            self._wrap_step(
                raw,
                7 + (1 if lora_on else 0) + (2 if want_bias else 0)
                + (2 if want_pen else 0),
                n_replicated_out=4 if want_hidden else 3,
                n_state_out=1 if want_pen else 0,
            ),
            donate_argnums=(1,),
        )
        self._fns[key] = fn
        return fn

    def forward_spec_verify(
        self,
        tokens: np.ndarray,  # [B, QS]
        positions: np.ndarray,  # [B, QS]
        slots: np.ndarray,  # [B, QS]
        page_table: np.ndarray,  # [B, *]
        lengths: np.ndarray,  # [B] total incl. QS
        sampling: Optional[list] = None,  # [B] SamplingRow
        sample_steps: Optional[np.ndarray] = None,  # [B]
        all_greedy: bool = True,
        lora_idx: Optional[np.ndarray] = None,  # [B]
        bias0: Optional[np.ndarray] = None,  # [B, V] pos-0 additive bias
        spec_caps: Optional[np.ndarray] = None,  # [B] per-row emit cap
        row_ids: Optional[np.ndarray] = None,  # [B] device count rows
        update_counts: bool = False,  # penalties ride the verify per-row
    ):
        """Speculative verify -> (ids_greedy, emit_ids, emit_len) numpy."""
        bs, qs = tokens.shape
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        want_bias = bias0 is not None
        fn = self._spec_verify_fn(
            bs_pad, qs, pt_w, self.draft is not None, all_greedy, want_bias,
            want_pen=update_counts,
        )

        def pad2(a, fill=0):
            out = np.full((bs_pad, qs), fill, a.dtype)
            out[:bs] = a
            return out

        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(page_table.shape[1], pt_w)
        pt[:bs, :w] = page_table[:, :w]
        lens = np.zeros(bs_pad, np.int32)
        lens[:bs] = lengths
        self.decode_steps_counter += 1
        want_hidden = self.draft is not None
        from sglang_awq_tpu.model_executor.forward_batch import SamplingBatch

        rows = list(sampling) if sampling is not None else []
        info = _sampling_info(SamplingBatch.from_rows(rows, pad_to=bs_pad))
        steps = np.zeros(bs_pad, np.int32)
        if sample_steps is not None:
            steps[:bs] = sample_steps
        args = (
            self.params,
            self.kv_cache,
            self.rope_tab,
            jnp.asarray(pad2(tokens)),
            jnp.asarray(pad2(positions)),
            jnp.asarray(pad2(slots, PAD_SLOT)),
            jnp.asarray(pt),
            jnp.asarray(lens),
            info,
            jnp.asarray(steps),
        )
        if self.lora is not None:
            args = args + (jnp.asarray(self._pad_i32(
                lora_idx if lora_idx is not None else [], bs_pad, fill=-1
            )),)
        if want_bias:
            b0 = np.zeros((bs_pad, bias0.shape[1]), np.float32)
            b0[:bs] = bias0
            cp = np.full(bs_pad, qs, np.int32)
            if spec_caps is not None:
                cp[:bs] = spec_caps
            args = args + (jnp.asarray(b0), jnp.asarray(cp))
        if update_counts:
            st = self.sampling_state
            args = args + (
                self._pad_rows(row_ids, bs, bs_pad), st.ensure_counts(),
            )
        outs = list(fn(*args))
        if update_counts:
            self.sampling_state.out_counts = outs.pop()
        if want_hidden:
            ids, emit_ids, emit_len, self._verify_hidden, self.kv_cache = outs
        else:
            ids, emit_ids, emit_len, self.kv_cache = outs
        return np.asarray(ids), np.asarray(emit_ids), np.asarray(emit_len)

    # ------------------------------------------------------------------
    # EAGLE speculative decoding (reference eagle_worker.py:79,511,670)
    # ------------------------------------------------------------------

    def _eagle_prefill(self, ext, hidden, tq_pad, bs_pad, pt_w, pt):
        """Draft prefill over the chunk (builds draft KV for the prompt)."""
        key = ("eagle_prefill", tq_pad, bs_pad, pt_w)
        if key not in self._fns:
            draft = self.draft
            block_q = self.block_q

            def raw(dp, dkv, drope, embed_w, tokens, hidden, positions, slots,
                    pt, kv_lens, q_lens, qb_base):
                return draft.extend_hidden(
                    dp, dkv, drope, embed_w, tokens, hidden, positions, slots,
                    pt, kv_lens, q_lens, qb_base, block_q=block_q,
                )

            self._fns[key] = jax.jit(raw, donate_argnums=(1,))
        TQ = len(ext.tokens)
        B = len(ext.kv_lens)
        dtok = self._pad_i32(ext.draft_tokens, tq_pad)
        dslots = self._pad_i32(ext.draft_slots, tq_pad, fill=PAD_SLOT)
        pos = self._pad_i32(ext.positions, tq_pad)
        self.draft_kv = self._fns[key](
            self.draft_params, self.draft_kv, self.draft_rope,
            self._draft_embed_w(),
            jnp.asarray(dtok), hidden, jnp.asarray(pos), jnp.asarray(dslots),
            pt,
            jnp.asarray(self._pad_i32(ext.draft_kv_lens, bs_pad)),
            jnp.asarray(self._pad_i32(ext.draft_q_lens, bs_pad)),
            jnp.asarray(self._pad_i32(ext.qb_base, bs_pad)),
        )

    @staticmethod
    def _pad_i32(a, n, fill=0):
        out = np.full(n, fill, np.int32)
        out[: len(a)] = a
        return out

    def eagle_draft_chain(
        self,
        row_ids: np.ndarray,  # [B] sampling-state rows (chain-start hidden)
        t0: np.ndarray,  # [B] newest accepted token
        fill_len: np.ndarray,  # [B] tokens before the newest one (0 = pad)
        page_table: np.ndarray,  # [B, *]
        k: int,  # draft tokens to produce (spec_width - 1)
    ) -> np.ndarray:
        """K-step draft chain -> proposed tokens [B, k] (host numpy).

        Step j drafts from draft position fill_len-1+j; the first step's
        feature is the per-row target hidden (spec_hidden_row), later steps
        feed the draft's own hidden (EAGLE chain)."""
        bs = len(t0)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        key = ("eagle_chain", bs_pad, pt_w, k)
        if key not in self._fns:
            draft = self.draft
            ps = self.page_size

            def raw(dp, dkv, drope, embed_w, head, hidden_row, rows,
                    t0, P, pt):
                h = draft.start_hidden(dp, hidden_row[rows])  # [B, H]
                ar = jnp.arange(bs_pad)

                def step(carry, j):
                    h, tok, dkv = carry
                    pos = P - 1 + j  # draft position
                    live = P > 0
                    pos_c = jnp.maximum(pos, 0)
                    slots = jnp.where(
                        live,
                        pt[ar, jnp.minimum(pos_c // ps, pt.shape[1] - 1)] * ps
                        + pos_c % ps,
                        PAD_SLOT,
                    )
                    lens = jnp.where(live, pos_c + 1, 0)
                    g, dkv = draft.decode_hidden(
                        dp, dkv, drope, embed_w, tok, h, pos_c, slots, pt, lens
                    )
                    gh = draft.head_input(dp, g)
                    if "weight_q" in head:  # int8 lm_head (scaled cols)
                        logits = jnp.dot(
                            gh.astype(jnp.bfloat16),
                            head["weight_q"].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32,
                        ) * head["scale"][None, :]
                    else:
                        logits = jnp.dot(
                            gh.astype(jnp.bfloat16), head["weight"],
                            preferred_element_type=jnp.float32,
                        )
                    nxt = draft.map_draft_ids(
                        dp, jnp.argmax(logits, axis=-1).astype(jnp.int32))
                    return (g.astype(jnp.bfloat16), nxt, dkv), nxt

                (_, _, dkv), drafts = jax.lax.scan(
                    step, (h, t0, dkv), jnp.arange(k)
                )
                return drafts.T, dkv  # [B, k]

            self._fns[key] = jax.jit(raw, donate_argnums=(1,))
        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(page_table.shape[1], pt_w)
        pt[:bs, :w] = page_table[:, :w]
        rows = self._pad_rows(row_ids, bs, bs_pad)
        drafts, self.draft_kv = self._fns[("eagle_chain", bs_pad, pt_w, k)](
            self.draft_params, self.draft_kv, self.draft_rope,
            self._draft_embed_w(), self._draft_head_p(),
            self.spec_hidden_row, rows,
            jnp.asarray(self._pad_i32(t0, bs_pad)),
            jnp.asarray(self._pad_i32(fill_len, bs_pad)),
            jnp.asarray(pt),
        )
        return np.asarray(drafts)[:bs]

    def forward_spec_verify_tree(
        self,
        tokens: np.ndarray,  # [B, QS] tree node tokens (node 0 = root)
        positions: np.ndarray,  # [B, QS]
        slots: np.ndarray,  # [B, QS]
        page_table: np.ndarray,
        prefix_lens: np.ndarray,  # [B]
        tree_mask: np.ndarray,  # [QS, QS] or [B, QS, QS] bool topology
        sampling: Optional[list] = None,  # SamplingRow list; None => greedy
        sample_steps: Optional[np.ndarray] = None,  # [B, QS] draw indices
    ) -> np.ndarray:
        """Tree verify -> per-node next-token ids [B, QS].

        The topology mask is DEVICE DATA (round 5): score-driven trees give
        every request its own shape without recompiling (reference
        `build_tree_kernel_efficient` role).  With `sampling`, each node's
        id is a temperature/top-k/p DRAW from the target's filtered
        distribution (seeded per request, folded by the node's sample
        step) instead of argmax; the host accept walk — "follow children
        matching the drawn id" — then yields tokens that are exact samples
        from the target chain distribution (every emitted token is one
        draw from its true conditional), the draw-matching form of
        reference tree_speculative_sampling."""
        bs, qs = tokens.shape
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        all_greedy = sampling is None
        key = ("spec_verify_tree", bs_pad, qs, pt_w, all_greedy)
        if key not in self._fns:
            model = self.model
            want_hidden = self.draft is not None
            eos_ids = self._eos_ids

            def raw(params, kv, rope, tokens, positions, slots, page_table,
                    prefix_lens, mask, info, steps):
                out = model.spec_verify_tree_step(
                    params, kv, rope, tokens, positions, slots, page_table,
                    prefix_lens, mask, capture_hidden=want_hidden,
                )
                logits, kv = out[0], out[1]
                B_, QS_, V = logits.shape
                if all_greedy:
                    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                else:
                    info_rep = jax.tree.map(
                        lambda a: jnp.repeat(a, QS_, axis=0), info)
                    ids = sample(
                        logits.reshape(B_ * QS_, V), info_rep,
                        steps.reshape(-1), all_greedy=False,
                        eos_ids=eos_ids,
                    ).reshape(B_, QS_)
                if want_hidden:
                    return ids, out[2], kv
                return ids, kv

            self._fns[key] = jax.jit(
                self._wrap_step(raw, 8,
                                n_replicated_out=2 if want_hidden else 1),
                donate_argnums=(1,),
            )

        def pad2(a, fill=0):
            out = np.full((bs_pad, qs), fill, a.dtype)
            out[:bs] = a
            return out

        mask = np.asarray(tree_mask, bool)
        if mask.ndim == 2:
            mask = np.broadcast_to(mask, (bs, qs, qs))
        mask_p = np.zeros((bs_pad, qs, qs), bool)
        mask_p[:bs] = mask
        mask_p[bs:, :, 0] = True
        np.einsum("bii->bi", mask_p)[bs:] = True  # pads: self+root only
        if sampling is None:
            info = _sampling_info(SamplingBatch.from_rows([], pad_to=bs_pad))
            steps = np.zeros((bs_pad, qs), np.int32)
        else:
            info = _sampling_info(
                SamplingBatch.from_rows(sampling, pad_to=bs_pad))
            steps = pad2(np.asarray(sample_steps, np.int32))

        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(page_table.shape[1], pt_w)
        pt[:bs, :w] = page_table[:, :w]
        self.decode_steps_counter += 1
        outs = self._fns[key](
            self.params, self.kv_cache, self.rope_tab,
            jnp.asarray(pad2(tokens)), jnp.asarray(pad2(positions)),
            jnp.asarray(pad2(slots, PAD_SLOT)), jnp.asarray(pt),
            jnp.asarray(self._pad_i32(prefix_lens, bs_pad)),
            jnp.asarray(mask_p), info, jnp.asarray(steps),
        )
        if self.draft is not None:
            ids, self._verify_hidden, self.kv_cache = outs
        else:
            ids, self.kv_cache = outs
        return np.asarray(ids)

    def eagle_draft_tree(
        self,
        row_ids: np.ndarray,  # [B]
        t0: np.ndarray,  # [B] newest accepted token
        fill_len: np.ndarray,  # [B]
        page_table: np.ndarray,
        k: int,  # branches (top-k root candidates)
        depth: int,  # tokens per branch (root candidate + depth-1 greedy)
    ) -> np.ndarray:
        """EAGLE tree draft: top-k candidates at the first step, each
        continued greedily -> [B, k, depth] (reference eagle_worker.py:511
        topk tree draft).  Branch chains write the SAME provisional draft-KV
        slots (best-effort: a stale overwrite only lowers acceptance)."""
        bs = len(t0)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        fkey = ("eagle_tree", bs_pad, pt_w, k, depth)
        if fkey not in self._fns:
            draft = self.draft
            ps = self.page_size

            def head_logits(head, g):
                if "weight_q" in head:
                    return jnp.dot(
                        g.astype(jnp.bfloat16),
                        head["weight_q"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ) * head["scale"][None, :]
                return jnp.dot(
                    g.astype(jnp.bfloat16), head["weight"],
                    preferred_element_type=jnp.float32,
                )

            def raw(dp, dkv, drope, embed_w, head, hidden_row, rows, t0, P,
                    pt):
                ar = jnp.arange(bs_pad)

                def slot_at(j):
                    pos = jnp.maximum(P - 1 + j, 0)
                    live = P > 0
                    return pos, jnp.where(
                        live,
                        pt[ar, jnp.minimum(pos // ps, pt.shape[1] - 1)] * ps
                        + pos % ps,
                        PAD_SLOT,
                    ), jnp.where(live, pos + 1, 0)

                h0 = draft.start_hidden(dp, hidden_row[rows])
                pos, sl, lens = slot_at(0)
                g0, dkv = draft.decode_hidden(
                    dp, dkv, drope, embed_w, t0, h0, pos, sl, pt, lens)
                cand = draft.map_draft_ids(dp, jax.lax.top_k(
                    head_logits(head, draft.head_input(dp, g0)), k
                )[1].astype(jnp.int32))  # [B, k]
                branches = []
                for bk in range(k):
                    tok = cand[:, bk]
                    h = g0.astype(jnp.bfloat16)
                    chain = [tok]
                    for j in range(1, depth):
                        pos, sl, lens = slot_at(j)
                        g, dkv = draft.decode_hidden(
                            dp, dkv, drope, embed_w, tok, h, pos, sl, pt,
                            lens)
                        tok = draft.map_draft_ids(dp, jnp.argmax(
                            head_logits(head, draft.head_input(dp, g)),
                            axis=-1).astype(jnp.int32))
                        h = g.astype(jnp.bfloat16)
                        chain.append(tok)
                    branches.append(jnp.stack(chain, axis=1))  # [B, depth]
                return jnp.stack(branches, axis=1), dkv  # [B, k, depth]

            self._fns[fkey] = jax.jit(raw, donate_argnums=(1,))
        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(page_table.shape[1], pt_w)
        pt[:bs, :w] = page_table[:, :w]
        rows = self._pad_rows(row_ids, bs, bs_pad)
        drafts, self.draft_kv = self._fns[fkey](
            self.draft_params, self.draft_kv, self.draft_rope,
            self._draft_embed_w(), self._draft_head_p(),
            self.spec_hidden_row, rows,
            jnp.asarray(self._pad_i32(t0, bs_pad)),
            jnp.asarray(self._pad_i32(fill_len, bs_pad)),
            jnp.asarray(pt),
        )
        return np.asarray(drafts)[:bs]

    def eagle_draft_tree_scored(
        self,
        row_ids: np.ndarray,  # [B]
        t0: np.ndarray,  # [B] newest accepted token
        fill_len: np.ndarray,  # [B]
        page_table: np.ndarray,
        k: int,  # candidates per expansion AND frontier width
        levels: int,  # draft-token depth (spec_width - 1)
        num_nodes: int,  # total tree nodes incl. the root
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Score-driven EAGLE tree draft -> (tokens [B, N], parents [B, N],
        depths [B, N]); parents index into the returned node list (0 =
        root), sorted by descending cumulative draft logprob.

        Reference role: `eagle_utils.py:47 build_tree_kernel_efficient` +
        `eagle_worker.py:566` — topology chosen from draft scores per
        request per step.  TPU form: all shapes static (k, levels, N bake
        into the jit); the topology is DATA.  Each level draft-forwards the
        k-node frontier in ONE folded call (`draft.tree_hidden`) — the
        static-tree path runs k separate chains — and expansion K/V stays
        in-hand rather than best-effort-overwriting the draft pool.
        Selection: global top-(N-1) by cumulative logprob; a child's
        cumulative score is strictly below its parent's (tie broken by a
        per-level epsilon), so every selected node's parent is selected.
        """
        bs = len(t0)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        F = k
        N = num_nodes
        C = k + max(levels - 1, 0) * F * k
        M = max(levels - 1, 0) * F
        assert N - 1 <= C, (N, C)
        fkey = ("eagle_tree_scored", bs_pad, pt_w, k, levels, N)
        if fkey not in self._fns:
            draft = self.draft
            ps = self.page_size
            L = draft.config.num_layers
            kvhD = draft.kvh * draft.head_dim
            # static per-slot depth of every candidate
            cdepth_np = np.zeros(C, np.int32)
            cdepth_np[:k] = 1
            for lv in range(2, levels + 1):
                b0 = k + (lv - 2) * F * k
                cdepth_np[b0 : b0 + F * k] = lv
            cdepth_c = jnp.asarray(cdepth_np)

            def head_logits(head, g):
                if "weight_q" in head:
                    return jnp.dot(
                        g.astype(jnp.bfloat16),
                        head["weight_q"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32,
                    ) * head["scale"][None, :]
                return jnp.dot(
                    g.astype(jnp.bfloat16), head["weight"],
                    preferred_element_type=jnp.float32,
                )

            def raw(dp, dkv, drope, embed_w, head, hidden_row, rows, t0, P,
                    pt):
                ar = jnp.arange(bs_pad)
                pos0 = jnp.maximum(P - 1, 0)
                live = P > 0
                sl0 = jnp.where(
                    live,
                    pt[ar, jnp.minimum(pos0 // ps, pt.shape[1] - 1)] * ps
                    + pos0 % ps,
                    PAD_SLOT,
                )
                lens0 = jnp.where(live, pos0 + 1, 0)
                h0 = draft.start_hidden(dp, hidden_row[rows])
                g0, dkv = draft.decode_hidden(
                    dp, dkv, drope, embed_w, t0, h0, pos0, sl0, pt, lens0)
                lp0 = jax.nn.log_softmax(
                    head_logits(head, draft.head_input(dp, g0)), axis=-1)
                sc0, tk0 = jax.lax.top_k(lp0, k)  # [B, k]
                tk0 = draft.map_draft_ids(dp, tk0.astype(jnp.int32))

                ctok = jnp.zeros((bs_pad, C), jnp.int32)
                cscore = jnp.full((bs_pad, C), -jnp.inf, jnp.float32)
                cparent = jnp.full((bs_pad, C), -1, jnp.int32)
                ctok = ctok.at[:, :k].set(tk0)
                cscore = cscore.at[:, :k].set(sc0 - 1e-6)
                # frontier = level-1 top-F candidates
                fcum, fidx = jax.lax.top_k(cscore[:, :k], F)
                ftok = jnp.take_along_axis(ctok, fidx, 1)
                fhid = jnp.broadcast_to(
                    g0[:, None].astype(jnp.bfloat16),
                    (bs_pad, F, g0.shape[-1]),
                ).astype(jnp.bfloat16)
                fcand = fidx
                fanc = jnp.zeros((bs_pad, F, max(M, 1)), bool)
                nodes_k = jnp.zeros((L, bs_pad, max(M, 1), kvhD),
                                    jnp.bfloat16)
                nodes_v = jnp.zeros_like(nodes_k)

                for lv in range(2, levels + 1):
                    posl = pos0 + (lv - 1)
                    g, ks, vs = draft.tree_hidden(
                        dp, dkv, drope, embed_w, ftok, fhid, posl, pt,
                        lens0, nodes_k[:, :, :M], nodes_v[:, :, :M],
                        fanc[:, :, :M],
                    )
                    s_lo = (lv - 2) * F
                    nodes_k = nodes_k.at[:, :, s_lo : s_lo + F].set(ks)
                    nodes_v = nodes_v.at[:, :, s_lo : s_lo + F].set(vs)
                    lpj = jax.nn.log_softmax(
                        head_logits(head, draft.head_input(
                            dp, g.reshape(bs_pad * F, -1))),
                        axis=-1)
                    scj, tkj = jax.lax.top_k(lpj, k)  # [B*F, k]
                    tkj = draft.map_draft_ids(dp, tkj.astype(jnp.int32))
                    scj = (scj.reshape(bs_pad, F, k)
                           + fcum[:, :, None] - 1e-6)
                    b0 = k + (lv - 2) * F * k
                    ctok = ctok.at[:, b0 : b0 + F * k].set(
                        tkj.reshape(bs_pad, F * k))
                    cscore = cscore.at[:, b0 : b0 + F * k].set(
                        scj.reshape(bs_pad, F * k))
                    cparent = cparent.at[:, b0 : b0 + F * k].set(
                        jnp.repeat(fcand, k, axis=1))
                    if lv < levels:
                        fcum, rel = jax.lax.top_k(
                            scj.reshape(bs_pad, F * k), F)
                        fcand = b0 + rel
                        ftok = jnp.take_along_axis(ctok, fcand, 1)
                        pf = rel // k  # frontier index of the parent
                        fhid = jnp.take_along_axis(
                            g.astype(jnp.bfloat16),
                            pf[:, :, None], 1)
                        fanc = jnp.take_along_axis(
                            fanc, pf[:, :, None], 1)
                        slot_of_pf = s_lo + pf  # [B, F]
                        fanc = jnp.logical_or(
                            fanc,
                            jax.nn.one_hot(
                                slot_of_pf, max(M, 1), dtype=bool
                            ),
                        )

                # global top-(N-1) selection
                selsc, sel = jax.lax.top_k(cscore, N - 1)  # [B, N-1]
                onehot = sel[:, :, None] == jnp.arange(C)[None, None, :]
                pos1 = jnp.sum(
                    onehot * (jnp.arange(N - 1) + 1)[None, :, None],
                    axis=1).astype(jnp.int32)  # [B, C]
                par_c = jnp.take_along_axis(cparent, sel, 1)  # [B, N-1]
                parents = jnp.where(
                    par_c < 0, 0,
                    jnp.take_along_axis(
                        pos1, jnp.clip(par_c, 0, C - 1), 1),
                )
                # node 0 (the root) carries a self-parent placeholder so
                # parents[:, n] lines up with the node index n
                parents = jnp.concatenate(
                    [jnp.zeros((bs_pad, 1), jnp.int32), parents], 1)
                tokens = jnp.concatenate(
                    [t0[:, None], jnp.take_along_axis(ctok, sel, 1)], 1)
                depths = jnp.concatenate(
                    [jnp.zeros((bs_pad, 1), jnp.int32), cdepth_c[sel]], 1)
                return tokens, parents, depths, dkv

            self._fns[fkey] = jax.jit(raw, donate_argnums=(1,))
        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(page_table.shape[1], pt_w)
        pt[:bs, :w] = page_table[:, :w]
        rows = self._pad_rows(row_ids, bs, bs_pad)
        tokens, parents, depths, self.draft_kv = self._fns[fkey](
            self.draft_params, self.draft_kv, self.draft_rope,
            self._draft_embed_w(), self._draft_head_p(),
            self.spec_hidden_row, rows,
            jnp.asarray(self._pad_i32(t0, bs_pad)),
            jnp.asarray(self._pad_i32(fill_len, bs_pad)),
            jnp.asarray(pt),
        )
        return (np.asarray(tokens)[:bs], np.asarray(parents)[:bs],
                np.asarray(depths)[:bs])

    def kv_relocate(self, src_slots: np.ndarray, dst_slots: np.ndarray):
        """Move token KV rows src -> dst (all layers); PAD_SLOT dst rows
        drop.  Used to land an accepted tree path on the canonical
        position-contiguous slots."""
        M = src_slots.size
        key = ("kv_relocate", M, self.kv_spec.layout)
        if key not in self._fns:
            ps = self.page_size
            split = self.kv_spec.layout in ("split", "wide")

            def raw(kv, src, dst):
                sp, sr = src // ps, src % ps
                dp_, dr = jnp.minimum(dst // ps, kv.shape[1] - 1), dst % ps
                drop = dst >= (1 << 29)
                if split:  # [L, P, 2, ps, fcK, XrK] or wide [L, P, 2, ps, Xr]
                    g = kv[:, sp, :, sr]  # [M, L, 2, (fcK,) XrK]
                    dp_ = jnp.where(drop, 0, dp_)
                    cur = kv[:, dp_, :, dr]
                    g = jnp.where(
                        drop.reshape((-1,) + (1,) * (g.ndim - 1)), cur, g)
                    kv = kv.at[:, dp_, :, dr].set(g)
                else:  # [L, P, ps, fc, Xr]
                    # adjacent advanced indices (axes 1, 2) keep their
                    # position: g is [L, M, fc, Xr]
                    g = kv[:, sp, sr]
                    dp_ = jnp.where(drop, 0, dp_)
                    cur = kv[:, dp_, dr]
                    g = jnp.where(drop[None, :, None, None], cur, g)
                    kv = kv.at[:, dp_, dr].set(g)
                return kv

            self._fns[key] = jax.jit(raw, donate_argnums=(0,))
        self.kv_cache = self._fns[key](
            self.kv_cache,
            jnp.asarray(np.minimum(src_slots.reshape(-1), (1 << 29)),
                        jnp.int32),
            jnp.asarray(dst_slots.reshape(-1).astype(np.int32)),
        )

    def eagle_tree_fixup(
        self,
        path_nodes: np.ndarray,  # [B, Dp] accepted node indices (pad 0)
        path_ids: np.ndarray,  # [B, Dp] path tokens (root + accepted)
        accept: np.ndarray,  # [B] accepted count (>= 1)
        row_ids: np.ndarray,
        fill_len_old: np.ndarray,
        page_table: np.ndarray,
    ):
        """Tree analogue of eagle_commit_fixup: gather the accepted PATH's
        hiddens by node index, then run the chain fixup over the path."""
        if self._verify_hidden is None:
            return
        bs, dp = path_ids.shape
        bs_pad = self._verify_hidden.shape[0]
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        key = ("eagle_tree_fixup", bs_pad, dp, pt_w)
        if key not in self._fns:
            draft = self.draft
            ps = self.page_size

            def raw(dp_, dkv, drope, embed_w, hidden_row, hidden_full, nodes,
                    rows, ids, acc, P0, pt):
                ar = jnp.arange(bs_pad)
                hidden_path = jnp.take_along_axis(
                    hidden_full, nodes[:, :, None], axis=1
                )  # [B, Dp, H]
                hsel = hidden_path[ar, jnp.maximum(acc - 1, 0)]
                hidden_row = hidden_row.at[rows].set(
                    hsel.astype(hidden_row.dtype), mode="drop")
                live = P0 > 0
                positions = P0[:, None] + jnp.arange(dp)[None, :]
                slots = jnp.where(
                    live[:, None],
                    pt[ar[:, None],
                       jnp.minimum(positions // ps, pt.shape[1] - 1)] * ps
                    + positions % ps,
                    PAD_SLOT,
                )
                lens = jnp.where(live, P0 + dp, 0)
                dkv = draft.spec_hidden(
                    dp_, dkv, drope, embed_w, ids, hidden_path, positions,
                    slots, pt, lens,
                )
                return dkv, hidden_row

            self._fns[key] = jax.jit(raw, donate_argnums=(1, 4))
        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(page_table.shape[1], pt_w)
        pt[:bs, :w] = page_table[:, :w]
        ids_p = np.zeros((bs_pad, dp), np.int32)
        ids_p[:bs] = path_ids
        nodes_p = np.zeros((bs_pad, dp), np.int32)
        nodes_p[:bs] = path_nodes
        rows = self._pad_rows(row_ids, bs, bs_pad)
        self.draft_kv, self.spec_hidden_row = self._fns[key](
            self.draft_params, self.draft_kv, self.draft_rope,
            self._draft_embed_w(), self.spec_hidden_row,
            self._verify_hidden, jnp.asarray(nodes_p), rows,
            jnp.asarray(ids_p),
            jnp.asarray(self._pad_i32(accept, bs_pad)),
            jnp.asarray(self._pad_i32(fill_len_old, bs_pad)),
            jnp.asarray(pt),
        )
        self._verify_hidden = None

    def eagle_commit_fixup(
        self,
        ids: np.ndarray,  # [B, QS] verify outputs (greedy)
        accept: np.ndarray,  # [B] accepted count (>= 1)
        row_ids: np.ndarray,  # [B]
        fill_len_old: np.ndarray,  # [B] fill_len at verify dispatch
        page_table: np.ndarray,
    ):
        """Post-verify: (a) commit the last accepted token's target hidden
        to the per-row buffer (next chain's start feature), (b) re-run the
        draft over the verify window with TRUE hiddens to repair the chain's
        provisional draft KV.  Rejected positions write garbage that later
        rounds overwrite (length-masked meanwhile)."""
        if self._verify_hidden is None:
            return
        bs, qs = ids.shape
        bs_pad = self._verify_hidden.shape[0]
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        key = ("eagle_fixup", bs_pad, qs, pt_w)
        if key not in self._fns:
            draft = self.draft
            ps = self.page_size

            def raw(dp, dkv, drope, embed_w, hidden_row, hidden_full, rows,
                    ids, acc, P0, pt):
                ar = jnp.arange(bs_pad)
                hsel = hidden_full[ar, jnp.maximum(acc - 1, 0)]  # [B, H]
                hidden_row = hidden_row.at[rows].set(
                    hsel.astype(hidden_row.dtype), mode="drop"
                )
                live = P0 > 0
                positions = P0[:, None] + jnp.arange(qs)[None, :]
                slots = jnp.where(
                    live[:, None],
                    pt[ar[:, None],
                       jnp.minimum(positions // ps, pt.shape[1] - 1)] * ps
                    + positions % ps,
                    PAD_SLOT,
                )
                lens = jnp.where(live, P0 + qs, 0)
                dkv = draft.spec_hidden(
                    dp, dkv, drope, embed_w, ids, hidden_full, positions,
                    slots, pt, lens,
                )
                return dkv, hidden_row

            self._fns[key] = jax.jit(raw, donate_argnums=(1, 4))
        pt = np.zeros((bs_pad, pt_w), np.int32)
        w = min(page_table.shape[1], pt_w)
        pt[:bs, :w] = page_table[:, :w]
        ids_p = np.zeros((bs_pad, qs), np.int32)
        ids_p[:bs] = ids
        rows = self._pad_rows(row_ids, bs, bs_pad)
        self.draft_kv, self.spec_hidden_row = self._fns[key](
            self.draft_params, self.draft_kv, self.draft_rope,
            self._draft_embed_w(), self.spec_hidden_row,
            self._verify_hidden, rows,
            jnp.asarray(ids_p),
            jnp.asarray(self._pad_i32(accept, bs_pad)),
            jnp.asarray(self._pad_i32(fill_len_old, bs_pad)),
            jnp.asarray(pt),
        )
        self._verify_hidden = None

    # ------------------------------------------------------------------
    # weight updates (reference model_runner.py:969-1344 family)
    # ------------------------------------------------------------------

    def save_snapshot(self, path: str, shard_bytes: int = 4 << 30) -> Tuple[bool, str]:
        """Sharded native checkpoint: the converted layer-stacked pytree as
        safetensors shards + a manifest (reference sharded-save role,
        ModelRunner.save_sharded_model).  Reload with load_snapshot — no
        AWQ re-conversion, no merge pass, so RL checkpoint/restore loops
        skip the load-time transform entirely."""
        try:
            from safetensors.numpy import save_file

            os.makedirs(path, exist_ok=True)
            flat = jax.tree_util.tree_flatten_with_path(self.params)[0]
            shard: Dict[str, np.ndarray] = {}
            shards = []
            size = 0

            def flush():
                nonlocal shard, size
                if shard:
                    fn = f"snapshot-{len(shards):05d}.safetensors"
                    save_file(shard, os.path.join(path, fn))
                    shards.append(fn)
                    shard, size = {}, 0

            names = []
            for kp, leaf in flat:
                name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                                for k in kp)
                arr = np.asarray(jax.device_get(leaf))
                if arr.dtype == jnp.bfloat16:
                    arr = arr.view(np.uint16)  # safetensors-numpy: no bf16
                    name += "::bf16"
                names.append(name)
                shard[name] = arr
                size += arr.nbytes
                if size >= shard_bytes:
                    flush()
            flush()
            import json as _json

            with open(os.path.join(path, "manifest.json"), "w") as f:
                _json.dump(
                    {"format": "sglt_native_snapshot", "shards": shards,
                     "tensors": names}, f,
                )
            return True, f"saved {len(names)} tensors in {len(shards)} shards"
        except Exception as e:  # noqa: BLE001
            logger.exception("save_snapshot failed")
            return False, str(e)

    def load_snapshot(self, path: str) -> Tuple[bool, str]:
        """Reload a native snapshot (shapes/dtypes must match)."""
        try:
            import json as _json

            from safetensors import safe_open

            with open(os.path.join(path, "manifest.json")) as f:
                manifest = _json.load(f)
            loaded: Dict[str, np.ndarray] = {}
            for fn in manifest["shards"]:
                with safe_open(os.path.join(path, fn), framework="np") as sf:
                    for name in sf.keys():
                        loaded[name] = sf.get_tensor(name)
            flat, treedef = jax.tree_util.tree_flatten_with_path(self.params)
            new_leaves = []
            for kp, leaf in flat:
                name = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                                for k in kp)
                arr = loaded.get(name + "::bf16")
                if arr is not None:
                    arr = jnp.asarray(arr.view(np.uint16)).view(jnp.bfloat16)
                else:
                    arr = loaded[name]
                if tuple(arr.shape) != tuple(leaf.shape):
                    return False, f"shape mismatch for {name}"
                new_leaves.append(jnp.asarray(arr, leaf.dtype))
            self.params = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(self.params), new_leaves
            )
            if self.mesh is not None:
                self._shard_state()
            return True, f"loaded {len(new_leaves)} tensors"
        except Exception as e:  # noqa: BLE001
            logger.exception("load_snapshot failed")
            return False, str(e)

    # ------------------------------------------------------------------
    # EPLB: expert distribution recording + relocation (eplb/;
    # reference srt/eplb/ + http_server expert-distribution endpoints)
    # ------------------------------------------------------------------

    def start_expert_distribution_record(self) -> None:
        """Attach the host-side recorder and retrace step fns with the
        in-jit io_callback (jit cache cleared; next steps recompile)."""
        model = self.model
        if not hasattr(model, "num_experts"):
            raise ValueError("expert distribution: not a MoE model")
        assert self.tp_size == 1, (
            "expert distribution recording: tp=1 (io_callback under pjit "
            "is the multi-chip upgrade)"
        )
        if getattr(self, "expert_recorder", None) is None:
            from sglang_awq_tpu.eplb.expert_distribution import (
                ExpertDistributionRecorder,
            )

            self.expert_recorder = ExpertDistributionRecorder(
                self.model_config.num_layers, model.num_experts
            )
        if model.expert_dist_sink is None:
            model.expert_dist_sink = self.expert_recorder
            self._fns.clear()

    def stop_expert_distribution_record(self) -> None:
        model = self.model
        if getattr(model, "expert_dist_sink", None) is not None:
            model.expert_dist_sink = None
            self._fns.clear()

    def dump_expert_distribution(self) -> Dict[str, Any]:
        rec = getattr(self, "expert_recorder", None)
        if rec is None:
            return {"recording": False, "counts": None}
        counts = rec.snapshot()
        return {
            "recording": self.model.expert_dist_sink is not None,
            "num_layers": int(counts.shape[0]),
            "num_experts": int(counts.shape[1]),
            "counts": counts.tolist(),
        }

    def rebalance_experts(self):
        """Apply an EPLB relocation from the recorded distribution.
        Returns the permutation (shard s owns perm[s*El:(s+1)*El])."""
        from sglang_awq_tpu.eplb.expert_distribution import rebalance_order

        rec = getattr(self, "expert_recorder", None)
        if rec is None:
            raise ValueError("no expert distribution recorded")
        perm = rebalance_order(rec.snapshot().sum(axis=0), self.tp_size)
        self.params["layers"] = self.model.permute_experts(
            self.params["layers"], perm
        )
        if self.mesh is not None:
            self._shard_state()
        rec.reset()
        return perm

    def update_weights_from_disk(self, model_path: str) -> Tuple[bool, str]:
        """In-place reload from a checkpoint dir (reference
        update_weights_from_disk — RL rollout refresh / model hot-swap).
        The architecture and shapes must match the loaded model.  Native
        snapshots (save_snapshot manifests) short-circuit the HF-schema
        conversion."""
        if os.path.exists(os.path.join(model_path, "manifest.json")):
            return self.load_snapshot(model_path)
        try:
            from sglang_awq_tpu.model_loader.loader import (
                iterate_safetensors,
                load_params_from_tensors,
            )

            tensors = dict(iterate_safetensors(model_path))
            new_params = load_params_from_tensors(self.model, tensors)
            old_shapes = jax.tree.map(lambda x: (x.shape, x.dtype), self.params)
            new_shapes = jax.tree.map(lambda x: (x.shape, x.dtype), new_params)
            if old_shapes != new_shapes:
                return False, "checkpoint shapes/dtypes do not match loaded model"
            if self.mesh is not None:
                from jax.sharding import NamedSharding

                new_params = jax.tree.map(
                    lambda x, sp: jax.device_put(x, NamedSharding(self.mesh, sp)),
                    new_params,
                    self._param_specs,
                )
            else:
                new_params = jax.device_put(new_params)
            self.params = new_params
            self._fns.clear()  # step closures bind nothing, but drop cache anyway
            self.model_config.model_path = model_path
            return True, "ok"
        except Exception as e:  # noqa: BLE001
            logger.exception("weight update failed")
            return False, str(e)

    def update_weights_from_tensors(self, tensors) -> Tuple[bool, str]:
        """Update from an in-memory named-tensor dict (reference
        update_weights_from_tensor IPC path)."""
        try:
            from sglang_awq_tpu.model_loader.loader import load_params_from_tensors

            new_params = load_params_from_tensors(self.model, tensors)
            self.params = jax.device_put(new_params)
            return True, "ok"
        except Exception as e:  # noqa: BLE001
            logger.exception("weight update failed")
            return False, str(e)

    # --- memory info for the scheduler ---

    @property
    def num_pages(self) -> int:
        return self.kv_spec.num_pages

    def flush_cache(self):
        """Zero + reallocate the KV pool (reference /flush_cache).

        The old pool's device buffers are DELETED before the replacement
        allocates — assigning `self.kv_cache = self._alloc_kv()` directly
        keeps both pools live across the allocation and ResourceExhausts
        at serving sizes (observed: 7.55 GiB pool + weights on a 16 GiB
        chip)."""
        old, self.kv_cache = self.kv_cache, None
        for leaf in jax.tree.leaves(old):
            if hasattr(leaf, "delete"):
                leaf.delete()
        self.kv_cache = self._alloc_kv()
