"""Model runner: owns device state and the bucketed-jit step functions.

Role model: reference `ModelRunner`
(`python/sglang/srt/model_executor/model_runner.py:271` — distributed init,
model load, KV pool sizing `profile_max_num_token:1411`/`init_memory_pool:1682`,
graph capture `init_device_graphs:2498`, forward dispatch `forward:2721`).

TPU re-design (SURVEY.md §7 decisions 2-4):
* CUDA graphs -> BUCKETED JIT: one compiled executable per
  (mode, padded size) key; decode buckets on batch size, prefill buckets on
  chunk tokens (reference bucket table role, §A.5).
* Each step fuses model forward + sampling into ONE dispatch (host-device
  round trips are the enemy; sampled ids return as a small array).
* `decode_multi` runs N decode steps inside one jit via `lax.scan`, feeding
  sampled tokens straight back into the next step on device — the TPU
  analogue of the reference's overlap scheduling + multi-step decode
  (`--num-continuous-decode-steps`), with KV paging advanced in-jit over a
  pre-allocated page table.
* KV caches are donated through every step (functional in-place update).
"""

from __future__ import annotations

import logging
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.layers.sampler import (
    SamplingInfo,
    apply_penalties,
    logprob_outputs,
    sample,
)
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT
from sglang_awq_tpu.model_executor.forward_batch import (
    DecodeInput,
    ExtendInput,
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

HBM_BYTES_DEFAULT = 16 * 1024**3  # v5e
RESERVE_BYTES = 1536 * 1024**2  # workspace + fragmentation headroom


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
    )


class ModelRunner:
    def __init__(
        self,
        server_args: ServerArgs,
        model_config: Optional[ModelConfig] = None,
        tensors: Optional[Dict[str, np.ndarray]] = None,
    ):
        self.server_args = server_args
        if model_config is None:
            model_config = ModelConfig.from_model_path(
                server_args.model_path,
                context_length=server_args.context_length,
                quantization=server_args.quantization,
            )
        self.model_config = model_config
        self.tp_size = server_args.tp_size
        self.mesh = None
        if self.tp_size > 1:
            from sglang_awq_tpu.parallel.mesh import MODEL_AXIS, make_mesh

            self.mesh = make_mesh(dp_size=1, tp_size=self.tp_size)
            tp_axis = MODEL_AXIS
        else:
            tp_axis = None
        self.model, self.params = load_model(
            model_config,
            tp_size=server_args.tp_size,
            tp_axis=tp_axis,
            tensors=tensors,
            random_weights=server_args.random_weights,
        )
        if self.mesh is not None:
            self._shard_state()
        self.rope_tab = jax.device_put(self.model.rope())
        self.page_size = server_args.page_size

        self._init_memory_pool()

        self.decode_bs_buckets = server_args.decode_bs_buckets or default_decode_bs_buckets(
            server_args.max_running_requests
        )
        self.prefill_token_buckets = (
            server_args.prefill_token_buckets
            or default_prefill_token_buckets(server_args.chunked_prefill_size)
        )
        # prefill KV-length buckets in PAGES (gathered KV is page-granular)
        self.prefill_page_buckets = sorted(
            {
                cdiv(t, self.page_size)
                for t in default_prefill_token_buckets(model_config.context_length)
            }
        )
        self._fns: Dict[Any, Any] = {}
        self.decode_steps_counter = 0
        # page-table width buckets: the decode attention grid iterates
        # pmax/ppc chunks per (seq, head) — sizing to the live batch's max
        # pages (not the context limit) kills dead grid steps
        self.pmax_buckets = []
        w = 8
        while w < self.pmax:
            self.pmax_buckets.append(w)
            w *= 2
        self.pmax_buckets.append(self.pmax)

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

    def _wrap_step(self, fn, n_replicated_in: int, n_replicated_out: int = 2):
        """shard_map a step function: params/KV sharded, batch inputs and
        outputs replicated (every shard computes identical logits/ids)."""
        from jax.sharding import PartitionSpec as P

        from sglang_awq_tpu.parallel.sharding import kv_pspec

        if self.mesh is None:
            return fn
        kvp = kv_pspec()
        in_specs = (
            self._param_specs,
            kvp,
            kvp,
            P(),  # rope
        ) + (P(),) * n_replicated_in
        out_specs = (P(),) * n_replicated_out + (kvp, kvp)
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
        # per-DEVICE bytes/token governs the budget; the page dim is global
        probe = KVPoolSpec(mc.num_layers, kv_heads_local, 1, self.page_size, mc.head_dim)
        if sa.max_total_tokens is not None:
            tokens = sa.max_total_tokens
        else:
            hbm = self._device_hbm_bytes()
            weight_bytes = (
                sum(x.nbytes for x in jax.tree.leaves(self.params)) // max(sa.tp_size, 1)
            )
            budget = int((hbm - weight_bytes - RESERVE_BYTES) * sa.mem_fraction_static)
            if budget <= 0:
                raise RuntimeError(
                    f"no HBM left for KV cache (weights {weight_bytes>>20} MiB/device)"
                )
            tokens = budget // probe.bytes_per_token()
        num_pages = max(tokens // self.page_size, 8)
        self.kv_spec = KVPoolSpec(
            mc.num_layers,
            kv_heads_local * sa.tp_size if sa.tp_size > 1 else kv_heads_local,
            num_pages,
            self.page_size,
            mc.head_dim,
            dtype="bfloat16" if sa.kv_cache_dtype in ("auto", "bfloat16") else sa.kv_cache_dtype,
        )
        self.max_total_tokens = num_pages * self.page_size
        self.pmax = cdiv(mc.context_length, self.page_size)
        self.k_cache, self.v_cache = self._alloc_kv()
        logger.info(
            "KV pool: %d pages x %d tokens (%.2f GiB global)",
            num_pages,
            self.page_size,
            2 * self.k_cache.nbytes / 1024**3,
        )

    def _alloc_kv(self):
        if self.mesh is None:
            return self.kv_spec.alloc()
        from jax.sharding import NamedSharding

        from sglang_awq_tpu.parallel.sharding import kv_pspec

        sh = NamedSharding(self.mesh, kv_pspec())
        shape, dt = self.kv_spec.shape, self.kv_spec.jdtype
        alloc = jax.jit(
            lambda: (jnp.zeros(shape, dt), jnp.zeros(shape, dt)),
            out_shardings=(sh, sh),
        )
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

    def _extend_fn(self, t_pad: int, n_pages: int, all_greedy: bool, want_lp: bool, want_mask: bool = False):
        key = ("extend", t_pad, n_pages, all_greedy, want_lp, want_mask)
        if key in self._fns:
            return self._fns[key]
        model = self.model

        def raw(params, kc, vc, rope, tokens, positions, slots, pages, prefix_len, q_len, info, step, *mask):
            logits, kc, vc = model.extend_step(
                params, kc, vc, rope, tokens, positions, slots, pages, prefix_len, q_len
            )
            vm = mask[0] if want_mask else None
            ids = sample(logits, info, step, all_greedy=all_greedy, vocab_mask=vm)
            if want_lp:
                lp, top_ids, top_vals = logprob_outputs(logits, ids)
                return ids, lp, top_ids, top_vals, kc, vc
            return ids, kc, vc

        fn = jax.jit(
            self._wrap_step(raw, 8 + (1 if want_mask else 0),
                            n_replicated_out=4 if want_lp else 1),
            donate_argnums=(1, 2),
        )
        self._fns[key] = fn
        return fn

    def _decode_fn(
        self, bs: int, pt_w: int, all_greedy: bool, want_lp: bool,
        want_mask: bool = False, want_pen: bool = False,
    ):
        key = ("decode", bs, pt_w, all_greedy, want_lp, want_mask, want_pen)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        vocab = self.model_config.vocab_size

        def raw(params, kc, vc, rope, tokens, positions, slots, page_table, lengths, info, steps, *extra):
            logits, kc, vc = model.decode_step(
                params, kc, vc, rope, tokens, positions, slots, page_table, lengths
            )
            extra = list(extra)
            if want_pen:
                counts = extra.pop(0)
                logits = apply_penalties(logits, counts, info, vocab)
            vm = extra.pop(0) if want_mask else None
            ids = sample(logits, info, steps, all_greedy=all_greedy, vocab_mask=vm)
            if want_lp:
                lp, top_ids, top_vals = logprob_outputs(logits, ids)
                return ids, lp, top_ids, top_vals, kc, vc
            return ids, kc, vc

        fn = jax.jit(
            self._wrap_step(
                raw,
                7 + (1 if want_mask else 0) + (1 if want_pen else 0),
                n_replicated_out=4 if want_lp else 1,
            ),
            donate_argnums=(1, 2),
        )
        self._fns[key] = fn
        return fn

    def _decode_multi_fn(self, bs: int, pt_w: int, n_steps: int, all_greedy: bool):
        key = ("decode_multi", bs, pt_w, n_steps, all_greedy)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        ps = self.page_size

        def raw(params, kc, vc, rope, tokens0, lengths0, page_table, info, steps0):
            def body(carry, s):
                kc, vc, toks, lens = carry
                live = lens > 0
                pos = jnp.maximum(lens - 1, 0)
                page = page_table[jnp.arange(bs), pos // ps]
                slots = jnp.where(live, page * ps + pos % ps, PAD_SLOT)
                logits, kc, vc = model.decode_step(
                    params, kc, vc, rope, toks, pos, slots, page_table, lens
                )
                ids = sample(logits, info, steps0 + s, all_greedy=all_greedy)
                lens = jnp.where(live, lens + 1, lens)
                return (kc, vc, ids, lens), ids

            (kc, vc, _, _), all_ids = jax.lax.scan(
                body, (kc, vc, tokens0, lengths0), jnp.arange(n_steps)
            )
            return all_ids, kc, vc

        fn = jax.jit(self._wrap_step(raw, 5, n_replicated_out=1), donate_argnums=(1, 2))
        self._fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    # public forward API (numpy in, numpy out)
    # ------------------------------------------------------------------

    def forward_extend(
        self,
        ext: ExtendInput,
        want_logprobs: bool = False,
        vocab_mask: Optional[np.ndarray] = None,
    ) -> Tuple[int, Optional[dict]]:
        """Run one chunk; returns (sampled next-token id, logprob dict|None).

        The sampled id is only meaningful when this is the request's LAST
        chunk (prefix_len + T == full prompt length).
        """
        T = len(ext.tokens)
        t_pad = pick_bucket(T, self.prefill_token_buckets)
        total_pages = len(ext.pages)
        pg_pad = pick_bucket(max(total_pages, 1), self.prefill_page_buckets)
        row = ext.sampling
        all_greedy = row is None or row.temperature < 1e-5
        fn = self._extend_fn(
            t_pad, pg_pad, all_greedy, want_logprobs, vocab_mask is not None
        )

        tokens = np.zeros(t_pad, np.int32)
        tokens[:T] = ext.tokens
        positions = np.zeros(t_pad, np.int32)
        positions[:T] = ext.positions
        slots = np.full(t_pad, PAD_SLOT, np.int32)
        slots[:T] = ext.slots
        pages = np.zeros(pg_pad, np.int32)
        pages[:total_pages] = ext.pages

        sb = SamplingBatch.from_rows([row] if row else [], pad_to=1)
        info = _sampling_info(sb)
        args = (
            self.params,
            self.k_cache,
            self.v_cache,
            self.rope_tab,
            jnp.asarray(tokens),
            jnp.asarray(positions),
            jnp.asarray(slots),
            jnp.asarray(pages),
            jnp.int32(ext.prefix_len),
            jnp.int32(T),
            info,
            jnp.int32(0),
        )
        if vocab_mask is not None:
            args = args + (jnp.asarray(vocab_mask.reshape(1, -1)),)
        if want_logprobs:
            ids, lp, top_ids, top_vals, self.k_cache, self.v_cache = fn(*args)
            return int(np.asarray(ids)[0]), {
                "logprobs": np.asarray(lp),
                "top_ids": np.asarray(top_ids),
                "top_logprobs": np.asarray(top_vals),
            }
        ids, self.k_cache, self.v_cache = fn(*args)
        return int(np.asarray(ids)[0]), None

    def forward_decode(
        self,
        d: DecodeInput,
        want_logprobs: bool = False,
        vocab_mask: Optional[np.ndarray] = None,
        output_counts: Optional[np.ndarray] = None,  # [B, V] i32 (penalties)
    ) -> Tuple[np.ndarray, Optional[dict]]:
        """One decode step over a padded batch -> (ids [bs_pad], logprobs)."""
        bs = len(d.tokens)
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(d.page_table.shape[1], self.pmax_buckets)
        fn = self._decode_fn(
            bs_pad, pt_w, d.all_greedy(), want_logprobs,
            vocab_mask is not None, output_counts is not None,
        )
        arrays = self._pad_decode(d, bs_pad, pt_w)
        info = _sampling_info(d.sampling_padded(bs_pad))
        steps = np.zeros(bs_pad, np.int32)
        if d.sample_steps is not None:
            steps[:bs] = d.sample_steps
        self.decode_steps_counter += 1
        args = (
            self.params, self.k_cache, self.v_cache, self.rope_tab,
            *arrays, info, jnp.asarray(steps),
        )
        if output_counts is not None:
            oc = np.zeros((bs_pad, output_counts.shape[1]), np.int32)
            oc[:bs] = output_counts
            args = args + (jnp.asarray(oc),)
        if vocab_mask is not None:
            vm = np.ones((bs_pad, vocab_mask.shape[1]), bool)
            vm[:bs] = vocab_mask
            args = args + (jnp.asarray(vm),)
        if want_logprobs:
            ids, lp, top_ids, top_vals, self.k_cache, self.v_cache = fn(*args)
            return np.asarray(ids), {
                "logprobs": np.asarray(lp),
                "top_ids": np.asarray(top_ids),
                "top_logprobs": np.asarray(top_vals),
            }
        ids, self.k_cache, self.v_cache = fn(*args)
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
        all_ids, self.k_cache, self.v_cache = fn(
            self.params, self.k_cache, self.v_cache, self.rope_tab,
            tokens, lengths, page_table, info, jnp.asarray(steps0),
        )
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

    def _embed_fn(self, t_pad: int, n_pages: int):
        key = ("embed", t_pad, n_pages)
        if key in self._fns:
            return self._fns[key]
        model = self.model

        def raw(params, kc, vc, rope, tokens, positions, slots, pages, prefix_len, q_len):
            hidden, kc, vc = model.extend_step(
                params, kc, vc, rope, tokens, positions, slots, pages,
                prefix_len, q_len, return_hidden=True,
            )
            return hidden, kc, vc

        fn = jax.jit(self._wrap_step(raw, 6, n_replicated_out=1), donate_argnums=(1, 2))
        self._fns[key] = fn
        return fn

    def forward_embed(self, ext: ExtendInput) -> np.ndarray:
        """Last-token pooled hidden state [H] (reference /encode /v1/embeddings)."""
        T = len(ext.tokens)
        t_pad = pick_bucket(T, self.prefill_token_buckets)
        pg_pad = pick_bucket(max(len(ext.pages), 1), self.prefill_page_buckets)
        fn = self._embed_fn(t_pad, pg_pad)
        tokens = np.zeros(t_pad, np.int32)
        tokens[:T] = ext.tokens
        positions = np.zeros(t_pad, np.int32)
        positions[:T] = ext.positions
        slots = np.full(t_pad, PAD_SLOT, np.int32)
        slots[:T] = ext.slots
        pages = np.zeros(pg_pad, np.int32)
        pages[: len(ext.pages)] = ext.pages
        hidden, self.k_cache, self.v_cache = fn(
            self.params, self.k_cache, self.v_cache, self.rope_tab,
            jnp.asarray(tokens), jnp.asarray(positions), jnp.asarray(slots),
            jnp.asarray(pages), jnp.int32(ext.prefix_len), jnp.int32(T),
        )
        return np.asarray(hidden)[0]

    def _spec_verify_fn(self, bs: int, q_span: int, pt_w: int):
        key = ("spec_verify", bs, q_span, pt_w)
        if key in self._fns:
            return self._fns[key]
        model = self.model

        def raw(params, kc, vc, rope, tokens, positions, slots, page_table, lengths):
            logits, kc, vc = model.spec_verify_step(
                params, kc, vc, rope, tokens, positions, slots, page_table, lengths
            )
            # greedy verify ids for every position
            ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, QS]
            return ids, kc, vc

        fn = jax.jit(
            self._wrap_step(raw, 5, n_replicated_out=1), donate_argnums=(1, 2)
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
    ) -> np.ndarray:
        """Speculative verify step -> greedy ids [bs_pad, QS]."""
        bs, qs = tokens.shape
        bs_pad = pick_bucket(bs, self.decode_bs_buckets)
        pt_w = pick_bucket(page_table.shape[1], self.pmax_buckets)
        fn = self._spec_verify_fn(bs_pad, qs, pt_w)

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
        ids, self.k_cache, self.v_cache = fn(
            self.params,
            self.k_cache,
            self.v_cache,
            self.rope_tab,
            jnp.asarray(pad2(tokens)),
            jnp.asarray(pad2(positions)),
            jnp.asarray(pad2(slots, PAD_SLOT)),
            jnp.asarray(pt),
            jnp.asarray(lens),
        )
        return np.asarray(ids)

    # ------------------------------------------------------------------
    # weight updates (reference model_runner.py:969-1344 family)
    # ------------------------------------------------------------------

    def update_weights_from_disk(self, model_path: str) -> Tuple[bool, str]:
        """In-place reload from a checkpoint dir (reference
        update_weights_from_disk — RL rollout refresh / model hot-swap).
        The architecture and shapes must match the loaded model."""
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
        """Zero + reallocate the KV pool (reference /flush_cache)."""
        self.k_cache, self.v_cache = self._alloc_kv()
