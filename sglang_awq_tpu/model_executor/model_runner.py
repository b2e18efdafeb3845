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
        # extend q-block: per-seq q regions are padded to this; must be a
        # page multiple so prefill KV write groups never straddle sequences
        self.block_q = max(128, self.page_size)
        assert self.block_q % self.page_size == 0

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
        kvp = kv_pspec()
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
        probe = KVPoolSpec(
            mc.num_layers, kv_heads_local, 1, self.page_size, mc.head_dim,
            dtype=kv_dtype,
        )
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
            dtype=kv_dtype,
        )
        self.max_total_tokens = num_pages * self.page_size
        self.pmax = cdiv(mc.context_length, self.page_size)
        self.kv_cache = self._alloc_kv()
        logger.info(
            "KV pool: %d pages x %d tokens (%.2f GiB global)",
            num_pages,
            self.page_size,
            self.kv_cache.nbytes / 1024**3,
        )

    def _alloc_kv(self):
        if self.mesh is None:
            return self.kv_spec.alloc()
        from jax.sharding import NamedSharding

        from sglang_awq_tpu.parallel.sharding import kv_pspec

        sh = NamedSharding(self.mesh, kv_pspec())
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
                   want_pen: bool = False):
        key = ("extend", tq, bs, pt_w, all_greedy, want_lp, want_mask, want_pen)
        if key in self._fns:
            return self._fns[key]
        model = self.model
        block_q = self.block_q

        def raw(params, kv, rope, last_ids, *rest):
            rest = list(rest)
            counts = rest.pop(0) if want_pen else None
            (tokens, positions, slots, page_table, kv_lens, q_lens,
             qb_base, row_ids, info, steps) = rest[:10]
            mask = rest[10:]
            logits, kv = model.extend_step(
                params, kv, rope, tokens, positions, slots, page_table,
                kv_lens, q_lens, qb_base, block_q=block_q,
            )
            vm = mask[0] if want_mask else None
            ids = sample(logits, info, steps, all_greedy=all_greedy, vocab_mask=vm)
            # publish sampled ids (and first penalty count) into the
            # device sampling state so the NEXT decode step can be
            # dispatched before the host ever fetches these ids
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
                11 + (1 if want_mask else 0) + (1 if want_pen else 0),
                n_replicated_out=4 if want_lp else 1,
                n_state_out=2 if want_pen else 1,
            ),
            donate_argnums=(1, 3, 4) if want_pen else (1, 3),
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

        def raw(params, kv, rope, last_ids, *rest):
            rest = list(rest)
            counts = rest.pop(0) if want_pen else None
            row_ids, positions, slots, page_table, lengths, info, steps = rest
            tokens = last_ids[row_ids]
            logits, kv = model.decode_step(
                params, kv, rope, tokens, positions, slots, page_table, lengths
            )
            if want_pen:
                logits = apply_penalties(logits, counts[row_ids], info, vocab)
            ids = sample(logits, info, steps, all_greedy=all_greedy)
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
                8 + (1 if want_pen else 0),
                n_replicated_out=4 if want_lp else 1,
                n_state_out=2 if want_pen else 1,
            ),
            donate_argnums=(1, 3, 4) if want_pen else (1, 3),
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

        def raw(params, kv, rope, tokens, positions, slots, page_table, lengths, info, steps, *extra):
            logits, kv = model.decode_step(
                params, kv, rope, tokens, positions, slots, page_table, lengths
            )
            extra = list(extra)
            if want_pen:
                counts = extra.pop(0)
                logits = apply_penalties(logits, counts, info, vocab)
            vm = extra.pop(0) if want_mask else None
            ids = sample(logits, info, steps, all_greedy=all_greedy, vocab_mask=vm)
            if want_lp:
                lp, top_ids, top_vals = logprob_outputs(logits, ids)
                return ids, lp, top_ids, top_vals, kv
            return ids, kv

        fn = jax.jit(
            self._wrap_step(
                raw,
                7 + (1 if want_mask else 0) + (1 if want_pen else 0),
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

        def raw(params, kv, rope, tokens0, lengths0, page_table, info, steps0):
            def body(carry, s):
                kv, toks, lens = carry
                live = lens > 0
                pos = jnp.maximum(lens - 1, 0)
                page = page_table[jnp.arange(bs), pos // ps]
                slots = jnp.where(live, page * ps + pos % ps, PAD_SLOT)
                logits, kv = model.decode_step(
                    params, kv, rope, toks, pos, slots, page_table, lens
                )
                ids = sample(logits, info, steps0 + s, all_greedy=all_greedy)
                lens = jnp.where(live, lens + 1, lens)
                return (kv, ids, lens), ids

            (kv, _, _), all_ids = jax.lax.scan(
                body, (kv, tokens0, lengths0), jnp.arange(n_steps)
            )
            return all_ids, kv

        fn = jax.jit(self._wrap_step(raw, 5, n_replicated_out=1), donate_argnums=(1,))
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
        positions = np.zeros(tq_pad, np.int32)
        positions[:TQ] = ext.positions
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

    def forward_extend_batch(
        self,
        ext: ExtendBatchInput,
        want_logprobs: bool = False,
        vocab_mask: Optional[np.ndarray] = None,  # [B, V] bool
        update_counts: bool = False,
        async_result: bool = False,
    ):
        """Run one batched prefill step -> (ids [bs_pad], logprobs|None).

        ids[b] is only meaningful for rows finishing their prompt this step.
        Sampled ids are also published to the device sampling state at
        ext.row_ids, so a decode step can consume them before the host
        fetches.  With async_result the returned arrays stay on device.
        """
        (tq_pad, bs_pad, pt_w, tokens, positions, slots, pt,
         kv_lens, q_lens, qb_base, steps) = self._pad_extend(ext)
        st = self.sampling_state
        fn = self._extend_fn(
            tq_pad, bs_pad, pt_w, ext.all_greedy(), want_logprobs,
            vocab_mask is not None, update_counts,
        )
        info = _sampling_info(ext.sampling_padded(bs_pad))
        rows = self._pad_rows(ext.row_ids, len(ext.kv_lens), bs_pad)
        state_args = (st.last_ids,) + (
            (st.ensure_counts(),) if update_counts else ()
        )
        args = (
            self.params, self.kv_cache, self.rope_tab, *state_args,
            tokens, positions, slots, pt, kv_lens, q_lens, qb_base,
            rows, info, steps,
        )
        if vocab_mask is not None:
            vm = np.ones((bs_pad, vocab_mask.shape[1]), bool)
            vm[: vocab_mask.shape[0]] = vocab_mask
            args = args + (jnp.asarray(vm),)
        outs = list(fn(*args))
        if update_counts:
            st.out_counts = outs.pop()
        st.last_ids = outs.pop()
        self.kv_cache = outs.pop()
        ids = outs[0]
        lp = None
        if want_logprobs:
            lp = {
                "logprobs": outs[1],
                "top_ids": outs[2],
                "top_logprobs": outs[3],
            }
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
        outs = list(fn(
            self.params, self.kv_cache, self.rope_tab, *state_args,
            rows, positions, slots, pt, lengths, info, jnp.asarray(steps),
        ))
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
            self.params, self.kv_cache, self.rope_tab,
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
        all_ids, self.kv_cache = fn(
            self.params, self.kv_cache, self.rope_tab,
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
        return np.asarray(hidden)[: len(ext.kv_lens)]

    def _spec_verify_fn(self, bs: int, q_span: int, pt_w: int):
        key = ("spec_verify", bs, q_span, pt_w)
        if key in self._fns:
            return self._fns[key]
        model = self.model

        def raw(params, kv, rope, tokens, positions, slots, page_table, lengths):
            logits, kv = model.spec_verify_step(
                params, kv, rope, tokens, positions, slots, page_table, lengths
            )
            # greedy verify ids for every position
            ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, QS]
            return ids, kv

        fn = jax.jit(
            self._wrap_step(raw, 5, n_replicated_out=1), donate_argnums=(1,)
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
        ids, self.kv_cache = fn(
            self.params,
            self.kv_cache,
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
        self.kv_cache = self._alloc_kv()
