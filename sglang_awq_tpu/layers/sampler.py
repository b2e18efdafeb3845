"""On-device batched sampling.

Role model: reference `python/sglang/srt/layers/sampler.py:36` (order per
SURVEY.md §A.6: penalties -> temperature -> grammar mask -> greedy argmax |
top-k renorm -> top-p renorm -> min-p -> categorical).

TPU adaptation: filtering runs over the top `TOPK_CAP` logits (a
`lax.top_k` then sorted-cumsum filter) instead of a full-vocab sort — exact
whenever the requested top-k <= TOPK_CAP and the top-p mass lies within the
cap (true for every practical setting; full-vocab exactness arrives with a
Pallas sort if ever needed).  Greedy rows bypass filtering entirely.

Determinism: per-request uint32 seeds + the decode step index give
reproducible draws (reference deterministic-inference mode,
`sampling_batch_info.py` per-request seeds).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

TOPK_CAP = 256
NEG_INF = -1e30


class SamplingInfo(NamedTuple):
    """Batched device-side sampling state (reference SamplingBatchInfo:22)."""

    temperatures: jax.Array  # [B] f32
    top_ps: jax.Array  # [B] f32
    top_ks: jax.Array  # [B] i32 (TOP_K_ALL for unlimited)
    min_ps: jax.Array  # [B] f32
    seeds: jax.Array  # [B] u32
    # penalties (0 / 1 disabled)
    frequency_penalties: jax.Array  # [B] f32
    presence_penalties: jax.Array  # [B] f32
    repetition_penalties: jax.Array  # [B] f32
    min_new_tokens: jax.Array  # [B] i32 (EOS suppressed below this)


@functools.partial(jax.jit, static_argnames=("vocab_size",))
def apply_penalties(
    logits: jax.Array,  # [B, V] f32
    output_counts: jax.Array,  # [B, V] i32 — counts of generated tokens
    info: SamplingInfo,
    vocab_size: int,
) -> jax.Array:
    """Frequency/presence/repetition penalties (reference penaltylib)."""
    freq = info.frequency_penalties[:, None]
    pres = info.presence_penalties[:, None]
    rep = info.repetition_penalties[:, None]
    appeared = output_counts > 0
    logits = logits - freq * output_counts.astype(jnp.float32)
    logits = logits - pres * appeared.astype(jnp.float32)
    pos = logits > 0
    rep_logits = jnp.where(pos, logits / rep, logits * rep)
    logits = jnp.where(appeared, rep_logits, logits)
    return logits


@functools.partial(jax.jit, static_argnames=("all_greedy", "eos_ids"))
def sample(
    logits: jax.Array,  # [B, V] f32
    info: SamplingInfo,
    step: jax.Array,  # [B] or [] i32 — the request's sample position (for
    #                   seed folding; per-request, NOT a global counter, so
    #                   draws are reproducible regardless of batching)
    all_greedy: bool = False,  # static fast path: skip top-k/softmax entirely
    vocab_mask: jax.Array | None = None,  # [B, V] bool — grammar constraint
    eos_ids: tuple = (),  # static: EOS token ids (min_new_tokens masking)
) -> jax.Array:
    """Returns sampled token ids [B] i32.

    Order per reference sampler.py:64-160: (penalties upstream) ->
    temperature -> grammar mask -> greedy | top-k -> top-p -> min-p -> draw.
    """
    B, V = logits.shape
    if vocab_mask is not None:
        logits = jnp.where(vocab_mask, logits, NEG_INF)
    if eos_ids:
        # reference min_new_tokens penalizer: EOS is masked (not merely
        # ignored) until the request reaches its minimum
        steps_b = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (B,))
        under = steps_b < info.min_new_tokens  # [B]
        cols = jnp.asarray(list(eos_ids), jnp.int32)
        bias = jnp.where(under[:, None], NEG_INF, 0.0)  # [B, 1]
        logits = logits.at[:, cols].add(bias)
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if all_greedy:
        return greedy_ids
    is_greedy = info.temperatures < 1e-5

    temps = jnp.maximum(info.temperatures, 1e-5)[:, None]
    scaled = logits / temps

    k = min(TOPK_CAP, V)
    vals, idxs = jax.lax.top_k(scaled, k)  # sorted desc, [B, k]
    # top-k: positions beyond the requested k are dropped
    ranks = jnp.arange(k)[None, :]
    mask = ranks < jnp.minimum(info.top_ks, k)[:, None]
    vals = jnp.where(mask, vals, NEG_INF)
    # top-p over the sorted candidates: keep while cumsum-p_i < top_p
    probs = jax.nn.softmax(vals, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep_p = (csum - probs) < info.top_ps[:, None]
    vals = jnp.where(keep_p, vals, NEG_INF)
    # min-p: p_i >= min_p * p_max
    probs2 = jax.nn.softmax(vals, axis=-1)
    keep_mp = probs2 >= info.min_ps[:, None] * probs2[:, :1]
    vals = jnp.where(keep_mp, vals, NEG_INF)

    # per-row deterministic categorical draw via gumbel trick
    steps = jnp.broadcast_to(jnp.asarray(step, jnp.int32), (B,))

    def draw(seed, row_step, row_vals):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), row_step)
        g = jax.random.gumbel(key, row_vals.shape)
        return jnp.argmax(row_vals + g)

    choice = jax.vmap(draw)(info.seeds, steps, vals)  # index into top-k list
    sampled_ids = jnp.take_along_axis(idxs, choice[:, None], axis=-1)[:, 0]
    return jnp.where(is_greedy, greedy_ids, sampled_ids.astype(jnp.int32))


def compute_logprobs(logits: jax.Array, token_ids: jax.Array) -> jax.Array:
    """Log-softmax logprob of the chosen tokens (reference logprob capture)."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.take_along_axis(lp, token_ids[:, None], axis=-1)[:, 0]


TOP_LOGPROBS_CAP = 20  # OpenAI API max top_logprobs


@jax.jit
def logprob_outputs(logits: jax.Array, token_ids: jax.Array):
    """(chosen logprob [B], top ids [B, CAP], top logprobs [B, CAP])."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(lp, token_ids[:, None], axis=-1)[:, 0]
    top_vals, top_ids = jax.lax.top_k(lp, TOP_LOGPROBS_CAP)
    return chosen, top_ids.astype(jnp.int32), top_vals
