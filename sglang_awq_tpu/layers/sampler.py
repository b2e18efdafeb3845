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


def _filtered_vals(logits: jax.Array, info: SamplingInfo):
    """Temperature + top-k/p/min-p filtering -> (vals [B, k] desc, idxs).

    The candidate list a non-greedy row samples from (shared by sample()
    and the speculative accept/reject path so both draw from the SAME
    filtered distribution)."""
    B, V = logits.shape
    temps = jnp.maximum(info.temperatures, 1e-5)[:, None]
    scaled = logits / temps
    k = min(TOPK_CAP, V)
    vals, idxs = jax.lax.top_k(scaled, k)
    ranks = jnp.arange(k)[None, :]
    mask = ranks < jnp.minimum(info.top_ks, k)[:, None]
    vals = jnp.where(mask, vals, NEG_INF)
    probs = jax.nn.softmax(vals, axis=-1)
    csum = jnp.cumsum(probs, axis=-1)
    keep_p = (csum - probs) < info.top_ps[:, None]
    vals = jnp.where(keep_p, vals, NEG_INF)
    probs2 = jax.nn.softmax(vals, axis=-1)
    keep_mp = probs2 >= info.min_ps[:, None] * probs2[:, :1]
    vals = jnp.where(keep_mp, vals, NEG_INF)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("all_greedy",))
def spec_accept_sample(
    logits: jax.Array,  # [B, QS, V] f32 — target logits per chain position
    tokens: jax.Array,  # [B, QS] i32 — [committed input, draft_1..draft_{QS-1}]
    info: SamplingInfo,  # per-request [B]
    steps: jax.Array,  # [B] i32 — sample index of the FIRST emitted token
    all_greedy: bool = False,
    bias0: Optional[jax.Array] = None,  # [B, V] additive bias on POSITION 0
    caps: Optional[jax.Array] = None,  # [B] per-row emit cap (1..QS)
):
    """Chain speculative accept/reject, distribution-preserving.

    Reference: `sgl-kernel/csrc/speculative/speculative_sampling.cu` (chain
    rejection sampling).  The draft chain is a DETERMINISTIC proposal
    (draft-model argmax), so position j's draft token t accepts with
    probability P_j(t) under the row's filtered target distribution, and on
    rejection the emitted token samples from renorm(P_j minus t) — the
    emitted sequence is distributed exactly as non-spec sampling.  Greedy
    rows reduce to argmax-match acceptance (P is one-hot).

    Returns (emit_ids [B, QS], emit_len [B] in 1..QS, ids_greedy [B, QS]).
    emit_ids[:, :n-1] are accepted draft tokens; emit_ids[:, n-1] is the
    bonus/correction token.
    """
    B, QS, V = logits.shape
    if bias0 is not None:
        # per-request spec coexistence (reference: per-request grammar /
        # logit_bias participation, eagle_worker.py): constrained rows run
        # width-1 (caps==1) and their single emitted token samples under
        # the grammar mask / bias applied at position 0
        logits = logits.at[:, 0, :].add(bias0)
    ids_greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, QS]
    is_greedy = info.temperatures < 1e-5  # [B]
    draft_next_g = jnp.concatenate(
        [tokens[:, 1:], jnp.zeros((B, 1), tokens.dtype)], axis=1
    )

    if all_greedy:  # static fast path: no filtering, no draws
        accept = ids_greedy == draft_next_g
        if caps is not None:
            accept = accept & (
                jnp.arange(QS)[None, :] < (caps - 1)[:, None]
            )
        judge = accept[:, : QS - 1] if QS > 1 else jnp.zeros((B, 0), bool)
        prefix_ok = jnp.cumprod(judge.astype(jnp.int32), axis=1)
        n_acc = jnp.sum(prefix_ok, axis=1)
        bonus = ids_greedy[jnp.arange(B), jnp.minimum(n_acc, QS - 1)]
        j = jnp.arange(QS)[None, :]
        emit_ids = jnp.where(j < n_acc[:, None], draft_next_g, 0)
        emit_ids = jnp.where(j == n_acc[:, None], bonus[:, None], emit_ids)
        return (emit_ids.astype(jnp.int32), (n_acc + 1).astype(jnp.int32),
                ids_greedy)

    flat = logits.reshape(B * QS, V)
    info_b = jax.tree.map(lambda a: jnp.repeat(a, QS, axis=0), info)
    vals, idxs = _filtered_vals(flat, info_b)  # [B*QS, k]
    vals = vals.reshape(B, QS, -1)
    idxs = idxs.reshape(B, QS, -1)
    probs = jax.nn.softmax(vals, axis=-1)  # filtered P_j

    # draft token proposed FROM position j is tokens[:, j+1]
    draft_next = draft_next_g  # [B, QS] (last column unused)
    match = idxs == draft_next[..., None]
    p_draft = jnp.sum(jnp.where(match, probs, 0.0), axis=-1)  # [B, QS]

    # per-(row, position) uniform + gumbel draws, seeded like sample():
    # fold_in(seed, step + j) so draws line up with the request's token index
    pos_steps = steps[:, None] + jnp.arange(QS)[None, :]  # [B, QS]

    def draw(seed, row_steps, row_vals, row_excl_vals):
        def one(s, v, ev):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), s)
            ku, kg, kg2 = jax.random.split(key, 3)
            u = jax.random.uniform(ku)
            g = jax.random.gumbel(kg, v.shape)
            # bonus candidates: exclusion applied for mid-chain rejections
            c_ex = jnp.argmax(ev + g)
            c_all = jnp.argmax(v + jax.random.gumbel(kg2, v.shape))
            return u, c_ex, c_all

        return jax.vmap(one)(row_steps, row_vals, row_excl_vals)

    excl_vals = jnp.where(match, NEG_INF, vals)  # P_j minus the draft token
    u, c_ex, c_all = jax.vmap(draw)(info.seeds, pos_steps, vals, excl_vals)

    sampled_accept = u < p_draft  # [B, QS]
    greedy_accept = ids_greedy == draft_next
    accept = jnp.where(is_greedy[:, None], greedy_accept, sampled_accept)
    if caps is not None:
        accept = accept & (jnp.arange(QS)[None, :] < (caps - 1)[:, None])
    # positions j = 0..QS-2 judge draft j+1; accept_len = leading accepts
    judge = accept[:, : QS - 1] if QS > 1 else jnp.zeros((B, 0), bool)
    prefix_ok = jnp.cumprod(judge.astype(jnp.int32), axis=1)
    n_acc = jnp.sum(prefix_ok, axis=1)  # [B] 0..QS-1 accepted drafts
    emit_len = n_acc + 1

    # bonus token at position n_acc: mid-chain -> exclusion sample;
    # full acceptance (n_acc == QS-1) -> plain sample from P_{QS-1}
    tk = vals.shape[-1]
    full = n_acc == (QS - 1)
    choice = jnp.where(full, c_all[jnp.arange(B), QS - 1],
                       c_ex[jnp.arange(B), jnp.minimum(n_acc, QS - 1)])
    bonus_idx = jnp.take_along_axis(
        idxs[jnp.arange(B), jnp.minimum(n_acc, QS - 1)],
        choice[:, None], axis=-1)[:, 0]
    bonus_greedy = ids_greedy[jnp.arange(B), jnp.minimum(n_acc, QS - 1)]
    bonus = jnp.where(is_greedy, bonus_greedy, bonus_idx).astype(jnp.int32)

    # emit_ids: accepted drafts then the bonus
    j = jnp.arange(QS)[None, :]
    emit_ids = jnp.where(
        j < n_acc[:, None], draft_next, 0
    )
    emit_ids = jnp.where(j == n_acc[:, None], bonus[:, None], emit_ids)
    return emit_ids.astype(jnp.int32), emit_len.astype(jnp.int32), ids_greedy


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
