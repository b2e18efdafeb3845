"""Grouped (megablocks-style) MoE expert GEMMs for large-E prefill.

Reference role: the ragged fused-MoE dispatch
(`/root/reference/python/sglang/srt/layers/moe/fused_moe_triton/fused_moe.py`
`moe_align_block_size` + grouped GEMM over sorted token blocks) and the
topk weight application (`topk.py`).

TPU-first form — static shapes, no drops, scalar-prefetch expert blocks:

* Sort the T*K (token, expert) assignments by LOCAL expert id
  (`jnp.argsort`, stable), pad each expert's segment up to a multiple of
  BT rows, and lay the result out in ONE [P, ...] buffer
  (P = roundup(T*K + El*(BT-1), BT) — a static worst case, so NO tokens
  are ever dropped, unlike capacity-factor formulations).
* Each BT-row block belongs to exactly one expert.  The per-block expert
  id array [P/BT] feeds the Pallas kernel as a PREFETCHED SCALAR: the
  BlockSpec index_map selects that expert's weight block, so the kernel
  is a plain tiled matmul whose weight operand hops around HBM —
  the TPU version of the reference's `expert_ids` pointer array.
* Expert weights stay in the SAME merged stacked layout the dense
  all-expert path uses ([L, K/2, E*2I] pair-packed AWQ for gate_up,
  [L, (E*I)/2, H] for down), so dense (decode) and grouped (prefill)
  paths share one set of arrays; EP sharding over the model axis is
  unchanged.
* Why not dense for prefill: dense scores every token against every
  expert — E/topk (8-20x) the reference FLOPs, MXU-bound at chunked
  prefill sizes.  Grouped does ~(1 + El*BT/(T*K))x ideal.

Padding rows gather the zero row of x (index T) and carry weight 0, so
they contribute exactly 0 through act * w; the final combine scatter-adds
per-assignment outputs back by token id.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.ops.awq_matmul import (
    pair_proj_chunk,
    scale_rows_per_tile,
)
from sglang_awq_tpu.utils import pallas_interpret_default, round_up


def choose_block_rows(assignments: int, n_local: int) -> int:
    """Rows per expert block: big enough to feed the MXU, small enough that
    per-segment padding (up to BT-1 rows each) stays a minor fraction of the
    live rows.  Dead tail blocks are skipped in-kernel (eid = -1), so the
    static worst-case buffer costs DMA/MXU nothing; only live padding
    (≈ BT/2 per expert) computes."""
    bt = max(8, min(128, round_up(max(1, assignments // max(1, n_local)), 8)))
    return bt


def moe_plan(
    topi: jax.Array,  # [T, K] int32 — GLOBAL expert ids
    topv: jax.Array,  # [T, K] f32 — per-assignment combine weights
    *,
    e0: jax.Array | int,  # first local expert (EP offset)
    n_local: int,
    block_rows: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sort-and-pad assignment plan.

    Returns (tok [P] int32 with T as the padding id, wts [P] f32 zero on
    padding, block_eid [P/BT] int32 local expert per BT-row block).
    """
    T, K = topi.shape
    TK = T * K
    BT = block_rows
    P = round_up(TK + n_local * (BT - 1), BT)
    NB = P // BT

    local = topi.reshape(TK).astype(jnp.int32) - jnp.asarray(e0, jnp.int32)
    valid = (local >= 0) & (local < n_local)
    key = jnp.where(valid, local, n_local)  # invalid sorts last
    order = jnp.argsort(key, stable=True)
    se = key[order]  # [TK] ascending local expert (n_local = foreign)
    stok = (order // K).astype(jnp.int32)
    sw = topv.reshape(TK)[order].astype(jnp.float32)

    starts = jnp.searchsorted(se, jnp.arange(n_local + 1, dtype=se.dtype))
    counts = (starts[1:] - starts[:-1]).astype(jnp.int32)  # [El]
    padded = ((counts + BT - 1) // BT) * BT
    pend = jnp.cumsum(padded)  # [El]
    pstart = jnp.concatenate([jnp.zeros((1,), pend.dtype), pend])  # [El+1]

    pos = jnp.arange(TK, dtype=jnp.int32) - starts[se].astype(jnp.int32)
    slot = pstart[jnp.minimum(se, n_local - 1)].astype(jnp.int32) + pos
    slot = jnp.where(se < n_local, slot, P)  # foreign -> trash slot

    tok = jnp.full((P + 1,), T, jnp.int32).at[slot].set(stok)[:P]
    wts = jnp.zeros((P + 1,), jnp.float32).at[slot].set(sw)[:P]

    bstart = jnp.arange(NB, dtype=pend.dtype) * BT
    eid = jnp.searchsorted(pend, bstart, side="right")
    # blocks past the live padded total are DEAD: eid = -1 (kernel skips
    # their DMA-compute entirely; their rows scatter into the trash slot)
    block_eid = jnp.where(
        bstart < pend[-1], jnp.minimum(eid, n_local - 1), -1
    ).astype(jnp.int32)
    return tok, wts, block_eid


def _pick_bn(n: int, cap: int = 2048) -> int:
    for bn in (2048, 1536, 1024, 768, 512, 384, 256, 128):
        if bn <= cap and n % bn == 0:
            return bn
    return n


def _grouped_pair_kernel(
    layer_ref, eid_ref, x_ref, qw_ref, s_ref, b_ref, o_ref,
    *, pack_block, group_size,
):
    del layer_ref  # consumed by the index maps
    i = pl.program_id(0)

    @pl.when(eid_ref[i] >= 0)
    def _live():
        o_ref[:] = pair_proj_chunk(
            x_ref[:], qw_ref[0], s_ref[0], b_ref[0],
            pack_block=pack_block, group_size=group_size,
        ).astype(o_ref.dtype)

    @pl.when(eid_ref[i] < 0)
    def _dead():  # keep dead rows finite (they land in the trash slot)
        o_ref[:] = jnp.zeros_like(o_ref)


@functools.partial(
    jax.jit,
    static_argnames=(
        "merge", "expert_n", "group_size", "pack_block", "block_n",
        "out_dtype", "interpret",
    ),
)
def awq_grouped_matmul(
    xg: jax.Array,  # [P, Kx] bf16 (P = NB*BT gathered/padded rows)
    qweight: jax.Array,  # pair layout; column: [L, Kx/2, El*Ne]; row: [L, (El*Kx)/2, Ne]
    scales: jax.Array,
    zbias: jax.Array,
    block_eid: jax.Array,  # [NB] int32
    layer: jax.Array | int,
    *,
    merge: str,  # "column" (experts along N) | "row" (experts along K)
    expert_n: int,  # Ne — per-expert output features
    group_size: int,
    pack_block: int,
    block_n: int = 0,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Per-block expert GEMM: out[i*BT:(i+1)*BT] = x_block @ W[eid[i]]."""
    if interpret is None:
        interpret = pallas_interpret_default()
    P, Kx = xg.shape
    NB = block_eid.shape[0]
    BT = P // NB
    assert NB * BT == P, (P, NB)
    Ne = expert_n
    bn = block_n or _pick_bn(Ne)
    assert Ne % bn == 0, (Ne, bn)
    nbe = Ne // bn  # column blocks per expert

    L = qweight.shape[0]
    _, sr_pad = scale_rows_per_tile(pack_block, group_size)
    assert Kx % pack_block == 0, (Kx, pack_block)
    kt = Kx // pack_block
    s_rows = kt * sr_pad  # strip rows per expert-K

    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)
    block_eid = block_eid.astype(jnp.int32)

    def _eid(er, i):  # dead blocks (eid -1) address expert 0 (skipped dots)
        return jnp.maximum(er[i], 0)

    if merge == "column":
        qw_spec = pl.BlockSpec(
            (1, Kx // 2, bn),
            lambda i, n, lr, er: (lr[0], 0, _eid(er, i) * nbe + n),
        )
        st_spec = pl.BlockSpec(
            (1, s_rows, bn),
            lambda i, n, lr, er: (lr[0], 0, _eid(er, i) * nbe + n),
        )
    else:  # row: expert e owns packed rows [e*Kx/2, (e+1)*Kx/2)
        assert qweight.shape[2] == Ne and nbe >= 1
        qw_spec = pl.BlockSpec(
            (1, Kx // 2, bn), lambda i, n, lr, er: (lr[0], _eid(er, i), n)
        )
        st_spec = pl.BlockSpec(
            (1, s_rows, bn), lambda i, n, lr, er: (lr[0], _eid(er, i), n)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB, nbe),
        in_specs=[
            pl.BlockSpec((BT, Kx), lambda i, n, lr, er: (i, 0)),
            qw_spec,
            st_spec,
            st_spec,
        ],
        out_specs=pl.BlockSpec((BT, bn), lambda i, n, lr, er: (i, n)),
    )
    return pl.pallas_call(
        functools.partial(
            _grouped_pair_kernel, pack_block=pack_block, group_size=group_size
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((P, Ne), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * Kx * Ne,
            bytes_accessed=NB * (Kx * bn * nbe) // 2 + P * Kx * 2 + P * Ne * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer, block_eid, xg, qweight, scales, zbias)


def grouped_matmul_bf16(
    xg: jax.Array,  # [P, Kx] bf16
    w: jax.Array,  # column: [Kx, El*Ne]; row: [El*Kx, Ne] (layer-indexed)
    block_eid: jax.Array,  # [NB]
    *,
    merge: str,
    expert_n: int,
) -> jax.Array:
    """XLA fallback: lax.scan over row blocks, dynamic-slicing the expert."""
    P, Kx = xg.shape
    NB = block_eid.shape[0]
    BT = P // NB
    xb = xg.reshape(NB, BT, Kx)

    def body(_, inp):
        x_b, eid = inp
        eid = jnp.maximum(eid, 0)  # dead blocks: any expert (zero rows)
        if merge == "column":
            we = lax.dynamic_slice_in_dim(w, eid * expert_n, expert_n, axis=1)
        else:
            we = lax.dynamic_slice_in_dim(w, eid * Kx, Kx, axis=0)
        y = jnp.dot(x_b, we, preferred_element_type=jnp.float32)
        return None, y.astype(jnp.bfloat16)

    _, yb = lax.scan(body, None, (xb, block_eid))
    return yb.reshape(P, expert_n)


def moe_grouped_enabled(
    T: int, num_experts: int, spec_gu, spec_d, inter: int
) -> bool:
    """Static trigger for the grouped path (T is static under jit)."""
    mode = os.environ.get("SGLT_MOE_GROUPED", "auto")
    if mode == "0":
        return False
    ok_shapes = (
        spec_d.in_features % inter == 0
        and (not spec_d.quantized or (
            spec_d.unpack == "pair" and inter % spec_d.pack_block == 0
        ))
        and (not spec_gu.quantized or spec_gu.unpack == "pair")
        and (2 * inter) % 128 == 0
    )
    if not ok_shapes:
        return False
    if mode == "1":
        return True
    return T >= 256 and num_experts >= 16


def moe_grouped_mlp(
    spec_gu,
    p_gu: Dict[str, jax.Array],
    spec_d,
    p_d: Dict[str, jax.Array],
    h2: jax.Array,  # [T, H] bf16
    topi: jax.Array,  # [T, K] int32 global expert ids
    topv: jax.Array,  # [T, K] combine weights (normalized/scaled by caller)
    layer: jax.Array | int,
    *,
    e0: jax.Array | int,
    n_local: int,
    inter: int,
    act: str = "silu",
    block_rows: int = 0,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Routed-experts MLP via the grouped plan.  Output [T, H] bf16 —
    algebraically identical to the dense all-expert formulation (same
    per-assignment weights applied between act and down)."""
    from sglang_awq_tpu.layers.activation import gelu_and_mul, silu_and_mul

    T, H = h2.shape
    K = topi.shape[1]
    BT = block_rows or choose_block_rows(T * K, n_local)
    tok, wts, eids = moe_plan(
        topi, topv, e0=e0, n_local=n_local, block_rows=BT
    )
    x_pad = jnp.concatenate([h2, jnp.zeros((1, H), h2.dtype)], axis=0)
    xg = x_pad[tok]  # [P, H]

    if spec_gu.quantized:
        gu = awq_grouped_matmul(
            xg, p_gu["qweight"], p_gu["scales"], p_gu["zbias"], eids, layer,
            merge="column", expert_n=2 * inter,
            group_size=spec_gu.group_size, pack_block=spec_gu.pack_block,
            interpret=interpret,
        )
    else:
        w = lax.dynamic_index_in_dim(
            p_gu["weight"], jnp.asarray(layer, jnp.int32), 0, keepdims=False
        )
        gu = grouped_matmul_bf16(xg, w, eids, merge="column", expert_n=2 * inter)

    a = silu_and_mul(gu) if act == "silu" else gelu_and_mul(gu)
    a = (a.astype(jnp.float32) * wts[:, None]).astype(jnp.bfloat16)

    if spec_d.quantized:
        dn = awq_grouped_matmul(
            a, p_d["qweight"], p_d["scales"], p_d["zbias"], eids, layer,
            merge="row", expert_n=H,
            group_size=spec_d.group_size, pack_block=spec_d.pack_block,
            interpret=interpret,
        )
    else:
        w = lax.dynamic_index_in_dim(
            p_d["weight"], jnp.asarray(layer, jnp.int32), 0, keepdims=False
        )
        dn = grouped_matmul_bf16(a, w, eids, merge="row", expert_n=H)

    y = jnp.zeros((T + 1, H), jnp.float32).at[tok].add(dn.astype(jnp.float32))
    return y[:T].astype(h2.dtype)
