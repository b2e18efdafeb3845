"""Fused AWQ SwiGLU MLP megakernel: gate_up -> act -> down in ONE dispatch.

Reference role: the gate_up GEMM + SiLU-and-mul + down GEMM sequence
(`python/sglang/srt/models/llama.py:61` LlamaMLP; activation kernel
`sgl-kernel/csrc/elementwise/activation.cu`).  TPU-first form: chunk the
INTERMEDIATE dimension — for chunk c of the intermediate lanes,

    act_c = act(x @ Wg[:, c]) * (x @ Wu[:, c])        # [M, ci]
    acc  += act_c @ Wd[c, :]                           # [M, H]

so gate, up, and down weight chunks stream through one double-buffered
pipeline.  vs the two-dispatch path this removes the [M, I] intermediate
HBM round trip, one kernel invocation per layer, and — the big one at
decode sizes — lets the DMA of down's rows overlap gate_up's MXU work
(per-chunk time = max(DMA, MXU) across ALL THREE projections instead of
per-projection ramps).

All weights are in the pair layout (ops/awq_matmul.py); per-chunk compute
reuses `pair_proj_chunk` (unpack + per-group scaled dots + in-kernel
zero-correction).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.ops.awq_matmul import (
    pair_proj_chunk,
    scale_rows_per_tile,
)
from sglang_awq_tpu.utils import pallas_interpret_default, round_up


def _mlp_kernel(
    layer_ref, x_ref, g_ref, u_ref, sg_ref, bg_ref, su_ref, bu_ref,
    d_ref, sd_ref, bd_ref, o_ref, acc_ref,
    *, pb_gu, pb_d, group_size, num_chunks, act,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [BM, K] bf16
    gate = pair_proj_chunk(
        x, g_ref[0], sg_ref[0], bg_ref[0],
        pack_block=pb_gu, group_size=group_size,
    )  # [BM, ci] f32
    up = pair_proj_chunk(
        x, u_ref[0], su_ref[0], bu_ref[0],
        pack_block=pb_gu, group_size=group_size,
    )
    if act == "silu":
        a = jax.nn.silu(gate) * up
    else:  # tanh-approx gelu, matching layers/activation.py
        a = jax.nn.gelu(gate, approximate=True) * up
    a = a.astype(jnp.bfloat16)  # [BM, ci]
    acc_ref[:] += pair_proj_chunk(
        a, d_ref[0], sd_ref[0], bd_ref[0],
        pack_block=pb_d, group_size=group_size,
    )

    @pl.when(i == num_chunks - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "pb_gu", "pb_d", "chunk_i", "act", "out_dtype",
        "interpret",
    ),
)
def awq_mlp_fused(
    x: jax.Array,  # [M, K] bf16
    gu_qweight: jax.Array,  # [L, K/2, 2I] uint8 (pair layout, [gate | up])
    gu_scales: jax.Array,  # [L, (K/pb_gu)*sr_pad, 2I] f32
    gu_zbias: jax.Array,  # same shape as gu_scales
    d_qweight: jax.Array,  # [L, I/2, H] uint8 (pair layout)
    d_scales: jax.Array,  # [L, (I/pb_d)*sr_pad_d, H] f32
    d_zbias: jax.Array,  # same shape as d_scales
    layer: jax.Array | int,
    *,
    group_size: int,
    pb_gu: int,
    pb_d: int,
    chunk_i: int = 2048,
    act: str = "silu",
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Y = down(act(gate(x)) * up(x)) for one layer of the stacked weights."""
    if interpret is None:
        interpret = pallas_interpret_default()
    M, K = x.shape
    L, K2, I2 = gu_qweight.shape
    I = I2 // 2
    _, Id2, H = d_qweight.shape
    assert K2 == K // 2 and Id2 == I // 2, (gu_qweight.shape, d_qweight.shape)
    ci = min(chunk_i, I)
    assert I % ci == 0 and ci % pb_d == 0 and K % pb_gu == 0, (I, ci, pb_d, pb_gu)
    nchunks = I // ci

    bm = round_up(M, 8)
    if bm != M:
        x = jnp.pad(x, ((0, bm - M), (0, 0)))

    _, srp_gu = scale_rows_per_tile(pb_gu, group_size)
    _, srp_d = scale_rows_per_tile(pb_d, group_size)
    s_gu_rows = (K // pb_gu) * srp_gu
    s_d_rows_chunk = (ci // pb_d) * srp_d
    assert gu_scales.shape == (L, s_gu_rows, I2), gu_scales.shape
    assert d_scales.shape == (L, (I // pb_d) * srp_d, H), d_scales.shape

    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)

    def _gu_spec(off):
        return pl.BlockSpec(
            (1, K // 2, ci), lambda i, lr: (lr[0], 0, off + i)
        )

    def _sgu_spec(off):
        return pl.BlockSpec(
            (1, s_gu_rows, ci), lambda i, lr: (lr[0], 0, off + i)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, lr: (0, 0)),
            _gu_spec(0),  # gate weights
            _gu_spec(I // ci),  # up weights
            _sgu_spec(0),  # gate scales
            _sgu_spec(0),  # gate zbias (same block geometry)
            _sgu_spec(I // ci),  # up scales
            _sgu_spec(I // ci),  # up zbias
            pl.BlockSpec((1, ci // 2, H), lambda i, lr: (lr[0], i, 0)),
            pl.BlockSpec((1, s_d_rows_chunk, H), lambda i, lr: (lr[0], i, 0)),
            pl.BlockSpec((1, s_d_rows_chunk, H), lambda i, lr: (lr[0], i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, H), lambda i, lr: (0, 0)),
        scratch_shapes=[pltpu.VMEM((bm, H), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel,
            pb_gu=pb_gu,
            pb_d=pb_d,
            group_size=group_size,
            num_chunks=nchunks,
            act=act,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bm, H), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * K * I2 + 2 * bm * I * H,
            bytes_accessed=K * I2 // 2 + I * H // 2 + bm * K * 2 + bm * H * 2,
            transcendentals=bm * I,
        ),
        interpret=interpret,
    )(
        layer, x,
        gu_qweight, gu_qweight, gu_scales, gu_zbias, gu_scales, gu_zbias,
        d_qweight, d_scales, d_zbias,
    )
    if bm != M:
        out = out[:M]
    return out
