"""Fused AWQ INT4-dequant + bf16 matmul for the TPU MXU.

This is the TPU-native replacement for the reference's Marlin W4A16 fused
GEMM (`sgl-kernel/csrc/gemm/marlin/gptq_marlin.cu`) and the slow
dequant-then-matmul path (`sgl-kernel/csrc/gemm/awq_kernel.cu:127`).

Design (SURVEY.md §A.1/§A.2 "TPU decision"):

* The AWQ checkpoint's interleaved nibble order is undone ONCE at load time
  (`convert_awq_tensor` below).  The device-resident layout is chosen so the
  kernel's unpack is pure shift/mask with NO permutation network:

    qweight_u8 : uint8 [L, K/2, N]
        Packed per K-superblock of `pack_block` rows: within superblock b,
        byte[b*PB/2 + i, n] = w[b*PB + i, n] | (w[b*PB + i + PB/2, n] << 4)
        so that in-kernel `concat([byte & 0xF, byte >> 4], axis=0)` yields the
        superblock's rows in original order (a free layout op, no shuffle).
    scales_f32 : float32 [L, k_tiles * sr_pad, N]  per-k-tile scale strips
        (`tile_scale_layout`), 8-sublane aligned.
    bias_f32   : float32 [L, K/G, N]  zero*scale per group (original layout).

* Scale-in-epilogue structure (keeps the VPU off the critical path):
      Y = sum_g (X_g @ W_g_int4) * s_g  -  groupsum(X) @ bias
  The int4 nibbles are cast straight to bf16 (values 0..15, exact) and fed to
  the MXU; per-group scales multiply the [M, BN] accumulator, not the weight
  tile.  The zero-point term only needs per-group sums of X, so it is hoisted
  OUT of the kernel into a tiny XLA matmul (`awq_zero_correction`).  This is
  also slightly more accurate than dequantize-to-bf16-then-matmul.

* All operands carry a leading layer dimension and the kernel takes the layer
  index as a scalar-prefetch argument, so a `lax.scan` over stacked layer
  weights feeds the kernel without materializing per-layer weight copies.

Decode (small M) is HBM-bandwidth-bound on the packed weight bytes — the
0.5 byte/weight layout is the speed-of-light lever vs 2 bytes/weight bf16.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_awq_tpu.quantization.awq_config import unpack_awq_int32
from sglang_awq_tpu.utils import cdiv, pallas_interpret_default, round_up




def choose_pack_block(K: int, group_size: int, min_tiles: int = 4) -> int:
    """Pack block that keeps groups tile-aligned with a healthy k-grid.

    Either G | PB (tile spans whole groups) or PB | G (tile inside one
    group).  Measured sweet spot is ~4-8 k-tiles: too many tiles pay
    per-step unpack overhead (K=14336, PB=1024 -> 14 tiles: 333 GB/s vs
    PB=2048 -> 7 tiles: 590 GB/s), too few starve the accumulate pipeline
    (K=4096, PB=2048 -> 2 tiles: 332 GB/s vs PB=1024 -> 4 tiles: 478 GB/s).
    """
    candidates = []
    for pb in (4096, 2048, 1024, 512, 256, 128):
        if (
            pb >= 128
            and K % pb == 0
            and (pb % group_size == 0 or group_size % pb == 0)
        ):
            candidates.append(pb)
    if not candidates:
        raise ValueError(f"cannot choose pack block for K={K}, G={group_size}")
    # largest pack block that still leaves >= min_tiles k-tiles; else the
    # smallest (wide-N shapes measured fastest at min_tiles=2 in-context:
    # gate_up pb 1024 -> 2048 took the 32-layer gemm scan 9.2 -> 7.4 ms)
    for pb in candidates:
        if K // pb >= min_tiles:
            return pb
    return candidates[-1]


def scale_rows_per_tile(pack_block: int, group_size: int) -> Tuple[int, int]:
    """(live scale rows per k-tile, padded rows per k-tile)."""
    sr = max(1, pack_block // group_size)
    return sr, round_up(sr, 8)


# ---------------------------------------------------------------------------
# Offline layout conversion (numpy, once at checkpoint load)
# ---------------------------------------------------------------------------


def pack_rows_tpu(w_nibbles: np.ndarray, pack_block: int) -> np.ndarray:
    """Pack logical int4 rows [K, N] into the TPU superblock byte layout [K/2, N]."""
    K, N = w_nibbles.shape
    assert K % pack_block == 0, (K, pack_block)
    hb = pack_block // 2
    w = w_nibbles.reshape(K // pack_block, pack_block, N).astype(np.uint8)
    packed = (w[:, :hb, :] & 0xF) | (w[:, hb:, :] << 4)
    return packed.reshape(K // 2, N)


def pack_rows_tpu_magic(w_nibbles: np.ndarray, pack_block: int) -> np.ndarray:
    """Magic-unpack layout: rows assigned so the kernel's per-byte-class
    extraction yields CONTIGUOUS row blocks.

    The TPU bitcast uint8->int32 packs 4 consecutive SUBLANES per int32
    (byte j of i32 row r' = u8 row 4r'+j, probed empirically).  Within each
    K-superblock of `pack_block` rows, byte-class b = 2j+nib must cover rows
    [b*PB/8, (b+1)*PB/8), so:
        u8[4r'+j, c] = w[(2j)*PB/8 + r', c] | (w[(2j+1)*PB/8 + r', c] << 4)
    """
    K, N = w_nibbles.shape
    pb = pack_block
    assert K % pb == 0 and pb % 8 == 0, (K, pb)
    rpc = pb // 8  # rows per class
    w = w_nibbles.reshape(K // pb, 8, rpc, N).astype(np.uint8)  # [t, class, r', n]
    out = np.zeros((K // pb, rpc, 4, N), np.uint8)  # [t, r', j, n]
    for j in range(4):
        out[:, :, j, :] = (w[:, 2 * j] & 0xF) | (w[:, 2 * j + 1] << 4)
    return out.reshape(K // 2, N)


def pack_rows_tpu_pair(w_nibbles: np.ndarray, pack_block: int) -> np.ndarray:
    """Pair-unpack layout: two bf16 weights per extraction op.

    The kernel computes `((x32 >> 4i) & 0x000F000F) | 0x43004300` and
    bitcasts the i32 lanes to bf16 pairs — 0x4300|nib is exactly `128 + nib`
    in bf16, and the i32→bf16 bitcast unpacks the LOW half to the even
    sublane, HIGH half to the odd (probed on v5e, spike_pair_unpack.py).
    Each pass i ∈ 0..3 must therefore yield the contiguous logical quarter
    block [i·PB/4, (i+1)·PB/4) with even rows from nibble position i and odd
    rows from position i+4:

        i32[r, c] = Σ_i  w[i·PB/4 + 2r, c] << 4i  |  w[i·PB/4 + 2r+1, c] << 4(i+4)

    ~1.5 VPU ops per weight (shift+and+or → 2 outputs, bitcasts free) vs
    ~4 for the round-2 "magic" path — the unpack leaves the VPU critical
    path and the kernel returns to the DMA roofline.
    """
    K, N = w_nibbles.shape
    pb = pack_block
    assert K % pb == 0 and pb % 8 == 0, (K, pb)
    q4 = pb // 4
    R = pb // 8  # i32 rows per superblock
    w = w_nibbles.reshape(K // pb, 4, q4, N).astype(np.uint32)  # [t, i, row, n]
    i32 = np.zeros((K // pb, R, N), np.uint32)
    for i in range(4):
        i32 |= w[:, i, 0::2, :] << (4 * i)
        i32 |= w[:, i, 1::2, :] << (4 * (i + 4))
    # u8 row 4r+j = byte j (bits 8j..8j+7) of i32 row r (little-endian order
    # of the u8→i32 bitcast, probed in pack_rows_tpu_magic's docstring)
    u8 = np.zeros((K // pb, R, 4, N), np.uint8)
    for j in range(4):
        u8[:, :, j, :] = ((i32 >> (8 * j)) & 0xFF).astype(np.uint8)
    return u8.reshape(K // 2, N)


def unpack_rows_tpu_pair(packed: np.ndarray, pack_block: int) -> np.ndarray:
    """Inverse of pack_rows_tpu_pair -> int32 [K, N] (tests)."""
    K2, N = packed.shape
    pb = pack_block
    R = pb // 8
    q4 = pb // 4
    T = K2 // (pb // 2)
    p = packed.reshape(T, R, 4, N).astype(np.uint32)
    i32 = p[:, :, 0] | (p[:, :, 1] << 8) | (p[:, :, 2] << 16) | (p[:, :, 3] << 24)
    out = np.zeros((T, 4, q4, N), np.int32)
    for i in range(4):
        out[:, i, 0::2, :] = ((i32 >> (4 * i)) & 0xF).astype(np.int32)
        out[:, i, 1::2, :] = ((i32 >> (4 * (i + 4))) & 0xF).astype(np.int32)
    return out.reshape(K2 * 2, N)


def unpack_rows_tpu_magic(packed: np.ndarray, pack_block: int) -> np.ndarray:
    """Inverse of pack_rows_tpu_magic -> int32 [K, N] (tests)."""
    K2, N = packed.shape
    pb = pack_block
    rpc = pb // 8
    p = packed.reshape(K2 // (pb // 2), rpc, 4, N)
    out = np.zeros((K2 // (pb // 2), 8, rpc, N), np.int32)
    for j in range(4):
        out[:, 2 * j] = (p[:, :, j] & 0xF).astype(np.int32)
        out[:, 2 * j + 1] = (p[:, :, j] >> 4).astype(np.int32)
    return out.reshape(K2 * 2, N)


def unpack_rows_tpu(packed: np.ndarray, pack_block: int) -> np.ndarray:
    """Inverse of pack_rows_tpu -> int32 [K, N] (for tests)."""
    K2, N = packed.shape
    hb = pack_block // 2
    p = packed.reshape(K2 // hb, hb, N)
    lo = (p & 0xF).astype(np.int32)
    hi = (p >> 4).astype(np.int32)
    return np.concatenate([lo, hi], axis=1).reshape(K2 * 2, N)


def tile_scale_layout(
    per_group: np.ndarray,  # f32 [K/G, N]
    K: int,
    group_size: int,
    pack_block: int,
) -> np.ndarray:
    """Per-group rows -> per-k-tile strips padded to 8 sublanes.

    Output [k_tiles * sr_pad, N]: rows [k*sr_pad, k*sr_pad + sr) hold the
    scale rows covering k-tile k.  When pack_block == 8*G (the preferred
    choice) sr == sr_pad == 8 and this is a pure reshape (no padding).
    """
    k_tiles = K // pack_block
    sr, sr_pad = scale_rows_per_tile(pack_block, group_size)
    N = per_group.shape[1]
    out = np.zeros((k_tiles, sr_pad, N), dtype=per_group.dtype)
    for k in range(k_tiles):
        g0 = (k * pack_block) // group_size
        out[k, :sr] = per_group[g0 : g0 + sr]
    return out.reshape(k_tiles * sr_pad, N)


def convert_awq_tensor(
    qweight_i32: np.ndarray,  # int32 [K, N/8] (AWQ checkpoint layout)
    qzeros_i32: Optional[np.ndarray],  # int32 [K/G, N/8] or None (no zero point)
    scales: np.ndarray,  # fp16/fp32 [K/G, N]
    group_size: int,
    pack_block: Optional[int] = None,
    unpack: str = "cast",  # "cast" | "magic" (must match the kernel's flag)
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """AWQ checkpoint tensors -> (qweight_u8, scales_t, bias, pack_block).

    De-interleaves the AWQ nibble order; scales go to the per-k-tile strip
    layout consumed by the kernel, the folded zero-point term
    bias = zero * scale stays in per-group layout [K/G, N] (consumed by the
    XLA-side `awq_zero_correction`).  With unpack="magic" the kernel
    reconstructs 128 + nibble via an fp32 exponent trick, so the constant
    128 is folded into the bias here: bias = (zero + 128) * scale.
    """
    K = qweight_i32.shape[0]
    if group_size == -1:
        group_size = K
    if pack_block is None:
        pack_block = choose_pack_block(K, group_size)
    w_nib = unpack_awq_int32(qweight_i32)  # [K, N] logical order
    scales_f32 = scales.astype(np.float32)
    if qzeros_i32 is not None:
        z_nib = unpack_awq_int32(qzeros_i32).astype(np.float32)  # [K/G, N]
    else:
        z_nib = np.zeros_like(scales_f32)
    if unpack == "magic":
        bias_f32 = (z_nib + 128.0) * scales_f32
        qweight_u8 = pack_rows_tpu_magic(w_nib, pack_block)
    elif unpack == "pair":
        # kernel reconstructs 128 + nibble (bf16 0x4300 exponent trick) and
        # cancels the whole (zero+128)*scale term IN the per-group epilogue
        # as an f32 rank-1 subtract (see pair_tile_matmul); the bias ships
        # in the same per-k-tile strip layout as the scales
        bias_f32 = tile_scale_layout(
            (z_nib + 128.0) * scales_f32, K, group_size, pack_block
        )
        qweight_u8 = pack_rows_tpu_pair(w_nib, pack_block)
    else:
        bias_f32 = z_nib * scales_f32
        qweight_u8 = pack_rows_tpu(w_nib, pack_block)
    scales_t = tile_scale_layout(scales_f32, K, group_size, pack_block)
    return qweight_u8, scales_t, bias_f32, pack_block


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _awq_matmul_kernel(
    layer_ref, x_ref, qw_ref, s_ref, o_ref, *, pack_block, group_size, unpack
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        o_ref[:] = jnp.zeros_like(o_ref)

    x = x_ref[:]
    sr, _ = scale_rows_per_tile(pack_block, group_size)

    if unpack == "pair":
        # Two bf16 weights per extraction: ((x32 >> 4i) & 0x000F000F) |
        # 0x43004300 holds (128+nib_i, 128+nib_{i+4}) in its two halves;
        # the i32→bf16 bitcast (low→even sublane) then yields the contiguous
        # logical quarter block [i·PB/4, (i+1)·PB/4) by converter layout.
        # The +128 is folded into the zero bias at conversion.
        x32 = pltpu.bitcast(qw_ref[0], jnp.int32)  # [PB/8, BN]
        q4 = pack_block // 4
        acc = [o_ref[:], None]
        for i in range(4):
            y = (x32 >> (4 * i)) if i else x32
            y = (y & 0x000F000F) | 0x43004300
            wb = pltpu.bitcast(y, jnp.bfloat16)  # [PB/4, BN]
            gpp = q4 // group_size if q4 >= group_size else 0
            if gpp >= 1:
                for g in range(gpp):
                    part = jnp.dot(
                        x[:, i * q4 + g * group_size : i * q4 + (g + 1) * group_size],
                        wb[g * group_size : (g + 1) * group_size, :],
                        preferred_element_type=jnp.float32,
                    )
                    term = part * s_ref[0, i * gpp + g : i * gpp + g + 1, :]
                    j = (i * gpp + g) % 2
                    acc[j] = term if acc[j] is None else acc[j] + term
            else:
                # quarter block inside one group
                part = jnp.dot(
                    x[:, i * q4 : (i + 1) * q4], wb,
                    preferred_element_type=jnp.float32,
                )
                srow = (i * q4) // group_size
                term = part * s_ref[0, srow : srow + 1, :]
                acc[i % 2] = term if acc[i % 2] is None else acc[i % 2] + term
        o_ref[:] = acc[0] if acc[1] is None else acc[0] + acc[1]
        return

    if unpack == "magic":
        # fp32 exponent trick: 0x4300|nib in the top f32 halfword = 128+nib
        # exactly; the +128 is folded into the zero bias at conversion.
        # bitcast u8 [PB/2, BN] -> i32 [PB/8, BN]: byte j = packed row 4r'+j,
        # each byte-class a contiguous PB/8-row block (converter layout).
        x32 = pltpu.bitcast(qw_ref[0], jnp.int32)
        rpc = pack_block // 8  # rows per class
        acc = o_ref[:]
        for b in range(8):
            j, nib = b // 2, b % 2
            bit = 8 * j + 4 * nib
            if bit <= 16:
                y = (x32 << (16 - bit)) & 0x000F0000
            else:
                y = (x32 >> (bit - 16)) & 0x000F0000
            wb = pltpu.bitcast(y | 0x43000000, jnp.float32).astype(jnp.bfloat16)
            gpc = rpc // group_size if rpc >= group_size else 0
            if gpc > 1:
                # class spans several groups: scale each group's dot
                for g in range(gpc):
                    row0 = b * rpc + g * group_size
                    pg = jnp.dot(
                        x[:, row0 : row0 + group_size],
                        wb[g * group_size : (g + 1) * group_size, :],
                        preferred_element_type=jnp.float32,
                    )
                    acc = acc + pg * s_ref[0, b * gpc + g : b * gpc + g + 1, :]
            else:
                part = jnp.dot(
                    x[:, b * rpc : (b + 1) * rpc], wb,
                    preferred_element_type=jnp.float32,
                )
                srow = b if gpc == 1 else (b * rpc) // group_size
                acc = acc + part * s_ref[0, srow : srow + 1, :]
        o_ref[:] = acc
        return

    if pack_block >= group_size and sr >= 2:
        # Unpack PER GROUP, interleaved with the dots: group i's dot only
        # depends on group i's unpack, so Mosaic's scheduler overlaps the
        # VPU dequant of group i+1 with the MXU dot of group i.  (The
        # previous whole-tile unpack -> all-dots structure serialized the
        # two units: ~265 us/layer vs ~150 at max(DMA, MXU) floor.)
        # Byte row r packs logical rows r (lo nibble) and r + PB/2 (hi).
        g = group_size
        sr2 = sr // 2
        # two accumulators break the serial add chain (more MXU/VPU ILP)
        acc = [o_ref[:], None]
        for i in range(sr):
            if i < sr2:
                w8 = qw_ref[0, i * g : (i + 1) * g, :].astype(jnp.int32)
                wb = (w8 & 0xF).astype(jnp.bfloat16)
            else:
                w8 = qw_ref[0, (i - sr2) * g : (i - sr2 + 1) * g, :].astype(
                    jnp.int32
                )
                wb = (w8 >> 4).astype(jnp.bfloat16)
            part = jnp.dot(
                x[:, i * g : (i + 1) * g],
                wb,
                preferred_element_type=jnp.float32,
            )
            term = part * s_ref[0, i : i + 1, :]
            j = i % 2
            acc[j] = term if acc[j] is None else acc[j] + term
        o_ref[:] = acc[0] if acc[1] is None else acc[0] + acc[1]
    else:
        # whole k-tile inside one group (pack_block <= group_size, or the
        # sr == 1 edge where a single group needs both nibble halves)
        w8 = qw_ref[0].astype(jnp.int32)
        wb = jnp.concatenate([w8 & 0xF, w8 >> 4], axis=0).astype(jnp.bfloat16)
        part = jnp.dot(x, wb, preferred_element_type=jnp.float32)
        o_ref[:] += part * s_ref[0, :1, :]


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size",
        "pack_block",
        "block_m",
        "block_n",
        "out_dtype",
        "interpret",
        "unpack",
    ),
)
def awq_matmul_raw(
    x: jax.Array,  # [M, K] bf16
    qweight: jax.Array,  # [L, K/2, N] uint8 (TPU layout)
    scales: jax.Array,  # [L, k_tiles * sr_pad, N] f32
    layer: jax.Array,  # [] or [1] int32 — which layer of the stack
    *,
    group_size: int,
    pack_block: int,
    block_m: int = 512,
    block_n: int = 2048,
    out_dtype=jnp.float32,
    interpret: Optional[bool] = None,
    unpack: str = "cast",
) -> jax.Array:
    """Y[M, N] = X @ unpack(qweight[layer]) * scales  (no zero-point term;
    for unpack="magic" the caller's bias must carry the folded +128 term).

    Callers normally use `awq_matmul` which adds the zero correction.
    """
    if interpret is None:
        interpret = pallas_interpret_default()
    M, K = x.shape
    L, K2, N = qweight.shape
    assert K2 == K // 2, (qweight.shape, x.shape)
    assert K % pack_block == 0

    bm = min(block_m, round_up(M, 8))
    bn = min(block_n, N)
    assert N % bn == 0, (N, bn)

    m_pad = round_up(M, bm)
    if m_pad != M:
        x = jnp.pad(x, ((0, m_pad - M), (0, 0)))

    k_tiles = K // pack_block
    _, sr_pad = scale_rows_per_tile(pack_block, group_size)
    assert scales.shape == (L, k_tiles * sr_pad, N), (scales.shape, k_tiles, sr_pad)

    # Clamp: an out-of-range index would drive the block DMA out of bounds
    # (opaque device-internal error observed on TPU).
    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // bm, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((bm, pack_block), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, pack_block // 2, bn), lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, bn), lambda m, n, k, lr: (lr[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
    )
    out = pl.pallas_call(
        functools.partial(
            _awq_matmul_kernel,
            pack_block=pack_block,
            group_size=group_size,
            unpack=unpack,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * K * N,
            bytes_accessed=K * N // 2 + m_pad * K * 2 + m_pad * N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer, x, qweight, scales)
    if m_pad != M:
        out = out[:M]
    return out.astype(out_dtype)


def pair_tile_matmul(x, qw_u8, s_rows, b_rows, *, pack_block, group_size):
    """One K-superblock of the pair-layout AWQ matmul, inside a kernel.

    x [BM, PB] bf16, qw_u8 [PB/2, BN] (pair layout), s_rows/b_rows
    [>=sr, BN] f32 strip rows for this tile -> [BM, BN] f32 including the
    zero-point correction (group sums taken from the same x).

    Round-4 structure (spike_pair_opt.py, on-chip A/B at M=64):
    * The unpacked weights hold 128 + nib; the whole zero-point term
      (zero+128)*scale is cancelled in the per-group EPILOGUE as an f32
      rank-1 subtract: `term = part*s_g - xs_g * c_g` with c = (z+128)*s
      shipped in the bias strips.  The cancellation is f32-exact (both
      `part`'s implicit 128*sum(x_g) and `xs_g` are f32 sums of exact bf16
      values), so there is NO correction matmul at all.  The round-3
      alternative (correction dot over the (z+128)*s bias) needed HIGHEST
      (6-pass) MXU precision to cancel the +128 term accurately, which
      measured ~55 us/layer (~1.7 ms/step at 32 layers): 259 (base) vs
      220 (this) vs 202 (epilogue-128 + default-precision dot, but that
      leaves 0.24% RMS output noise) us/layer for the four Llama-3-8B
      decode projections; on-chip max error vs the f32 oracle stays at the
      1e-4 level of the round-3 HIGHEST scheme.
    """
    sr, _ = scale_rows_per_tile(pack_block, group_size)
    q4 = pack_block // 4
    if qw_u8.dtype == jnp.int32:
        x32 = qw_u8  # caller pre-bitcast the whole block (see pair_proj_chunk)
    else:
        x32 = pltpu.bitcast(qw_u8, jnp.int32)  # [PB/8, BN]

    def unpack(i):
        y = (x32 >> (4 * i)) if i else x32
        y = (y & 0x000F000F) | 0x43004300
        return pltpu.bitcast(y, jnp.bfloat16)  # quarter block [PB/4, BN]

    gpp = q4 // group_size if q4 >= group_size else 0
    acc = [None, None]
    for i in range(4):
        wb = unpack(i)
        if gpp >= 1:
            for g in range(gpp):
                gi = i * gpp + g
                xg = x[:, gi * group_size : (gi + 1) * group_size]
                xs_g = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
                part = jnp.dot(
                    xg,
                    wb[g * group_size : (g + 1) * group_size, :],
                    preferred_element_type=jnp.float32,
                )
                term = part * s_rows[gi : gi + 1, :] - xs_g * b_rows[gi : gi + 1, :]
                acc[gi % 2] = term if acc[gi % 2] is None else acc[gi % 2] + term
        else:
            # quarter block inside one group: the quarter-partial x sums
            # add up to the group sum across i, so subtracting the rank-1
            # zero term per quarter still cancels exactly
            xq = jnp.sum(
                x[:, i * q4 : (i + 1) * q4].astype(jnp.float32),
                axis=1, keepdims=True,
            )
            part = jnp.dot(
                x[:, i * q4 : (i + 1) * q4], wb,
                preferred_element_type=jnp.float32,
            )
            srow = (i * q4) // group_size
            term = part * s_rows[srow : srow + 1, :] - xq * b_rows[srow : srow + 1, :]
            acc[i % 2] = term if acc[i % 2] is None else acc[i % 2] + term

    return acc[0] if acc[1] is None else acc[0] + acc[1]


def pair_proj_chunk(x, qw_u8, s_strip, b_strip, *, pack_block, group_size):
    """Multi-superblock pair-layout projection inside a kernel.

    x [BM, Kc] bf16, qw_u8 [Kc/2, BN], strips [(Kc/PB)*sr_pad, BN] f32
    -> [BM, BN] f32 (zero-corrected).
    """
    Kc = x.shape[1]
    kt = Kc // pack_block
    _, sr_pad = scale_rows_per_tile(pack_block, group_size)
    # Bitcast the WHOLE block once, slice int32 rows per superblock: Mosaic
    # miscompiles bitcast applied to sublane-offset slices of a loaded block
    # (NaN/crash observed on-chip; whole-block bitcast is the proven path in
    # _awq_pair_fused_kernel).
    x32_full = pltpu.bitcast(qw_u8, jnp.int32)  # [Kc/8, BN]
    r8 = pack_block // 8
    total = None
    for t in range(kt):
        term = pair_tile_matmul(
            x[:, t * pack_block : (t + 1) * pack_block],
            x32_full[t * r8 : (t + 1) * r8, :],
            s_strip[t * sr_pad : (t + 1) * sr_pad, :],
            b_strip[t * sr_pad : (t + 1) * sr_pad, :],
            pack_block=pack_block,
            group_size=group_size,
        )
        total = term if total is None else total + term
    return total


def _awq_pair_fused_kernel(
    layer_ref, x_ref, qw_ref, s_ref, b_ref, o_ref, acc_ref,
    *, pack_block, group_size, k_tiles,
):
    """Pair unpack + in-kernel zero-correction + bf16 output.

    The round-2 design hoisted the zero term into an XLA matmul over the f32
    kernel output — an extra [M, N] f32 round trip per projection (~27 MB/
    layer at bs=64) plus an optimization_barrier to keep both sides reading
    bit-identical x.  Here the correction's per-group sums of x come from the
    SAME VMEM block the dots consume (bit-identical by construction), the
    accumulator lives in f32 VMEM scratch, and the HBM output is bf16.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += pair_tile_matmul(
        x_ref[:], qw_ref[0], s_ref[0], b_ref[0],
        pack_block=pack_block, group_size=group_size,
    )

    @pl.when(k == k_tiles - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "pack_block", "block_m", "block_n", "out_dtype",
        "interpret",
    ),
)
def awq_matmul_pair_fused(
    x: jax.Array,  # [M, K] bf16
    qweight: jax.Array,  # [L, K/2, N] uint8 (pair layout)
    scales: jax.Array,  # [L, k_tiles * sr_pad, N] f32
    bias: jax.Array,  # [L, k_tiles * sr_pad, N] f32 ((zero+128)*scale strips)
    layer: jax.Array,
    *,
    group_size: int,
    pack_block: int,
    block_m: int = 512,
    block_n: int = 2048,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Full AWQ linear (pair layout): Y = X @ ((W_int4 - zero) * scale)."""
    if interpret is None:
        interpret = pallas_interpret_default()
    M, K = x.shape
    L, K2, N = qweight.shape
    assert K2 == K // 2, (qweight.shape, x.shape)
    assert K % pack_block == 0

    bm = min(block_m, round_up(M, 8))
    bn = min(block_n, N)
    assert N % bn == 0, (N, bn)

    m_pad = round_up(M, bm)
    if m_pad != M:
        x = jnp.pad(x, ((0, m_pad - M), (0, 0)))

    k_tiles = K // pack_block
    _, sr_pad = scale_rows_per_tile(pack_block, group_size)
    assert scales.shape == (L, k_tiles * sr_pad, N), (scales.shape, k_tiles, sr_pad)
    assert bias.shape == scales.shape, (bias.shape, scales.shape)

    layer = jnp.clip(jnp.asarray(layer, jnp.int32).reshape(1), 0, L - 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_pad // bm, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((bm, pack_block), lambda m, n, k, lr: (m, k)),
            pl.BlockSpec((1, pack_block // 2, bn), lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, bn), lambda m, n, k, lr: (lr[0], k, n)),
            pl.BlockSpec((1, sr_pad, bn), lambda m, n, k, lr: (lr[0], k, n)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda m, n, k, lr: (m, n)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(
            _awq_pair_fused_kernel,
            pack_block=pack_block,
            group_size=group_size,
            k_tiles=k_tiles,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, N), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * K * N,
            bytes_accessed=K * N // 2 + m_pad * K * 2 + m_pad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(layer, x, qweight, scales, bias)
    if m_pad != M:
        out = out[:M]
    return out


def awq_group_sums(x: jax.Array, group_size: int) -> jax.Array:
    """Per-group sums of x along K: [M, K] -> [M, K/G] f32."""
    M, K = x.shape
    g = min(group_size, K)
    return jnp.sum(x.astype(jnp.float32).reshape(M, K // g, g), axis=-1)


def awq_zero_correction(
    x: jax.Array, bias: jax.Array, layer: jax.Array, group_size: int
) -> jax.Array:
    """groupsum(X) @ bias[layer] — the zero-point term of the AWQ matmul.

    Precision HIGHEST: XLA otherwise lowers the f32 dot to bf16 passes, and
    with the magic-unpack +128 folded into the bias the absolute rounding
    error (one bf16 ULP at 128*scale magnitude) dominates the result.
    """
    xg = awq_group_sums(x, group_size)
    b = jax.lax.dynamic_index_in_dim(bias, layer, axis=0, keepdims=False)
    return jnp.dot(
        xg, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size",
        "pack_block",
        "block_m",
        "block_n",
        "out_dtype",
        "interpret",
        "unpack",
    ),
)
def awq_matmul(
    x: jax.Array,  # [M, K] bf16
    qweight: jax.Array,  # [L, K/2, N] uint8
    scales: jax.Array,  # [L, k_tiles * sr_pad, N] f32
    bias: jax.Array,  # [L, K/G, N] f32  (zero * scale)
    layer: jax.Array | int = 0,
    *,
    group_size: int,
    pack_block: int,
    block_m: int = 512,
    block_n: int = 2048,
    out_dtype=jnp.bfloat16,
    interpret: Optional[bool] = None,
    unpack: str = "cast",
) -> jax.Array:
    """Full AWQ linear: Y = X @ ((W_int4 - zero) * scale) for one layer."""
    if unpack == "pair":
        return awq_matmul_pair_fused(
            x, qweight, scales, bias, layer,
            group_size=group_size, pack_block=pack_block,
            block_m=block_m, block_n=block_n, out_dtype=out_dtype,
            interpret=interpret,
        )
    # The zero correction MUST see bit-identical x to what the kernel reads:
    # without the barrier XLA fuses x's producer (e.g. rms_norm) into the
    # groupsum branch and recomputes it in f32, so the correction's sum(x)
    # differs from the kernel's implicit sum(x) by ~2^-9 relative — an error
    # amplified by |bias| (catastrophic for unpack="magic", whose bias
    # carries the folded +128*scale term).
    x = jax.lax.optimization_barrier(x)
    layer = jnp.asarray(layer, jnp.int32)
    y = awq_matmul_raw(
        x,
        qweight,
        scales,
        layer,
        group_size=group_size,
        pack_block=pack_block,
        block_m=block_m,
        block_n=block_n,
        out_dtype=jnp.float32,
        interpret=interpret,
        unpack=unpack,
    )
    y = y - awq_zero_correction(x, bias, layer, group_size)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# XLA fallback (CPU tests, and a baseline to beat on TPU)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("group_size", "pack_block", "out_dtype", "unpack")
)
def dequantize_xla(
    qweight: jax.Array,  # [K/2, N] uint8 TPU layout (single layer)
    scales: jax.Array,  # [k_tiles * sr_pad, N] f32 (tile_scale_layout)
    bias: jax.Array,  # [K/G, N] f32
    *,
    group_size: int,
    pack_block: int,
    out_dtype=jnp.bfloat16,
    unpack: str = "cast",
) -> jax.Array:
    K2, N = qweight.shape
    K = K2 * 2
    hb = pack_block // 2
    k_tiles = K // pack_block
    sr, sr_pad = scale_rows_per_tile(pack_block, group_size)
    if unpack == "pair":
        R = pack_block // 8
        q4 = pack_block // 4
        p = qweight.reshape(k_tiles, R, 4, N).astype(jnp.uint32)
        i32 = p[:, :, 0] | (p[:, :, 1] << 8) | (p[:, :, 2] << 16) | (p[:, :, 3] << 24)
        blocks = []
        for i in range(4):
            lo = (i32 >> (4 * i)) & 0xF  # even rows of quarter block i
            hi = (i32 >> (4 * (i + 4))) & 0xF  # odd rows
            blocks.append(jnp.stack([lo, hi], axis=2).reshape(k_tiles, q4, N))
        w = jnp.concatenate(blocks, axis=1).astype(jnp.float32) + 128.0
    elif unpack == "magic":
        rpc = pack_block // 8
        p = qweight.reshape(k_tiles, rpc, 4, N).astype(jnp.int32)
        classes = []
        for j in range(4):
            classes.append(p[:, :, j] & 0xF)
            classes.append(p[:, :, j] >> 4)
        # class b covers rows [b*rpc, (b+1)*rpc)
        w = jnp.stack(classes, axis=1).reshape(k_tiles, pack_block, N)
        w = w.astype(jnp.float32) + 128.0  # kernel reconstructs 128 + nibble
    else:
        p = qweight.reshape(k_tiles, hb, N).astype(jnp.int32)
        w = jnp.concatenate([p & 0xF, p >> 4], axis=1).astype(jnp.float32)
    rep = min(group_size, pack_block)
    s = scales.reshape(k_tiles, sr_pad, N)[:, :sr, :]
    s = jnp.repeat(s, rep, axis=1)  # [kt, PB, N]
    if unpack == "pair":
        # pair bias ships in the same per-k-tile strip layout as the scales
        b = bias.reshape(k_tiles, sr_pad, N)[:, :sr, :]
        b = jnp.repeat(b, rep, axis=1)  # [kt, PB, N]
    else:
        g = min(group_size, K)
        b = jnp.repeat(bias, g, axis=0).reshape(k_tiles, pack_block, N)
    return ((w * s).reshape(K, N) - b.reshape(K, N)).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "pack_block", "out_dtype", "unpack")
)
def awq_matmul_xla(
    x: jax.Array,
    qweight: jax.Array,  # [L, K/2, N]
    scales: jax.Array,
    bias: jax.Array,
    layer: jax.Array | int = 0,
    *,
    group_size: int,
    pack_block: int,
    out_dtype=jnp.bfloat16,
    unpack: str = "cast",
) -> jax.Array:
    li = jnp.asarray(layer, jnp.int32)
    qw = jax.lax.dynamic_index_in_dim(qweight, li, axis=0, keepdims=False)
    s = jax.lax.dynamic_index_in_dim(scales, li, axis=0, keepdims=False)
    b = jax.lax.dynamic_index_in_dim(bias, li, axis=0, keepdims=False)
    w = dequantize_xla(
        qw, s, b, group_size=group_size, pack_block=pack_block, unpack=unpack
    )
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(out_dtype)
