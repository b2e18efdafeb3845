"""Linear layers over the stacked-param representation.

Role model: reference `python/sglang/srt/layers/linear.py:135-1212`
(Column/Row/QKV/MergedColumn parallel linears deferring to a quant method's
`apply`).  TPU translation: a linear is a dict of stacked arrays
(leading dim = layer) plus static metadata; `linear_apply` dispatches to the
fused AWQ Pallas kernel or a plain bf16 dot.  TP sharding is declared by a
PartitionSpec per array (consumed by parallel/sharding.py), replacing the
reference's per-rank weight-loader shard arithmetic.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.ops.awq_matmul import (
    awq_matmul,
    awq_matmul_xla,
    choose_pack_block,
    convert_awq_tensor,
    scale_rows_per_tile,
)
from sglang_awq_tpu.quantization.awq_config import AWQConfig
from sglang_awq_tpu.utils import is_tpu_backend


@dataclasses.dataclass(frozen=True)
class LinearSpec:
    """Static description of one (stacked) linear layer."""

    name: str
    in_features: int  # K (full, unsharded)
    out_features: int  # N (full, unsharded)
    quantized: bool
    group_size: int = 128
    pack_block: int = 0
    shard_axis: Optional[str] = None  # "column" (shard N) | "row" (shard K) | None
    unpack: str = "cast"  # "cast" | "magic" (fp32-exponent trick, wide-N wins)
    block_n: int = 0  # AWQ kernel n-block (0 = kernel default)

    @classmethod
    def make(
        cls,
        name: str,
        K: int,
        N: int,
        quant: Optional[AWQConfig],
        shard_axis: Optional[str],
        tp_size: int = 1,
        k_align: int = 0,
    ) -> "LinearSpec":
        if quant is not None:
            g = quant.group_size if quant.group_size != -1 else K
            # row-parallel shards K: the pack block must tile the PER-SHARD K
            # so NamedSharding splits land on superblock boundaries
            k_local = K // tp_size if shard_axis == "row" else K
            n_local = N // tp_size if shard_axis == "column" else N
            # wide-N shapes amortize per-k-step costs over more lanes; 2
            # k-tiles + 4096-wide n-blocks measured fastest in-context
            wide = n_local >= 16384
            pb = choose_pack_block(k_local, g, min_tiles=2 if wide else 4)
            # k_align (MoE expert-merged K): superblocks must tile each
            # expert's K slice so the grouped kernel (ops/moe_grouped.py)
            # can address whole expert blocks
            if k_align and k_align % pb:
                pb = choose_pack_block(k_align, g, min_tiles=2)
            # magic unpack (fp32-exponent trick) measured 770 GB/s vs 390 on
            # wide-N projections but regresses narrow-N ones; per-shard N.
            # SGLT_AWQ_UNPACK=cast|magic overrides the heuristic (perf A/B).
            import os

            mode = os.environ.get("SGLT_AWQ_UNPACK", "auto")
            if mode in ("cast", "magic", "pair"):
                unpack = mode if pb % 8 == 0 or mode == "cast" else "cast"
            else:
                # round 3: pair unpack (two bf16 weights per VPU op triple,
                # in-kernel zero-correction, bf16 output) replaces cast/magic
                # — it removes the per-projection [M, N] f32 round trip the
                # XLA-side correction cost, on every shape
                unpack = "pair" if pb % 8 == 0 else "cast"
            # Isolated-loop per-shape (pb, bn) winners at decode M=64
            # (bench_awq sweep, median timing): qkv 557 @ (2048,3072),
            # o 527 @ (2048,2048) [+13%], down 595 @ (1024,4096),
            # gate_up 617 @ (2048,4096).  In-context A/B LOST (3375 vs
            # 3427 tok/s end-to-end) — the full step's pipelining differs
            # from the isolated loop — so the table is opt-in.
            _TUNED_PB_BN = {
                (4096, 6144): (2048, 3072),
                (4096, 4096): (2048, 2048),
                (14336, 4096): (1024, 4096),
                (4096, 28672): (2048, 4096),
            }
            tuned = (
                _TUNED_PB_BN.get((k_local, n_local))
                if os.environ.get("SGLT_AWQ_TUNED") == "1" else None
            )
            # Per-projection kernel overrides for perf A/Bs:
            #   SGLT_AWQ_TUNE="qkv=cast:1024:2048,down=magic:2048:1024"
            # (name=unpack:pack_block:block_n; 0 keeps the heuristic value).
            bn = 4096 if wide and unpack == "pair" and n_local % 4096 == 0 else 0
            if tuned is not None and unpack == "pair":
                tpb, tbn = tuned
                if k_local % tpb == 0 and n_local % tbn == 0 and (
                    not k_align or k_align % tpb == 0
                ):
                    pb, bn = tpb, tbn
            tune = os.environ.get("SGLT_AWQ_TUNE", "")
            for ent in filter(None, tune.split(",")):
                tname, _, rest = ent.partition("=")
                if tname != name:
                    continue
                up, spb, sbn = (rest.split(":") + ["0", "0"])[:3]
                if up in ("cast", "magic", "pair"):
                    unpack = up
                if int(spb):
                    pb = int(spb)
                bn = int(sbn)
            return cls(name, K, N, True, g, pb, shard_axis, unpack, bn)
        return cls(name, K, N, False, shard_axis=shard_axis)

    def param_shapes(self, num_layers: int, tp_size: int = 1) -> Dict[str, tuple]:
        """Per-device array shapes (after TP sharding)."""
        K, N = self.in_features, self.out_features
        if self.shard_axis == "column":
            N = N // tp_size
        elif self.shard_axis == "row":
            K = K // tp_size
        if not self.quantized:
            return {"weight": ((num_layers, K, N), jnp.bfloat16)}
        kt = K // self.pack_block
        _, sr_pad = scale_rows_per_tile(self.pack_block, self.group_size)
        # pair layout carries the zero bias in the same per-k-tile strip
        # layout as the scales (consumed by the in-kernel correction)
        zb_rows = kt * sr_pad if self.unpack == "pair" else K // self.group_size
        return {
            "qweight": ((num_layers, K // 2, N), jnp.uint8),
            "scales": ((num_layers, kt * sr_pad, N), jnp.float32),
            "zbias": ((num_layers, zb_rows, N), jnp.float32),
        }


def linear_apply(
    spec: LinearSpec,
    params: Dict[str, jax.Array],
    x: jax.Array,  # [M, K_shard] bf16
    layer: jax.Array | int,
    *,
    use_xla: Optional[bool] = None,
) -> jax.Array:
    """Y = X @ W[layer]; bf16 out."""
    if spec.quantized:
        if use_xla is None:
            use_xla = not is_tpu_backend()
        fn = awq_matmul_xla if use_xla else awq_matmul
        return fn(
            x,
            params["qweight"],
            params["scales"],
            params["zbias"],
            layer,
            group_size=spec.group_size,
            pack_block=spec.pack_block,
            out_dtype=jnp.bfloat16,
            unpack=spec.unpack,
            **({"block_n": spec.block_n} if spec.block_n and not use_xla else {}),
        )
    w = jax.lax.dynamic_index_in_dim(params["weight"], jnp.asarray(layer, jnp.int32), 0, keepdims=False)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def mlp_apply(
    spec_gu: LinearSpec,
    p_gu: Dict[str, jax.Array],
    spec_d: LinearSpec,
    p_d: Dict[str, jax.Array],
    x: jax.Array,  # [T, K] bf16
    layer: jax.Array | int,
    act: str = "silu",
) -> jax.Array:
    """down(act(gate(x)) * up(x)) — fused megakernel when eligible.

    Falls back to the two-dispatch path (linear_apply + act) off-TPU, for
    non-pair layouts, biased/LoRA'd layers (callers keep those on the
    fallback), or shapes the fused kernel cannot chunk.
    """
    from sglang_awq_tpu.layers.activation import gelu_and_mul, silu_and_mul

    import os

    I2 = spec_gu.out_features
    # At bf16 MXU rates the fused megakernel is ~neutral-to-slightly-worse
    # (the step is MXU-bound, fusion saves only the intermediate round trip);
    # it wins once the dots are int8 (W4A8) and DMA becomes the floor.
    fused_ok = (
        os.environ.get("SGLT_MLP_FUSED", "0") == "1"
        and is_tpu_backend()
        and spec_gu.quantized
        and spec_d.quantized
        and spec_gu.unpack == "pair"
        and spec_d.unpack == "pair"
        and act in ("silu", "gelu")
        and spec_gu.group_size == spec_d.group_size
        and "bias" not in p_gu
        and "bias" not in p_d
        and x.shape[0] <= 1024
    )
    if fused_ok:
        I_local = p_d.get("qweight").shape[1] * 2  # per-shard intermediate
        pb_d = spec_d.pack_block
        ci = 0
        for c in (4096, 3584, 2048, 1792, 1024, 512, 256, 128):
            if I_local % c == 0 and c % pb_d == 0:
                ci = c
                break
        if ci:
            from sglang_awq_tpu.ops.awq_mlp import awq_mlp_fused

            return awq_mlp_fused(
                x,
                p_gu["qweight"], p_gu["scales"], p_gu["zbias"],
                p_d["qweight"], p_d["scales"], p_d["zbias"],
                layer,
                group_size=spec_gu.group_size,
                pb_gu=spec_gu.pack_block,
                pb_d=pb_d,
                chunk_i=ci,
                act=act,
            )
    gu = linear_apply(spec_gu, p_gu, x, layer)
    a = silu_and_mul(gu) if act == "silu" else gelu_and_mul(gu)
    return linear_apply(spec_d, p_d, a, layer)


def convert_awq_weights_np(
    spec: LinearSpec,
    qweight_i32: np.ndarray,  # [K, N/8] AWQ checkpoint layout (possibly merged)
    qzeros_i32: Optional[np.ndarray],
    scales: np.ndarray,
) -> Dict[str, np.ndarray]:
    """Checkpoint tensors -> device layout arrays for ONE layer (numpy)."""
    qw, st, zb, pb = convert_awq_tensor(
        qweight_i32, qzeros_i32, scales, spec.group_size,
        pack_block=spec.pack_block, unpack=spec.unpack,
    )
    assert pb == spec.pack_block
    return {"qweight": qw, "scales": st, "zbias": zb}


def random_awq_weights_np(
    spec: LinearSpec, rng: np.random.Generator, num_layers: int
) -> Dict[str, np.ndarray]:
    """Random-but-valid device-layout weights (benchmarks; reference
    dummy-random loader `model_loader/loader.py:1178` role)."""
    shapes = spec.param_shapes(num_layers)
    out = {}
    for name, (shape, dtype) in shapes.items():
        if name == "qweight":
            out[name] = rng.integers(0, 256, shape, dtype=np.uint8)
        elif name == "scales":
            out[name] = (rng.standard_normal(shape) * 0.01).astype(np.float32)
        elif name == "zbias":
            out[name] = (rng.standard_normal(shape) * 0.08).astype(np.float32)
        else:
            out[name] = (rng.standard_normal(shape) * 0.02).astype(np.float32)
    return out
