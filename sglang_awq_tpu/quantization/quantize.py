"""Offline bf16 -> AWQ INT4 checkpoint quantizer.

Reference role: the `quantize_and_serve` path (`configs/model_config.py:102`)
plus the offline recipe the reference docs point at
(`docs/advanced_features/quantization.md:115-146`, llmcompressor/AutoAWQ).
The zero-egress image cannot run AutoAWQ's activation-aware scale search
against a calibration set, so this implements the group-wise asymmetric
round-to-nearest (RTN) projection that AWQ checkpoints ultimately store —
the same tensor schema (`qweight`/`qzeros`/`scales`, interleaved int32
nibbles, reference `layers/quantization/awq.py:362-427`), making the output
indistinguishable from a real AWQ checkpoint to every loader.

Round-trip guarantee: `dequant(quantize(w)) - w` is bounded by scale/2
elementwise — asserted by tests/test_awq_quality.py, and end-to-end by
serving the bf16 and quantized tiny checkpoints side by side.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from sglang_awq_tpu.quantization.awq_config import pack_awq_reference

# projections quantized by AWQ checkpoints (embeddings / norms / lm_head
# stay high precision, matching modules_to_not_convert conventions)
QUANT_SUFFIXES = (
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
)


def quantize_weight_rtn(
    w: np.ndarray,  # [K, N] float (K = input features), torch layout is [N, K].T
    group_size: int = 128,
    zero_point: bool = True,
) -> Dict[str, np.ndarray]:
    """Group-wise asymmetric 4-bit RTN -> AWQ checkpoint tensors.

    Returns {"qweight": int32 [K, N/8], "qzeros": int32 [K/G, N/8],
    "scales": fp16 [K/G, N]}.  Dequant semantics (awq_dequantize_ref):
    W[k, n] = (nib[k, n] - zero[k//G, n]) * scale[k//G, n].
    """
    K, N = w.shape
    G = group_size if group_size != -1 else K
    assert K % G == 0, (K, G)
    assert N % 8 == 0, N
    wf = w.astype(np.float64)
    g = wf.reshape(K // G, G, N)
    wmax = g.max(axis=1)  # [K/G, N]
    wmin = g.min(axis=1)
    if zero_point:
        scale = np.maximum((wmax - wmin) / 15.0, 1e-10)
        zero = np.clip(np.round(-wmin / scale), 0, 15)
    else:
        scale = np.maximum(np.abs(g).max(axis=1) / 7.0, 1e-10)
        zero = np.full_like(scale, 8.0)
    # fp16 is the checkpoint storage dtype — quantize against what loaders
    # will actually multiply by
    scale16 = scale.astype(np.float16)
    q = np.clip(
        np.round(g / scale16.astype(np.float64)[:, None, :])
        + zero[:, None, :],
        0,
        15,
    ).astype(np.int32)
    qweight = pack_awq_reference(q.reshape(K, N))
    qzeros = pack_awq_reference(zero.astype(np.int32))
    return {"qweight": qweight, "qzeros": qzeros, "scales": scale16}


def dequantize_rtn(t: Dict[str, np.ndarray], group_size: int) -> np.ndarray:
    from sglang_awq_tpu.quantization.awq_config import awq_dequantize_ref

    return awq_dequantize_ref(
        t["qweight"], t["scales"], t["qzeros"], group_size
    )


def _iter_checkpoint(model_path: str) -> Iterable[Tuple[str, np.ndarray]]:
    from sglang_awq_tpu.model_loader.loader import iterate_safetensors

    yield from iterate_safetensors(model_path)


def quantize_checkpoint(
    model_path: str,
    out_path: str,
    group_size: int = 128,
    zero_point: bool = True,
    modules_to_not_convert: Optional[list] = None,
) -> Dict[str, int]:
    """bf16/fp16 HF checkpoint -> AWQ checkpoint directory.

    Writes model.safetensors with qweight/qzeros/scales per quantized linear,
    copies everything else verbatim, and stamps `quantization_config` into
    config.json so `detect_quant_config` recognizes the output.
    """
    from safetensors.numpy import save_file

    os.makedirs(out_path, exist_ok=True)
    skip = tuple(modules_to_not_convert or ())
    out: Dict[str, np.ndarray] = {}
    stats = {"quantized": 0, "kept": 0}
    for name, tensor in _iter_checkpoint(model_path):
        base = name[: -len(".weight")] if name.endswith(".weight") else ""
        is_linear = base.endswith(QUANT_SUFFIXES) and tensor.ndim == 2
        excluded = any(s in name for s in skip)
        if is_linear and not excluded:
            # torch checkpoints store [out, in]; AWQ layout is [K=in, ...]
            t = quantize_weight_rtn(
                np.ascontiguousarray(tensor.T.astype(np.float32)),
                group_size=group_size,
                zero_point=zero_point,
            )
            out[base + ".qweight"] = t["qweight"]
            out[base + ".qzeros"] = t["qzeros"]
            out[base + ".scales"] = t["scales"]
            stats["quantized"] += 1
        else:
            out[name] = tensor
            stats["kept"] += 1
    save_file(out, os.path.join(out_path, "model.safetensors"))

    with open(os.path.join(model_path, "config.json")) as f:
        cfg = json.load(f)
    cfg["quantization_config"] = {
        "quant_method": "awq",
        "bits": 4,
        "group_size": group_size,
        "zero_point": zero_point,
        "version": "gemm",
        **(
            {"modules_to_not_convert": list(modules_to_not_convert)}
            if modules_to_not_convert
            else {}
        ),
    }
    with open(os.path.join(out_path, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)
    # tokenizer & generation config ride along
    for fname in os.listdir(model_path):
        if fname.endswith((".json", ".model", ".txt")) and fname != "config.json":
            src = os.path.join(model_path, fname)
            if os.path.isfile(src):
                shutil.copy(src, os.path.join(out_path, fname))
    return stats


def main():  # pragma: no cover
    import argparse

    ap = argparse.ArgumentParser(
        description="Quantize a bf16 HF checkpoint to AWQ INT4 (group RTN)"
    )
    ap.add_argument("model_path")
    ap.add_argument("out_path")
    ap.add_argument("--group-size", type=int, default=128)
    ap.add_argument("--no-zero-point", action="store_true")
    ap.add_argument("--skip", nargs="*", default=None,
                    help="module substrings to keep unquantized")
    args = ap.parse_args()
    stats = quantize_checkpoint(
        args.model_path, args.out_path, group_size=args.group_size,
        zero_point=not args.no_zero_point,
        modules_to_not_convert=args.skip,
    )
    print(json.dumps(stats))


if __name__ == "__main__":  # pragma: no cover
    main()
