"""AWQ quantization config + checkpoint-layout semantics.

Reference semantics (see SURVEY.md §2.5 / §A.1, reference
`python/sglang/srt/layers/quantization/awq.py:89-158,362-427`):

* HF checkpoints carry `quantization_config` (or a side file
  `quant_config.json` / `quantize_config.json`) with keys
  `quant_method == "awq"`, `w_bit|bits` (must be 4), `q_group_size|group_size`,
  `zero_point`, optional `modules_to_not_convert`.
* Tensor layout per linear of logical shape [K, N] (K = input features):
    qweight : int32 [K, N/8]    8 nibbles per int32, packed along N
    qzeros  : int32 [K/G, N/8]
    scales  : fp16  [K/G, N]
  The nibble order inside each int32 is AWQ-interleaved; logical column order
  is recovered with AWQ_REVERSE_ORDER = [0,4,1,5,2,6,3,7] applied to the
  unpacked nibble stream (reference `test/srt/quant/test_awq_dequant.py:24-29`).
* Dequant: W[k, n] = (nibble[k, n] - zero[k//G, n]) * scale[k//G, n].

TPU design decision (SURVEY.md §A.1 "TPU decision"): the de-interleave is done
ONCE at checkpoint-load time by `model_loader/awq_convert.py`, producing a
TPU-friendly packed layout so the Pallas kernel needs no permutation network.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import numpy as np

# Undo AWQ's within-int32 nibble interleave ([0,2,4,6,1,3,5,7] storage order).
AWQ_REVERSE_ORDER = [0, 4, 1, 5, 2, 6, 3, 7]
AWQ_PACK_FACTOR = 8  # 32 bits / 4 bits


@dataclasses.dataclass
class AWQConfig:
    weight_bits: int = 4
    group_size: int = 128
    zero_point: bool = True
    modules_to_not_convert: Optional[List[str]] = None

    name: str = "awq"

    def __post_init__(self):
        if self.weight_bits != 4:
            # matches reference awq.py:108 (only 4-bit supported)
            raise ValueError(
                f"AWQ supports 4-bit weights only, got {self.weight_bits}"
            )
        self.pack_factor = 32 // self.weight_bits

    @classmethod
    def from_config(cls, cfg: Dict[str, Any]) -> "AWQConfig":
        """Parse an HF quantization_config dict (reference awq.py:143-158)."""

        def get_any(keys, default=None, required=False):
            for k in keys:
                if k in cfg and cfg[k] is not None:
                    return cfg[k]
            if required:
                raise KeyError(f"AWQ config missing one of {keys}")
            return default

        return cls(
            weight_bits=int(get_any(["w_bit", "bits"], required=True)),
            group_size=int(get_any(["q_group_size", "group_size"], required=True)),
            zero_point=bool(get_any(["zero_point"], default=True)),
            modules_to_not_convert=get_any(["modules_to_not_convert"], default=None),
        )

    def is_module_excluded(self, prefix: str) -> bool:
        if not self.modules_to_not_convert:
            return False
        return any(m in prefix for m in self.modules_to_not_convert)


def detect_quant_config(model_path: str, hf_config: Dict[str, Any]) -> Optional[AWQConfig]:
    """Detect quantization from HF config.json or side files.

    Mirrors the reference's detection order (`awq.py:143-148` + ModelConfig
    quant detection `configs/model_config.py:83`): inline
    `quantization_config` first, then quant_config.json / quantize_config.json.
    """
    qcfg = hf_config.get("quantization_config")
    if qcfg is None:
        for fname in ("quant_config.json", "quantize_config.json"):
            fpath = os.path.join(model_path, fname)
            if os.path.exists(fpath):
                with open(fpath) as f:
                    qcfg = json.load(f)
                break
    if qcfg is None:
        return None
    method = str(qcfg.get("quant_method", "awq")).lower()
    if method not in ("awq", "awq_marlin"):
        raise ValueError(f"unsupported quant_method {method!r} (only awq)")
    return AWQConfig.from_config(qcfg)


# ---------------------------------------------------------------------------
# Pure-numpy reference semantics (ground truth for kernels & converter tests;
# mirrors reference test/srt/quant/test_awq_dequant.py:32-60).
# ---------------------------------------------------------------------------


def unpack_awq_int32(packed: np.ndarray) -> np.ndarray:
    """Unpack AWQ int32 [..., C] -> nibbles [..., C*8] in LOGICAL column order.

    Applies the reverse-order de-interleave.
    """
    assert packed.dtype in (np.int32, np.uint32)
    u = packed.astype(np.uint32)
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    nib = (u[..., :, None] >> shifts[None, :]) & 0xF  # [..., C, 8] storage order
    nib = nib[..., AWQ_REVERSE_ORDER]  # logical order within each int32
    return nib.reshape(*packed.shape[:-1], packed.shape[-1] * 8).astype(np.int32)


def awq_dequantize_ref(
    qweight: np.ndarray,  # int32 [K, N/8]
    scales: np.ndarray,  # fp16/fp32 [K/G, N]
    qzeros: np.ndarray,  # int32 [K/G, N/8]
    group_size: int,
) -> np.ndarray:
    """Ground-truth dequantization -> float32 [K, N]."""
    K = qweight.shape[0]
    if group_size == -1:
        group_size = K
    iweights = unpack_awq_int32(qweight)  # [K, N]
    zeros = unpack_awq_int32(qzeros)  # [K/G, N]
    scales_f = scales.astype(np.float32)
    zeros_e = np.repeat(zeros, group_size, axis=0)
    scales_e = np.repeat(scales_f, group_size, axis=0)
    return (iweights.astype(np.float32) - zeros_e.astype(np.float32)) * scales_e


def pack_awq_reference(
    weight_q: np.ndarray,  # int [K, N] values in [0, 15], logical order
) -> np.ndarray:
    """Pack logical int4 values into AWQ's interleaved int32 layout [K, N/8].

    Inverse of `unpack_awq_int32`; used to build synthetic AWQ checkpoints in
    tests and benchmarks.
    """
    K, N = weight_q.shape
    assert N % 8 == 0
    w = weight_q.reshape(K, N // 8, 8).astype(np.uint32)
    # invert the reverse-order permutation: storage[j] = logical[AWQ_ORDER[j]]
    inv = np.argsort(np.array(AWQ_REVERSE_ORDER))
    w = w[:, :, inv]
    shifts = np.arange(0, 32, 4, dtype=np.uint32)
    packed = np.zeros((K, N // 8), dtype=np.uint32)
    for j in range(8):
        packed |= (w[:, :, j] & 0xF) << shifts[j]
    return packed.astype(np.int32)
