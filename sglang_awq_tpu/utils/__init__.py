"""Small shared utilities."""

from __future__ import annotations

import logging
import os
import time
from typing import Iterable, List, Sequence

import jax

logger = logging.getLogger("sglang_awq_tpu")


def configure_logger(level: str = "INFO"):
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="[%(asctime)s %(name)s %(levelname)s] %(message)s",
        datefmt="%H:%M:%S",
    )


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n; raises if n exceeds the largest bucket."""
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"value {n} exceeds largest bucket {buckets[-1]}")


def default_decode_bs_buckets(max_bs: int) -> List[int]:
    """Bucket table for decode batch sizes.

    Mirrors the shape of the reference's cuda-graph bucket table
    (`server_args.py:927-950`): dense at small sizes, strided above.
    """
    table = [1, 2, 4, 8, 16, 24, 32, 48, 64, 96, 128, 160, 192, 256, 320, 384, 448, 512]
    return [b for b in table if b <= max(max_bs, 1)] or [1]


def default_prefill_token_buckets(max_tokens: int) -> List[int]:
    table = [128, 256, 512, 1024, 2048, 4096, 8192, 16384, 32768]
    out = [b for b in table if b <= max(max_tokens, 128)]
    if not out:
        out = [128]
    if out[-1] < max_tokens:
        out.append(next_power_of_2(max_tokens))
    return out


def is_tpu_backend() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_interpret_default() -> bool:
    """Run Pallas kernels in interpreter mode off-TPU (CI / CPU tests)."""
    if os.environ.get("SGLT_PALLAS_INTERPRET"):
        return os.environ["SGLT_PALLAS_INTERPRET"].lower() in ("1", "true")
    return not is_tpu_backend()


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0
