"""Prefill/decode disaggregation.

Role model: reference `python/sglang/srt/disaggregation/` (prefill
instances compute prompt KV and hand requests to decode instances; a
router splits traffic).  TPU-architecture form built from existing
pieces:

* The PREFILL server generates the first token normally (so its sampling
  matches a unified server), then exports the request's page-aligned KV
  straight out of the radix cache — the same device->host page fetch the
  HiCache tier uses.
* The DECODE server adopts the request: allocates pages, replays the KV
  through the kv_write_prefill whole-page path (HiCache restore), seeds a
  Req in the retraction-resume state (fill_len = restored tokens), and
  continues: the unaligned prompt tail re-extends in one small chunk,
  then decode proceeds as if the prompt had been prefilled locally.
* `pd_router` (HTTP) fronts one prefill + one decode pool.

Wire formats (both supported end to end):

* JSON with base64 KV (`kv_b64`) — proxy-friendly fallback.
* BINARY (default between our servers): `SGLTPD1\n` magic, uint32-LE
  header length, UTF-8 JSON header, then the raw KV bytes — no base64
  inflation (+33%) and no megabyte JSON-string parse on either side.
  `frame_encode`/`frame_decode` below; the router negotiates by asking
  /pd/prefill for `binary` and falling back if the response is JSON.
"""

from __future__ import annotations

import base64
import json
import logging
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

PD_MAGIC = b"SGLTPD1\n"


def frame_encode(header: dict, payload: bytes) -> bytes:
    """MAGIC | uint32-LE header_len | header JSON | raw payload."""
    hj = json.dumps(header).encode()
    return PD_MAGIC + struct.pack("<I", len(hj)) + hj + payload


def frame_decode(buf: bytes) -> Tuple[dict, bytes]:
    assert buf[: len(PD_MAGIC)] == PD_MAGIC, "bad PD frame magic"
    off = len(PD_MAGIC)
    (hlen,) = struct.unpack_from("<I", buf, off)
    off += 4
    header = json.loads(buf[off : off + hlen].decode())
    return header, buf[off + hlen :]


def export_prefilled_kv(engine, token_ids: List[int]) -> Optional[dict]:
    """On the PREFILL server: fetch the page-aligned KV prefix of a
    just-generated prompt from the radix cache -> transfer dict."""
    sched = engine.scheduler
    runner = engine.runner

    result = {}

    def do():
        m = sched.tree.match_prefix(token_ids)
        # leave >= 1 token for the decode side to extend (match-trim rule)
        n_pages = min(
            m.matched_len // sched.page_size,
            (len(token_ids) - 1) // sched.page_size,
        )
        if n_pages == 0:
            result["out"] = None
            return
        pages = list(m.pages[:n_pages])
        import jax.numpy as jnp

        data = np.asarray(
            jnp.take(runner.kv_cache, jnp.asarray(pages, jnp.int32), axis=1)
        )  # [L, n, ps, fc, Xr]
        data = np.ascontiguousarray(np.moveaxis(data, 1, 0))
        if data.dtype == jnp.bfloat16:
            payload = data.view(np.uint16)
            dtype = "bf16"
        else:
            payload = data
            dtype = str(data.dtype)
        result["out"] = {
            "tokens": token_ids[: n_pages * sched.page_size],
            "page_size": sched.page_size,
            "shape": list(payload.shape),
            "dtype": dtype,
            "kv_bytes": payload.tobytes(),  # raw; see transfer_to_json
        }

    # run on the scheduler thread: the tree and pool are scheduler-owned
    engine.run_on_scheduler(do)
    return result["out"]


def transfer_to_json(transfer: Optional[dict]) -> Optional[dict]:
    """Raw transfer -> JSON-able dict (base64 KV) for the legacy path."""
    if transfer is None:
        return None
    t = {k: v for k, v in transfer.items() if k != "kv_bytes"}
    t["kv_b64"] = base64.b64encode(transfer["kv_bytes"]).decode()
    return t


def adopt_prefilled(engine, transfer: dict, req) -> bool:
    """On the DECODE server: restore transferred KV into fresh pages and
    seed `req` as already-prefilled; returns False when pages could not be
    allocated (caller falls back to local prefill)."""
    sched = engine.scheduler
    runner = engine.runner
    tokens: List[int] = transfer["tokens"]
    ps = int(transfer["page_size"])
    if ps != sched.page_size:
        logger.warning("pd: page_size mismatch %s != %s", ps, sched.page_size)
        return False
    shape = tuple(transfer["shape"])
    raw = (
        transfer["kv_bytes"]
        if "kv_bytes" in transfer
        else base64.b64decode(transfer["kv_b64"])
    )
    if transfer["dtype"] == "bf16":
        import jax.numpy as jnp

        data = np.frombuffer(raw, np.uint16).reshape(shape)
        expect = jnp.bfloat16
    else:
        data = np.frombuffer(raw, transfer["dtype"]).reshape(shape)
        expect = data.dtype
    n_pages = shape[0]
    assert len(tokens) == n_pages * ps

    ok = {}

    def do():
        new_pages = sched._alloc_with_evict(0, n_pages * ps, [])
        if new_pages is None:
            ok["v"] = False
            return
        import jax.numpy as jnp

        view = data
        if transfer["dtype"] == "bf16":
            view = data.view(jnp.bfloat16)
        ctrl = _restore_controller(sched)
        ctrl.restore_raw(view, new_pages)
        req.pages = list(new_pages)
        req.prefix_pages = 0  # owned until published to the tree
        req.prefix_len = len(tokens)  # reported as cached (they are)
        req.fill_len = len(tokens)
        sched.waiting.appendleft(req)  # tail re-extends, then decode
        ok["v"] = True

    engine.run_on_scheduler(do)
    return ok.get("v", False)


def _restore_controller(sched):
    """HiCache's restore path without requiring --enable-hierarchical-cache."""
    if sched.hicache is not None:
        return sched.hicache
    from sglang_awq_tpu.mem_cache.hicache import HiCacheController

    ctrl = HiCacheController.__new__(HiCacheController)
    ctrl.runner = sched.runner
    ctrl.page_size = sched.page_size
    return ctrl
