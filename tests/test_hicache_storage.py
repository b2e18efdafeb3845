"""L3 persistent KV storage (round 5): prefix KV survives a restart.

Reference role: `srt/mem_cache/hicache_storage.py:62` HiCacheStorage ABC +
`storage/backend_factory.py`.  The posix-dir backend stores one file per
page keyed by a restart-stable blake2b hash chain; a FRESH engine pointed
at the same directory serves an evicted prefix from L3 even though its
host (L2) tier and device radix tree start empty.
"""

import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.mem_cache.hicache_storage import (
    PosixDirStorage,
    create_storage_backend,
    stable_chain,
)
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors


def test_posix_storage_roundtrip(tmp_path):
    st = create_storage_backend(f"posix://{tmp_path}/kv")
    assert isinstance(st, PosixDirStorage)
    k1 = stable_chain("", (1, 2, 3), "salt")
    k2 = stable_chain(k1, (4, 5), "salt")
    assert k1 != k2
    assert stable_chain("", (1, 2, 3), "salt") == k1  # restart-stable
    assert stable_chain("", (1, 2, 3), "other") != k1
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    b = np.ones((2, 3, 4), np.float32)
    assert st.batch_set([k1, k2], [a, b])
    assert st.exists(k1) and not st.exists("deadbeef")
    got = st.batch_get([k1, "deadbeef", k2])
    assert np.array_equal(got[0], a) and got[1] is None
    assert np.array_equal(got[2], b)


def _engine(storage_dir, max_tokens=128):
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(
        model_path="tiny", page_size=8, max_total_tokens=max_tokens,
        chunked_prefill_size=64, max_running_requests=2,
        enable_hierarchical_cache=True, hicache_size_gb=0.01,
        hicache_storage=f"posix://{storage_dir}",
        radix_cache_impl="python",
    )
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


def test_l3_survives_restart(tmp_path):
    rng = np.random.default_rng(0)
    prompt_a = rng.integers(3, 500, 64).tolist()
    prompt_b = rng.integers(3, 500, 120).tolist()
    sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
    sdir = tmp_path / "l3"

    eng1 = _engine(sdir)
    try:
        out_a1 = eng1.generate(input_ids=prompt_a, sampling_params=dict(sp))
        eng1.generate(input_ids=prompt_b, sampling_params=dict(sp))
        eng1.scheduler.hicache.flush()
        assert any(sdir.rglob("*.npy")), "eviction never reached L3"
    finally:
        eng1.shutdown()

    # "restart": a fresh engine — empty device tree, empty L2 host pool —
    # must serve A's prefix from the persistent store
    eng2 = _engine(sdir)
    try:
        assert len(eng2.scheduler.hicache.host.index) == 0
        out_a2 = eng2.generate(input_ids=prompt_a, sampling_params=dict(sp))
        assert out_a2["meta_info"]["cached_tokens"] > 0, "no L3 prefix hit"
        assert out_a2["output_ids"] == out_a1["output_ids"]
    finally:
        eng2.shutdown()
