"""HiCache (host KV tier): evict -> host, re-match -> restore.

Reference role: hiradix_cache write-through/load tests.  A tiny device
pool forces eviction; a later identical prompt must hit the HOST tier
(cached_tokens > 0 after the device copy was evicted) and produce the
same output as an uncached run.
"""

import numpy as np
import pytest

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.entrypoints.engine import Engine
from sglang_awq_tpu.server_args import ServerArgs

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors


def _engine(hicache: bool, max_tokens=256):
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    sa = ServerArgs(
        model_path="tiny", page_size=8, max_total_tokens=max_tokens,
        chunked_prefill_size=64, max_running_requests=2,
        enable_hierarchical_cache=hicache, hicache_size_gb=0.01,
        radix_cache_impl="python",
    )
    return Engine(server_args=sa, model_config=mc, tensors=tensors,
                  tokenizer=None)


def test_hicache_restores_evicted_prefix():
    rng = np.random.default_rng(0)
    prompt_a = rng.integers(3, 500, 64).tolist()
    prompt_b = rng.integers(3, 500, 120).tolist()
    sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}

    eng = _engine(hicache=True, max_tokens=128)  # 16 pages: B must evict A
    try:
        out_a1 = eng.generate(input_ids=prompt_a, sampling_params=dict(sp))
        # big request B forces eviction of A's pages from the device tree
        eng.generate(input_ids=prompt_b, sampling_params=dict(sp))
        eng.scheduler.hicache.flush()  # async writer: settle before inspect
        host = eng.scheduler.hicache.host
        assert len(host.index) > 0, "eviction never offloaded to host"
        out_a2 = eng.generate(input_ids=prompt_a, sampling_params=dict(sp))
        # the host tier served the prefix (device copy was evicted)
        assert out_a2["meta_info"]["cached_tokens"] > 0
        assert host.hits > 0
        assert out_a2["output_ids"] == out_a1["output_ids"]
    finally:
        eng.shutdown()


def test_hicache_disabled_recomputes():
    rng = np.random.default_rng(0)
    prompt_a = rng.integers(3, 500, 64).tolist()
    prompt_b = rng.integers(3, 500, 120).tolist()
    sp = {"max_new_tokens": 4, "temperature": 0.0, "ignore_eos": True}
    eng = _engine(hicache=False, max_tokens=128)
    try:
        a1 = eng.generate(input_ids=prompt_a, sampling_params=dict(sp))
        eng.generate(input_ids=prompt_b, sampling_params=dict(sp))
        a2 = eng.generate(input_ids=prompt_a, sampling_params=dict(sp))
        assert a2["output_ids"] == a1["output_ids"]
    finally:
        eng.shutdown()


def test_host_kv_cache_lru():
    from sglang_awq_tpu.mem_cache.hicache import HostKVCache

    class Spec:
        shape = (2, 0, 8, 2, 64)
        import jax.numpy as jnp

        jdtype = jnp.bfloat16

    c = HostKVCache(Spec(), capacity_bytes=3 * 2 * 8 * 2 * 64 * 2)
    assert c.capacity == 3
    data = np.zeros((2, 8, 2, 64), np.float32)
    h1 = c.put(0, (1,) * 8, data)
    h2 = c.put(h1, (2,) * 8, data)
    c.put(0, (9,) * 8, data)
    # touch chain 1 so the lone (9,) entry is LRU
    assert c.get(0, (1,) * 8) is not None
    assert c.get(h1, (2,) * 8) is not None
    c.put(h2, (3,) * 8, data)  # evicts (9,)
    assert c.get(0, (9,) * 8) is None
    assert c.get(0, (1,) * 8) is not None
