"""SWA radix cache: tombstoned nodes, window-validated matching, two-tier
locks, tombstone-first eviction (reference swa_radix_cache.py behavior,
re-shaped for the page-granular TPU tree)."""

import numpy as np
import pytest

from sglang_awq_tpu.mem_cache.allocator import PagedAllocator
from sglang_awq_tpu.mem_cache.swa_radix_cache import SWARadixCache


def toks(n_pages, ps=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(3, 1000, n_pages * ps).tolist()


def _tree(num_pages=64, ps=2, window=4, margin=0):
    a = PagedAllocator(num_pages, ps)
    # win_pages = (window + margin) / ps
    return a, SWARadixCache(a, ps, window=window, margin=margin)


def test_tombstone_keeps_match_when_tail_live():
    a, rc = _tree()  # win_pages = 2
    ids = toks(10)
    pages = a.alloc_pages(10)
    rc.insert(ids, pages)
    # split the path: a 4-page prefix match carves a node boundary
    m4 = rc.match_prefix(ids[: 4 * 2])
    assert m4.matched_len == 8
    # lock the tail of the full path so only the front 4-page node can die
    m = rc.match_prefix(ids)
    rc.inc_lock_ref(m.last_node)
    freed = rc.evict(100)
    assert freed == 4  # front node tombstoned; tail swa-locked
    assert a.available_pages() == 64 - 6
    m = rc.match_prefix(ids)
    # full length still matchable: 6 live pages >= win_pages since tombstone
    assert m.matched_len == 20
    assert m.pages[:4] == [0, 0, 0, 0]  # placeholders, never read
    assert m.pages[4:] == pages[4:]
    rc.check_invariant(request_held_pages=0)


def test_match_truncates_when_window_dead():
    a, rc = _tree(window=8)  # win_pages = 4
    ids = toks(6)
    rc.insert(ids, a.alloc_pages(6))
    rc.match_prefix(ids[: 4 * 2])  # split at 4 pages
    rc.evict(4)  # tombstone the 4-page front (LRU; nothing locked)
    m = rc.match_prefix(ids)
    # live tail (2) < win_pages (4): no boundary is window-valid
    assert m.matched_len == 0
    rc.check_invariant(request_held_pages=0)
    # full eviction still reclaims the structure
    rc.evict(100)
    assert a.available_pages() == 64


def test_swa_lock_protects_window_tail():
    a, rc = _tree()  # win_pages = 2
    ids = toks(8)
    rc.insert(ids, a.alloc_pages(8))
    rc.match_prefix(ids[: 6 * 2])  # split at 6 so the tail is its own node
    m = rc.match_prefix(ids)
    rc.inc_lock_ref(m.last_node)
    # evict under pressure: everything except the swa-locked tail dies
    rc.evict(100)
    m2 = rc.match_prefix(ids)
    assert m2.matched_len == 16  # tail live -> full match usable
    live = sum(1 for p in m2.pages if p != 0)
    assert live >= rc.win_pages
    rc.dec_lock_ref(m.last_node)
    rc.evict(100)
    assert a.available_pages() == 64
    rc.check_invariant(request_held_pages=0)


def test_insert2_dead_prefix_and_revival():
    a, rc = _tree()
    ids = toks(10)
    own = a.alloc_pages(4)  # only the live tail is real
    pages = [0] * 6 + own
    dup = rc.insert2(ids, pages, dead_pages=6)
    assert dup == []  # fresh tree: nothing duplicated
    assert rc.total_pages() == 4
    rc.check_invariant(request_held_pages=0)
    # second request computed the whole thing live: revives the dead front
    own2 = a.alloc_pages(10)
    dup2 = rc.insert2(ids, own2, dead_pages=0)
    # front 6 transferred (revival), tail 4 are duplicates we must free
    assert dup2 == [6, 7, 8, 9]
    a.free_pages([own2[p] for p in dup2])
    assert rc.total_pages() == 10
    m = rc.match_prefix(ids)
    # revived front = own2's pages; live tail = the tree's original copy
    assert m.matched_len == 20 and m.pages == own2[:6] + own
    rc.check_invariant(request_held_pages=0)


def test_insert2_straddling_dead_boundary():
    a, rc = _tree()
    ids = toks(8)
    # whole path tombstoned first
    rc.insert2(ids, [0] * 8, dead_pages=8)
    assert rc.total_pages() == 0
    # now insert with dead boundary INSIDE the tombstoned node: splits it
    own = a.alloc_pages(5)
    rc.insert2(ids, [0] * 3 + own, dead_pages=3)
    assert rc.total_pages() == 5
    m = rc.match_prefix(ids)
    assert m.matched_len == 16  # live tail 5 >= win_pages 2
    assert m.pages[3:] == own
    rc.check_invariant(request_held_pages=0)


def test_match_cap_respects_window_at_boundary():
    a, rc = _tree()  # win_pages = 2
    ids = toks(10)
    rc.insert(ids, a.alloc_pages(10))
    rc.match_prefix(ids[: 6 * 2])  # split at 6
    rc.evict(6)  # tombstone front 6
    # uncapped: full match (live tail 4 >= 2)
    assert rc.match_prefix(ids).matched_len == 20
    # capped at 7 pages: boundary 7 has only 1 live page behind it -> the
    # window is dead there; no valid shallower boundary either
    assert rc.match_prefix(ids, max_pages=7).matched_len == 0
    # capped at 8: exactly win_pages live behind the boundary
    assert rc.match_prefix(ids, max_pages=8).matched_len == 16


def test_evictable_size_counts_tombstonable():
    a, rc = _tree()
    ids = toks(10)
    rc.insert(ids, a.alloc_pages(10))
    rc.match_prefix(ids[: 8 * 2])  # node boundary at the window start
    m = rc.match_prefix(ids)
    rc.inc_lock_ref(m.last_node)
    # whole path full-locked, but only the win_pages tail is swa-locked:
    # the rest is still reclaimable (tombstonable)
    assert rc.evictable_size() == (10 - rc.win_pages) * 2
    rc.dec_lock_ref(m.last_node)
    assert rc.evictable_size() == 20


@pytest.mark.slow
def test_engine_swa_radix_end_to_end():
    """All-SWA model with the radix cache ENABLED: active release frees
    owned pages mid-decode, finish publishes a dead-prefix path, and a
    rerun of the same prompt still produces identical output."""
    from sglang_awq_tpu.configs.model_config import ModelConfig
    from sglang_awq_tpu.entrypoints.engine import Engine
    from sglang_awq_tpu.mem_cache.swa_radix_cache import SWARadixCache
    from sglang_awq_tpu.server_args import ServerArgs

    from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors

    _, tensors = tiny_hf_model_and_tensors()
    cfg = dict(TINY_LLAMA_CFG, sliding_window=32, max_position_embeddings=4096)
    mc = ModelConfig(model_path="", hf_config=cfg)
    sa = ServerArgs(model_path="tiny-swa", page_size=8, max_total_tokens=4096,
                    chunked_prefill_size=64, max_running_requests=2)
    eng = Engine(server_args=sa, model_config=mc, tensors=tensors,
                 tokenizer=None)
    try:
        assert isinstance(eng.scheduler.tree, SWARadixCache)
        rng = np.random.default_rng(0)
        prompt = rng.integers(3, 500, 16).tolist()
        params = {"max_new_tokens": 1300, "temperature": 0.0,
                  "ignore_eos": True}
        out1 = eng.generate(input_ids=prompt, sampling_params=params)
        assert len(out1["output_ids"]) == 1300
        eng.scheduler.check_memory()
        tree = eng.scheduler.tree
        # finish published a path whose released front is tombstoned
        dead = sum(
            len(n.key) for n in tree._iter_nodes() if n.tombstone
        )
        assert dead > 0, "finish should have published a dead-prefix path"
        # same prompt again: radix reuse must not change the output
        out2 = eng.generate(input_ids=prompt, sampling_params=params)
        assert out2["output_ids"] == out1["output_ids"]
        eng.scheduler.check_memory()
    finally:
        eng.shutdown()
