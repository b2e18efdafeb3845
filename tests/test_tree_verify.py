"""Tree-speculative verify vs the chain verify oracle.

Reference role: EAGLE tree-mask verify (`eagle_worker.py:670`).  Semantics:
every tree node's logits must equal the logits the CHAIN verify produces
for the path from the root to that node — the tree just scores all paths
in one step.
"""

import numpy as np

import jax.numpy as jnp

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.mem_cache.kv_pool import KVPoolSpec, PAD_SLOT
from sglang_awq_tpu.model_loader.loader import _torch_state_dict_to_np, load_model

from .utils import TINY_LLAMA_CFG, tiny_hf_model_and_tensors


def make_tree_mask(K: int, D: int) -> np.ndarray:
    """Branch-major topology: node 0 = root; branch i depth j at
    1 + i*(D-1) + (j-1).  anc[i, j]: node i attends node j (incl self)."""
    QS = 1 + K * (D - 1)
    m = np.zeros((QS, QS), bool)
    m[:, 0] = True  # everyone sees the root
    np.fill_diagonal(m, True)
    for i in range(K):
        base = 1 + i * (D - 1)
        for dj in range(D - 1):
            for aj in range(dj + 1):
                m[base + dj, base + aj] = True
    return m


def tree_positions(fill: int, K: int, D: int) -> np.ndarray:
    QS = 1 + K * (D - 1)
    pos = np.zeros(QS, np.int32)
    pos[0] = fill
    for i in range(K):
        for dj in range(D - 1):
            pos[1 + i * (D - 1) + dj] = fill + 1 + dj
    return pos


def test_tree_verify_matches_chain_paths():
    _, tensors = tiny_hf_model_and_tensors()
    mc = ModelConfig(model_path="", hf_config=dict(TINY_LLAMA_CFG))
    model, params = load_model(mc, tensors=tensors)
    import jax

    rng = np.random.default_rng(0)
    ps = 8
    spec = KVPoolSpec(mc.num_layers, mc.num_kv_heads, 32, ps, mc.head_dim)
    kv0 = spec.alloc()
    rope = jax.device_put(model.rope())

    # prefill a prompt
    prompt = rng.integers(3, 500, 11).tolist()
    T = len(prompt)
    pages = np.arange(8, dtype=np.int32)
    pos = np.arange(T, dtype=np.int32)
    slots = pages[pos // ps] * ps + pos % ps
    TQ = 16
    _, kv0 = model.extend_step(
        params, kv0, rope,
        jnp.asarray(np.pad(prompt, (0, TQ - T)).astype(np.int32)),
        jnp.asarray(np.pad(pos, (0, TQ - T))),
        jnp.asarray(np.pad(slots, (0, TQ - T), constant_values=PAD_SLOT)),
        jnp.asarray(pages[None, :]),
        jnp.asarray([T], np.int32), jnp.asarray([T], np.int32),
        jnp.asarray([0], np.int32), block_q=16,
    )

    K, D = 2, 3  # 2 branches x depth-3 chains; QS = 5
    QS = 1 + K * (D - 1)
    root = 7
    branches = [[101, 102], [201, 202]]
    tree_tokens = np.asarray(
        [root] + branches[0] + branches[1], np.int32)
    tpos = tree_positions(T, K, D)
    tslots = pages[(T + np.arange(QS)) // ps] * ps + (T + np.arange(QS)) % ps
    mask = make_tree_mask(K, D)

    logits_tree, _ = model.spec_verify_tree_step(
        params, jnp.copy(kv0), rope,
        jnp.asarray(tree_tokens[None]), jnp.asarray(tpos[None]),
        jnp.asarray(tslots[None]), jnp.asarray(pages[None, :]),
        jnp.asarray([T], np.int32), mask,
    )
    logits_tree = np.asarray(logits_tree[0])  # [QS, V]

    # oracle: each path via the existing chain verify
    for i, br in enumerate(branches):
        chain = np.asarray([root] + br, np.int32)
        cpos = T + np.arange(D, dtype=np.int32)
        cslots = pages[cpos // ps] * ps + cpos % ps
        logits_chain, _ = model.spec_verify_step(
            params, jnp.copy(kv0), rope,
            jnp.asarray(chain[None]), jnp.asarray(cpos[None]),
            jnp.asarray(cslots[None]), jnp.asarray(pages[None, :]),
            jnp.asarray([T + D], np.int32),
        )
        logits_chain = np.asarray(logits_chain[0])  # [D, V]
        nodes = [0] + [1 + i * (D - 1) + dj for dj in range(D - 1)]
        for d, node in enumerate(nodes):
            diff = np.abs(logits_tree[node] - logits_chain[d]).max()
            assert diff < 0.05, (i, d, diff)
            assert logits_tree[node].argmax() == logits_chain[d].argmax()
