"""EAGLE tree topology helpers (branch-major static trees).

Reference role: the tree-mask construction in `eagle_utils.py`
(build_tree_kernel_efficient) — the reference builds arbitrary trees from
per-step topk scores on GPU; on TPU the mask must be STATIC (it is baked
into the verify jit), so we use the fixed "top-k branch roots, each
continued greedily" shape: node 0 is the root (the newest accepted token),
branch i's depth-j node sits at index 1 + i*(depth-1) + (j-1).
"""

import numpy as np


def tree_size(k: int, depth: int) -> int:
    """Nodes in a k-branch depth-`depth` tree (depth counts the root)."""
    return 1 + k * (depth - 1)


def make_tree_mask(k: int, depth: int) -> np.ndarray:
    """anc[i, j] = node i attends node j (ancestors + self; everyone sees
    the root)."""
    qs = tree_size(k, depth)
    m = np.zeros((qs, qs), bool)
    m[:, 0] = True
    np.fill_diagonal(m, True)
    for i in range(k):
        base = 1 + i * (depth - 1)
        for dj in range(depth - 1):
            for aj in range(dj + 1):
                m[base + dj, base + aj] = True
    return m


def tree_node_offsets(k: int, depth: int) -> np.ndarray:
    """Position offset of each node relative to the root's position."""
    qs = tree_size(k, depth)
    off = np.zeros(qs, np.int32)
    for i in range(k):
        for dj in range(depth - 1):
            off[1 + i * (depth - 1) + dj] = 1 + dj
    return off
