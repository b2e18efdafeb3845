"""Partition specs for the layer-stacked param pytree + KV pool.

Role model: the reference's megatron-style TP layout
(`python/sglang/srt/layers/linear.py` Column/Row parallel shard arithmetic,
vocab-parallel lm_head `vocab_parallel_embedding.py:499`), declared here as
PartitionSpecs instead of per-rank weight-loader slicing:

  qkv / gate_up (column parallel): output dim N sharded over "model"
  o / down (row parallel):         input dim K sharded over "model"
                                   (for AWQ that shards packed rows AND the
                                   per-k-tile scale strips — both lead with
                                   the K-derived dim, so one spec fits)
  lm_head: vocab-sharded columns; logits all-gathered in the model
  embedding / norms: replicated
  KV pool [L, pages, ps, 2*KVH, D]: combined kv-head dim sharded over
  "model" (K heads and V heads split identically since both halves have
  KVH heads)
"""

from __future__ import annotations

from typing import Any, Dict

from jax.sharding import PartitionSpec as P

from sglang_awq_tpu.parallel.mesh import MODEL_AXIS, STAGE_AXIS


def _linear_pspecs(shard_axis, quantized: bool, has_bias: bool) -> Dict[str, P]:
    # leading dim is the LAYER stack: pipeline stages slice it ("stage"
    # spans size 1 without pp, so these specs serve both topologies)
    m, st = MODEL_AXIS, STAGE_AXIS
    if shard_axis is None:  # replicated linear (e.g. MLA latent projections)
        keys = ("qweight", "scales", "zbias") if quantized else ("weight",)
        out = {k: P(st, None, None) for k in keys}
        if has_bias:
            out["bias"] = P(st, None)
        return out
    if quantized:
        if shard_axis == "column":
            out = {
                "qweight": P(st, None, m),
                "scales": P(st, None, m),
                "zbias": P(st, None, m),
            }
        else:  # row
            out = {
                "qweight": P(st, m, None),
                "scales": P(st, m, None),
                "zbias": P(st, m, None),
            }
    else:
        if shard_axis == "column":
            out = {"weight": P(st, None, m)}
        else:
            out = {"weight": P(st, m, None)}
    if has_bias:
        # bias adds along N: column-parallel shards it, row-parallel replicates
        out["bias"] = P(st, m) if shard_axis == "column" else P(st, None)
    return out


def param_pspecs(model, params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec tree matching the model's param pytree."""
    specs: Dict[str, Any] = {
        "embed": {"weight": P(None, None)},
        "layers": {
            "input_norm": P(STAGE_AXIS, None),
            "post_norm": P(STAGE_AXIS, None),
        },
        "final_norm": P(None),
        "lm_head": {},
    }
    for k, arr in params["lm_head"].items():
        specs["lm_head"][k] = (
            P(MODEL_AXIS) if arr.ndim == 1 else P(None, MODEL_AXIS)
        )
    for name, spec in model.specs.items():
        has_bias = "bias" in params["layers"][name]
        specs["layers"][name] = _linear_pspecs(
            spec.shard_axis, spec.quantized, has_bias
        )
    # model-specific extras (MoE router gates, qk norms, ...) are layer-
    # stacked: stage-shard the leading dim, replicate the rest
    for name, arr in params["layers"].items():
        if name not in specs["layers"]:
            specs["layers"][name] = P(STAGE_AXIS, *([None] * (arr.ndim - 1)))
    if "lora" in params:
        specs["lora"] = lora_pspecs(model)
    # non-layer extras (vision tower, projector, ...): replicated
    for name, sub in params.items():
        if name not in specs:
            specs[name] = jax.tree.map(lambda a: P(*([None] * a.ndim)), sub)
    return specs


def lora_pspecs(model) -> Dict[str, Dict[str, P]]:
    """LoRA pool sharding follows the base linear it patches: B's output
    columns shard with a column-parallel base (the delta adds to the
    local shard's outputs, already interleave-matched by the manager);
    A's input rows shard with a row-parallel base (the partial delta
    joins the base output's psum)."""
    m = MODEL_AXIS
    out: Dict[str, Dict[str, P]] = {}
    for name in ("qkv", "o", "gate_up", "down"):
        if name not in model.specs:
            continue
        if model.specs[name].shard_axis == "column":
            out[name] = {"A": P(None, None, None, None),
                         "B": P(None, None, None, m)}
        else:  # row-parallel
            out[name] = {"A": P(None, None, m, None),
                         "B": P(None, None, None, None)}
    return out


def kv_pspec(ndim: int = 5) -> P:
    # Shard the trailing lane dim (the per-head lanes): each shard's local
    # block is a self-consistent pool over its own KVH/s heads — writes
    # come from the same shard's column-sharded qkv projection, reads stay
    # local to the shard inside shard_map.
    #   combined (5D) [L, pages, ps, fc, KVH*D/(fc/2)]
    #   wide     (5D) [L, pages, 2, ps, KVH*D] — slicing the flat row
    #   split    (6D) [L, pages, 2, ps, fcK, KVH*D/fcK] — slicing XrK
    #   slices each class row's heads, so the local pool keeps the
    #   class-block head order the local qkv projection produces.
    #   latent   (4D) [L, pages, ps, D]: REPLICATED over the model axis —
    #   MLA's kv_a projection is replicated, every shard computes (and
    #   dots against) the SAME full-width latent row, so the single-copy
    #   layout survives TP (round 5; reference stores one latent row
    #   regardless of TP, memory_pool.py:1396).
    if ndim == 4:
        return P(*([STAGE_AXIS] + [None] * (ndim - 1)))
    return P(*([STAGE_AXIS] + [None] * (ndim - 2) + [MODEL_AXIS]))
