"""Checkpoint loading: HF safetensors -> layer-stacked TPU param pytree.

Role model: reference `python/sglang/srt/model_loader/loader.py:297`
(`DefaultModelLoader` — safetensors iteration `:451`, per-param
`weight_loader`, then `process_weights_after_loading` doing the marlin
repack `awq.py:542`).  TPU translation: weights are merged (q,k,v ->
qkv; gate,up -> gate_up), stacked along a leading layer dim, and AWQ
tensors are de-interleaved/re-packed into the Pallas kernel layout ONCE
here (no device-side repack).

Weight name schema handled (Llama/Qwen2 family):
    model.embed_tokens.weight
    model.layers.{l}.self_attn.{q,k,v,o}_proj.{weight|qweight|qzeros|scales|bias}
    model.layers.{l}.mlp.{gate,up,down}_proj.{...}
    model.layers.{l}.{input,post_attention}_layernorm.weight
    model.norm.weight
    lm_head.weight
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.configs.model_config import ModelConfig
from sglang_awq_tpu.layers.linear import LinearSpec, convert_awq_weights_np
from sglang_awq_tpu.models.registry import get_model_class

logger = logging.getLogger(__name__)


def iterate_safetensors(model_path: str) -> Iterator[Tuple[str, np.ndarray]]:
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {model_path}")
    for f in files:
        with safe_open(f, framework="np") as sf:
            for name in sf.keys():
                yield name, sf.get_tensor(name)


def _torch_state_dict_to_np(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        arr = v.detach().to("cpu")
        if str(arr.dtype) == "torch.bfloat16":
            arr = arr.float()
        out[k] = arr.numpy()
    return out


MERGES = {
    # target: (source proj names, hf prefix)
    "qkv": ["self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj"],
    "o": ["self_attn.o_proj"],
    "gate_up": ["mlp.gate_proj", "mlp.up_proj"],
    "down": ["mlp.down_proj"],
}


def interleave_concat(arrs, tp: int, axis: int = 1) -> np.ndarray:
    """TP-aware merge along the output dim.

    Contiguous NamedSharding chunks of the merged array must equal each
    shard's own [q_i | k_i | v_i] (or [gate_i | up_i]) slice — so the pieces
    are interleaved per shard here, replacing the reference's per-rank
    weight-loader shard arithmetic (linear.py packed-dim handling).
    """
    if tp == 1 or len(arrs) == 1 and tp == 1:
        return np.concatenate(arrs, axis=axis)
    parts = []
    for i in range(tp):
        for a in arrs:
            n = a.shape[axis]
            assert n % tp == 0, (n, tp)
            sl = [slice(None)] * a.ndim
            sl[axis] = slice(i * n // tp, (i + 1) * n // tp)
            parts.append(a[tuple(sl)])
    return np.concatenate(parts, axis=axis)


def load_params_from_tensors(
    model,
    tensors: Dict[str, np.ndarray],
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Build the model's param pytree from a flat HF-named tensor dict."""
    cfg: ModelConfig = model.config
    L = cfg.num_layers
    quant = cfg.quant_config
    if hasattr(model, "pretranslate_tensors"):
        # e.g. Phi-3: split checkpoint-fused qkv_proj / gate_up_proj back
        # into the canonical per-projection names the schemas expect
        tensors = model.pretranslate_tensors(tensors)

    def t(name):  # fetch + fail loud
        if name not in tensors:
            raise KeyError(f"missing checkpoint tensor {name}")
        return tensors[name]

    params: Dict[str, Any] = {
        "embed": {"weight": jnp.asarray(t("model.embed_tokens.weight"), dtype)},
        "layers": {},
        "final_norm": jnp.asarray(t("model.norm.weight"), jnp.float32),
    }
    if cfg.tie_word_embeddings or getattr(model, "force_tied_lm_head", False):
        lm_head = t("model.embed_tokens.weight").T
    else:
        lm_head = t("lm_head.weight").T
    params["lm_head"] = {"weight": jnp.asarray(np.ascontiguousarray(lm_head), dtype)}

    params["layers"]["input_norm"] = jnp.asarray(
        np.stack([t(f"model.layers.{l}.input_layernorm.weight") for l in range(L)]),
        jnp.float32,
    )
    params["layers"]["post_norm"] = jnp.asarray(
        np.stack(
            [t(f"model.layers.{l}.post_attention_layernorm.weight") for l in range(L)]
        ),
        jnp.float32,
    )
    if "model.layers.0.self_attn.k_scale" in tensors:
        # per-layer KV quantization scales (reference
        # `layers/quantization/kv_cache.py:18-62` + checkpoint schema
        # `model_loader/weight_utils.py:1217-1270`): row 0 = k, row 1 = v
        params["layers"]["kv_scales"] = jnp.asarray(
            np.stack([
                np.stack([
                    np.asarray(t(f"model.layers.{l}.self_attn.k_scale"))
                    .reshape(()) for l in range(L)
                ]),
                np.stack([
                    np.asarray(t(f"model.layers.{l}.self_attn.v_scale"))
                    .reshape(()) for l in range(L)
                ]),
            ]),
            jnp.float32,
        )
    if getattr(model, "qk_norm", False) or getattr(model, "qk_norm_full", False):
        for which in ("q_norm", "k_norm"):
            params["layers"][which] = jnp.asarray(
                np.stack(
                    [t(f"model.layers.{l}.self_attn.{which}.weight") for l in range(L)]
                ),
                jnp.float32,
            )

    tp = model.tp_size
    if hasattr(model, "merge_schema"):
        merges = model.merge_schema()
    else:
        merges = {tgt: (srcs, "n") for tgt, srcs in MERGES.items()}
    for target, entry in merges.items():
        # entry = (sources, kind) or (sources, kind, (start, stop)) — the
        # optional layer range supports heterogeneous stacks (DeepSeek's
        # first_k_dense_replace: dense MLPs on layers [0, k), MoE beyond)
        sources, kind = entry[0], entry[1]
        lo, hi = entry[2] if len(entry) > 2 else (0, L)
        if hi <= lo:  # empty component stack (e.g. a pattern with no
            continue  # attention layers) — nothing to merge
        spec: LinearSpec = model.specs[target]
        quant_here = spec.quantized

        def merge(arrs, axis=1):
            if kind == "n":
                return interleave_concat(arrs, tp, axis=axis)
            if kind == "ne":  # whole blocks per shard (MoE experts)
                return np.concatenate(arrs, axis=axis)
            # kind == "k": contraction-dim merge (MoE down: Y = sum_e
            # act_e @ W2_e == concat_k(act) @ vstack_k(W2)).  AWQ qweight/
            # qzeros/scales all lead with the K-derived dim, so axis=0
            # merges every tensor kind.
            return np.concatenate(arrs, axis=0)

        per_layer = []
        biases = []
        for l in range(lo, hi):
            names = [f"model.layers.{l}.{s}" for s in sources]
            if quant_here:
                qw = merge([t(n + ".qweight") for n in names])
                has_zeros = names[0] + ".qzeros" in tensors
                qz = (
                    merge([t(n + ".qzeros") for n in names])
                    if has_zeros
                    else None
                )
                sc = merge([t(n + ".scales") for n in names])
                per_layer.append(convert_awq_weights_np(spec, qw, qz, sc))
            else:
                # torch nn.Linear stores [out, in]; we want [in, out]
                w = merge([t(n + ".weight").T for n in names])
                per_layer.append({"weight": w})
            bias_name = names[0] + ".bias"
            if bias_name in tensors:
                biases.append(
                    interleave_concat([t(n + ".bias") for n in names], tp, axis=0)
                )
        stacked = {
            key: jnp.asarray(
                np.stack([pl[key] for pl in per_layer]),
                dtype if key == "weight" else None,
            )
            for key in per_layer[0]
        }
        if biases:
            assert len(biases) == hi - lo
            stacked["bias"] = jnp.asarray(np.stack(biases), dtype)
        params["layers"][target] = stacked
    if hasattr(model, "extra_layer_params"):  # e.g. MoE router gates
        params["layers"].update(model.extra_layer_params(t, L))
    if hasattr(model, "postprocess_params"):  # e.g. Gemma's (1+w) norms
        params = model.postprocess_params(params)
    return params


def load_model(
    model_config: ModelConfig,
    tp_size: int = 1,
    tp_axis: Optional[str] = None,
    tensors: Optional[Dict[str, np.ndarray]] = None,
    random_weights: bool = False,
    pp_size: int = 1,
    stage_axis: Optional[str] = None,
    pp_microbatches: int = 0,
):
    """Returns (model, params). tensors overrides disk reading (tests/RL)."""
    cls = get_model_class(model_config.architecture)
    model = cls(config=model_config, tp_size=tp_size, tp_axis=tp_axis,
                pp_size=pp_size, stage_axis=stage_axis,
                pp_microbatches=pp_microbatches)
    if random_weights:
        params = model.random_params()
        return model, params
    if tensors is None:
        tensors = dict(iterate_safetensors(model_config.model_path))
    params = load_params_from_tensors(model, tensors)
    return model, params
