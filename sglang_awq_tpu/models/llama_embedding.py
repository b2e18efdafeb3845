"""Embedding / reward model heads.

Role models: reference `python/sglang/srt/models/llama_embedding.py`
(LlamaEmbeddingModel / MistralModel — e5-mistral-style last-token pooling
over the final-norm hidden state) and `srt/models/qwen2_rm.py`
(Qwen2ForRewardModel / Qwen2ForSequenceClassification — score head on the
pooled hidden).

TPU form: both ride the EXISTING embedding path (scheduler
`is_embedding` -> runner.forward_embed -> per-seq final-norm last-token
hidden).  The reward variant projects that vector through its score head
host-side at finish (a [H, n_labels] matvec — not worth a device round
trip)."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from sglang_awq_tpu.models.llama import LlamaForCausalLM
from sglang_awq_tpu.models.qwen2 import Qwen2ForCausalLM


class _BareCheckpointMixin:
    """Bare `*Model` checkpoints name tensors without the `model.` prefix
    and carry no lm_head; prefix them and tie the head to the embeddings
    (its logits are never served)."""

    force_tied_lm_head = True
    is_embedding_model = True

    def pretranslate_tensors(self, tensors):
        out = {}
        for name, arr in tensors.items():
            if name.startswith(("model.", "lm_head.", "score.",
                                "classification_head.")):
                out[name] = arr
            else:
                out["model." + name] = arr
        return out


@dataclasses.dataclass
class LlamaEmbeddingModel(_BareCheckpointMixin, LlamaForCausalLM):
    """e5-mistral-class embedding model (architectures: MistralModel /
    LlamaModel): /v1/embeddings returns the last-token hidden state."""


@dataclasses.dataclass
class Qwen2ForRewardModel(_BareCheckpointMixin, Qwen2ForCausalLM):
    """Qwen2-class reward model: score head [H -> n_labels] over the pooled
    hidden; /v1/embeddings (and /encode) return the score vector."""

    is_reward_model = True

    def __post_init__(self):
        super().__post_init__()
        hf = self.config.hf_config
        self.num_labels = int(hf.get("num_labels", 1))

    def pretranslate_tensors(self, tensors):
        out = super().pretranslate_tensors(tensors)
        # HF qwen2_rm: score.0 (H->H) + score.2 (H->1) gated by ReLU, or a
        # single score linear for sequence classification
        self._score_tensors = {
            k: np.asarray(v, np.float32)
            for k, v in tensors.items()
            if k.startswith(("score.", "classification_head.", "v_head."))
        }
        return out

    def postprocess_params(self, params: Dict[str, Any]) -> Dict[str, Any]:
        st = getattr(self, "_score_tensors", {})
        head: Dict[str, Any] = {}
        if "score.0.weight" in st:  # two-layer gated head (qwen2_rm)
            head = {
                "w1": jnp.asarray(st["score.0.weight"].T, jnp.float32),
                "b1": jnp.asarray(
                    st.get("score.0.bias",
                           np.zeros(st["score.0.weight"].shape[0])),
                    jnp.float32),
                "w2": jnp.asarray(st["score.2.weight"].T, jnp.float32),
                "b2": jnp.asarray(
                    st.get("score.2.bias",
                           np.zeros(st["score.2.weight"].shape[0])),
                    jnp.float32),
            }
        elif "score.weight" in st:  # single linear (sequence classification)
            head = {
                "w2": jnp.asarray(st["score.weight"].T, jnp.float32),
                "b2": jnp.asarray(
                    st.get("score.bias",
                           np.zeros(st["score.weight"].shape[0])),
                    jnp.float32),
            }
        params["score_head"] = head
        self._score_tensors = None
        return params

    def apply_score_head(self, params: Dict[str, Any],
                         hidden: np.ndarray) -> np.ndarray:
        """[B, H] pooled hidden -> [B, n_labels] scores (host numpy)."""
        head = {k: np.asarray(v) for k, v in params["score_head"].items()}
        x = hidden.astype(np.float32)
        if "w1" in head:
            x = np.maximum(x @ head["w1"] + head["b1"], 0.0)  # ReLU gate
        return x @ head["w2"] + head["b2"]
