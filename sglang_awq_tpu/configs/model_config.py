"""Model configuration.

Role model: reference `python/sglang/srt/configs/model_config.py:83`
(`ModelConfig` — an HF config wrapper with quantization detection and derived
attention geometry).  We read `config.json` directly (offline-friendly) and
keep the same derived-quantity surface the runtime needs.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

from sglang_awq_tpu.quantization.awq_config import AWQConfig, detect_quant_config


@dataclasses.dataclass
class ModelConfig:
    model_path: str
    hf_config: Dict[str, Any]
    quant_config: Optional[AWQConfig] = None
    context_length: Optional[int] = None  # override

    # Derived fields (filled in __post_init__)
    architecture: str = ""
    vocab_size: int = 0
    hidden_size: int = 0
    num_layers: int = 0
    num_attention_heads: int = 0
    num_kv_heads: int = 0
    head_dim: int = 0
    intermediate_size: int = 0
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    bos_token_id: Optional[int] = None
    eos_token_id: Any = None  # int or list
    # MLA (DeepSeek V2/V3): compressed KV latent dims.  When set, the
    # KV-pool geometry fields (num_kv_heads / head_dim) describe the
    # LATENT cache rows, not per-head K/V (reference MLATokenToKVPool,
    # memory_pool.py:1396).
    is_mla: bool = False
    kv_lora_rank: int = 0
    qk_rope_head_dim: int = 0

    @classmethod
    def from_model_path(
        cls,
        model_path: str,
        context_length: Optional[int] = None,
        quantization: Optional[str] = None,
    ) -> "ModelConfig":
        cfg_path = os.path.join(model_path, "config.json")
        with open(cfg_path) as f:
            hf_config = json.load(f)
        quant_config = detect_quant_config(model_path, hf_config)
        if quantization == "awq" and quant_config is None:
            raise ValueError(
                f"--quantization awq given but no AWQ config found at {model_path}"
            )
        return cls(
            model_path=model_path,
            hf_config=hf_config,
            quant_config=quant_config,
            context_length=context_length,
        )

    def __post_init__(self):
        c = self.hf_config
        if "d_model" in c and "hidden_size" not in c:
            # DBRX-style naming (d_model / n_heads / nested sub-configs)
            c = self.hf_config = dict(c)
            ac = c.get("attn_config") or {}
            fc = c.get("ffn_config") or {}
            ac = ac.to_dict() if hasattr(ac, "to_dict") else dict(ac)
            fc = fc.to_dict() if hasattr(fc, "to_dict") else dict(fc)
            c["attn_config"], c["ffn_config"] = ac, fc
            c["hidden_size"] = c["d_model"]
            c.setdefault("num_hidden_layers", c.get("n_layers"))
            c["num_attention_heads"] = c["n_heads"]
            c["num_key_value_heads"] = ac.get("kv_n_heads", c["n_heads"])
            c["rope_theta"] = ac.get("rope_theta", 10000.0)
            if ac.get("clip_qkv"):
                c["clip_qkv"] = ac["clip_qkv"]
            c["intermediate_size"] = fc.get("ffn_hidden_size")
            c.setdefault(
                "max_position_embeddings", c.get("max_seq_len", 4096)
            )
        if "n_embd" in c and "hidden_size" not in c:
            # GPT-2 / GPTBigCode-style naming
            c = self.hf_config = dict(c)
            c["hidden_size"] = c["n_embd"]
            c.setdefault("num_hidden_layers", c.get("n_layer"))
            c["num_attention_heads"] = c["n_head"]
            c["intermediate_size"] = c.get("n_inner") or 4 * c["n_embd"]
            c.setdefault("max_position_embeddings", c.get("n_positions", 1024))
            if c.get("multi_query"):  # GPTBigCode MQA
                c["num_key_value_heads"] = 1
        if self.quant_config is None and c.get("quantization_config"):
            # direct construction path (tests/bench) — detect inline config
            self.quant_config = detect_quant_config("", c)
        archs = c.get("architectures") or ["LlamaForCausalLM"]
        if isinstance(c.get("text_config"), dict) and archs[0].startswith(
            ("Llava", "Qwen2_5_VL", "Gemma3")
        ):
            # VLM wrapper configs nest the language model under text_config;
            # flatten it so the LM geometry reads uniformly (vision_config
            # and image_token_index stay at the top level)
            merged = dict(c)
            merged.update({
                k: v for k, v in c["text_config"].items()
                if k != "architectures"
            })
            c = self.hf_config = merged
        self.architecture = archs[0]
        self.vocab_size = int(c["vocab_size"])
        self.hidden_size = int(c["hidden_size"])
        self.num_layers = int(c.get("num_hidden_layers", c.get("n_layer")))
        self.num_attention_heads = int(c["num_attention_heads"])
        self.num_kv_heads = int(c.get("num_key_value_heads", self.num_attention_heads))
        self.head_dim = int(c.get("head_dim") or self.hidden_size // self.num_attention_heads)
        if c.get("kv_lora_rank"):  # MLA (DeepSeek V2/V3)
            self.is_mla = True
            self.kv_lora_rank = int(c["kv_lora_rank"])
            self.qk_rope_head_dim = int(c["qk_rope_head_dim"])
            # the cache stores ONE latent row [c_kv | k_pe] per token,
            # padded to a 128-lane multiple for the Pallas kernels
            self.num_kv_heads = 1
            lat = self.kv_lora_rank + self.qk_rope_head_dim
            self.head_dim = (lat + 127) // 128 * 128
        inter = c.get("intermediate_size") or c.get("ffn_dim")  # OPT: ffn_dim
        if isinstance(inter, (list, tuple)):  # Gemma3n: per-layer list
            inter = max(inter)
        self.intermediate_size = int(inter)
        # hybrid linear-attention models (qwen3_next): only full-attention
        # layers own KV pages; linear layers keep per-request state rows
        lt = c.get("layer_types")
        self.full_attention_layers = (
            [i for i, t in enumerate(lt) if t == "full_attention"]
            if isinstance(lt, list) and "linear_attention" in lt else None
        )
        # NemotronH-style per-layer component pattern: only '*' layers own
        # KV pages (M = mamba2, - = MLP, E = MoE)
        pat = c.get("hybrid_override_pattern")
        if self.full_attention_layers is None and isinstance(pat, str) and pat:
            self.full_attention_layers = [
                i for i, ch in enumerate(pat) if ch == "*"
            ]
        # Kimi Linear: `linear_attn_config.kda_layers` is 1-INDEXED
        # (reference `srt/configs/kimi_linear.py:136` is_kda_layer)
        lac = c.get("linear_attn_config")
        if (
            self.full_attention_layers is None
            and isinstance(lac, dict)
            and lac.get("kda_layers")
        ):
            kda = {int(i) - 1 for i in lac["kda_layers"]}
            self.full_attention_layers = [
                i for i in range(self.num_layers) if i not in kda
            ]
        self.num_kv_layers = (
            len(self.full_attention_layers)
            if self.full_attention_layers is not None else self.num_layers
        )
        self.rms_norm_eps = float(
            c.get("rms_norm_eps",
                  c.get("layer_norm_eps",
                        c.get("norm_epsilon",
                              c.get("norm_eps",
                                    c.get("layer_norm_epsilon", 1e-6)))))
        )  # Cohere: layer_norm_eps; StarCoder2: norm_epsilon; GPT-2: layer_norm_epsilon
        self.rope_theta = float(c.get("rope_theta", 10000.0))
        self.rope_scaling = c.get("rope_scaling")
        self.max_position_embeddings = int(c.get("max_position_embeddings", 4096))
        self.tie_word_embeddings = bool(c.get("tie_word_embeddings", False))
        self.bos_token_id = c.get("bos_token_id")
        self.eos_token_id = c.get("eos_token_id")
        if self.context_length is None:
            self.context_length = self.max_position_embeddings

    @property
    def is_quantized(self) -> bool:
        return self.quant_config is not None

    def eos_token_ids(self) -> set:
        e = self.eos_token_id
        if e is None:
            return set()
        if isinstance(e, int):
            return {e}
        return set(e)

    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "config.json"), "w") as f:
            json.dump(self.hf_config, f, indent=2)
