"""Model registry.

Role model: the reference's `EntryClass` convention + auto-import registry
(`python/sglang/srt/models/registry.py:18,93-128`).  Architectures map to
model classes by HF `architectures[0]`.
"""

from __future__ import annotations

from typing import Dict, Type


def get_model_class(architecture: str):
    from sglang_awq_tpu.models.gemma import (
        Gemma2ForCausalLM,
        Gemma3ForCausalLM,
        GemmaForCausalLM,
    )
    from sglang_awq_tpu.models.llama import LlamaForCausalLM
    from sglang_awq_tpu.models.llava import LlavaForCausalLM
    from sglang_awq_tpu.models.gemma3_mm import Gemma3MMForConditionalGeneration
    from sglang_awq_tpu.models.llama4 import Llama4ForCausalLM
    from sglang_awq_tpu.models.llama_embedding import (
        LlamaEmbeddingModel,
        Qwen2ForRewardModel,
    )
    from sglang_awq_tpu.models.mixtral import MixtralForCausalLM
    from sglang_awq_tpu.models.cohere import CohereForCausalLM
    from sglang_awq_tpu.models.glm import Glm4ForCausalLM, GlmForCausalLM
    from sglang_awq_tpu.models.granite import (
        GraniteForCausalLM,
        GraniteMoeForCausalLM,
    )
    from sglang_awq_tpu.models.olmo2 import (
        Olmo2ForCausalLM,
        Olmo3ForCausalLM,
    )
    from sglang_awq_tpu.models.phi3 import Phi3ForCausalLM
    from sglang_awq_tpu.models.phimoe import PhimoeForCausalLM
    from sglang_awq_tpu.models.qwen2 import Qwen2ForCausalLM, Qwen3ForCausalLM
    from sglang_awq_tpu.models.smollm3 import SmolLM3ForCausalLM
    from sglang_awq_tpu.models.starcoder2 import (
        ArceeForCausalLM,
        Ernie4_5ForCausalLM,
        GPTNeoXForCausalLM,
        HeliumForCausalLM,
        NemotronForCausalLM,
        OlmoForCausalLM,
        SeedOssForCausalLM,
        PhiForCausalLM,
        StableLmForCausalLM,
        Starcoder2ForCausalLM,
    )
    from sglang_awq_tpu.models.qwen2_moe import (
        Qwen2MoeForCausalLM,
        Qwen3MoeForCausalLM,
    )
    from sglang_awq_tpu.models.falcon_h1 import FalconH1ForCausalLM
    from sglang_awq_tpu.models.nemotron_h import NemotronHForCausalLM
    from sglang_awq_tpu.models.qwen3_next import Qwen3NextForCausalLM
    from sglang_awq_tpu.models.kimi_linear import KimiLinearForCausalLM
    from sglang_awq_tpu.models.gemma3n import Gemma3nForCausalLM
    from sglang_awq_tpu.models.qwen2_5_vl import Qwen2_5_VLForCausalLM
    from sglang_awq_tpu.models.baichuan import (
        BaichuanForCausalLM,
        InternLM2ForCausalLM,
        MiniCPMForCausalLM,
    )
    from sglang_awq_tpu.models.deepseek_v2 import (
        DeepseekV2ForCausalLM,
        DeepseekV3ForCausalLM,
    )
    from sglang_awq_tpu.models.gpt_oss import GptOssForCausalLM
    from sglang_awq_tpu.models.olmoe import OlmoeForCausalLM
    from sglang_awq_tpu.models.exaone4 import Exaone4ForCausalLM
    from sglang_awq_tpu.models.glm4_moe import (
        Dots1ForCausalLM,
        Glm4MoeForCausalLM,
        MiniMaxM2ForCausalLM,
    )
    from sglang_awq_tpu.models.ernie45_moe import Ernie45MoeForCausalLM
    from sglang_awq_tpu.models.dbrx import DbrxForCausalLM
    from sglang_awq_tpu.models.hunyuan import HunYuanDenseV1ForCausalLM
    from sglang_awq_tpu.models.apertus import ApertusForCausalLM
    from sglang_awq_tpu.models.gpt2 import (
        GPT2LMHeadModel,
        GPTBigCodeForCausalLM,
        OPTForCausalLM,
    )

    registry: Dict[str, Type] = {
        "LlamaForCausalLM": LlamaForCausalLM,
        "TinyLlamaForCausalLM": LlamaForCausalLM,
        "MistralForCausalLM": LlamaForCausalLM,  # same graph, no bias
        "MixtralForCausalLM": MixtralForCausalLM,
        "LlavaForConditionalGeneration": LlavaForCausalLM,
        "Llama4ForCausalLM": Llama4ForCausalLM,
        # embedding / reward heads (reference llama_embedding.py, qwen2_rm.py)
        "MistralModel": LlamaEmbeddingModel,
        "LlamaModel": LlamaEmbeddingModel,
        "Qwen2ForRewardModel": Qwen2ForRewardModel,
        "Qwen2ForSequenceClassification": Qwen2ForRewardModel,
        "Qwen2ForCausalLM": Qwen2ForCausalLM,
        "Qwen3ForCausalLM": Qwen3ForCausalLM,
        "Qwen2MoeForCausalLM": Qwen2MoeForCausalLM,
        "Qwen3MoeForCausalLM": Qwen3MoeForCausalLM,
        "FalconH1ForCausalLM": FalconH1ForCausalLM,
        "NemotronHForCausalLM": NemotronHForCausalLM,
        "Qwen3NextForCausalLM": Qwen3NextForCausalLM,
        "KimiLinearForCausalLM": KimiLinearForCausalLM,
        "Gemma3nForCausalLM": Gemma3nForCausalLM,
        "Qwen2_5_VLForConditionalGeneration": Qwen2_5_VLForCausalLM,
        "BaichuanForCausalLM": BaichuanForCausalLM,
        "BaiChuanForCausalLM": BaichuanForCausalLM,
        "InternLM2ForCausalLM": InternLM2ForCausalLM,
        "MiniCPMForCausalLM": MiniCPMForCausalLM,
        "Phi3ForCausalLM": Phi3ForCausalLM,
        "PhimoeForCausalLM": PhimoeForCausalLM,
        "Olmo2ForCausalLM": Olmo2ForCausalLM,
        "Olmo3ForCausalLM": Olmo3ForCausalLM,
        "OlmoForCausalLM": OlmoForCausalLM,
        "HeliumForCausalLM": HeliumForCausalLM,
        "SmolLM3ForCausalLM": SmolLM3ForCausalLM,
        "ArceeForCausalLM": ArceeForCausalLM,
        "SeedOssForCausalLM": SeedOssForCausalLM,
        "GlmForCausalLM": GlmForCausalLM,
        "Glm4ForCausalLM": Glm4ForCausalLM,
        "Ernie4_5ForCausalLM": Ernie4_5ForCausalLM,
        "Starcoder2ForCausalLM": Starcoder2ForCausalLM,
        "NemotronForCausalLM": NemotronForCausalLM,
        "PhiForCausalLM": PhiForCausalLM,
        "StableLmForCausalLM": StableLmForCausalLM,
        "GPTNeoXForCausalLM": GPTNeoXForCausalLM,
        "CohereForCausalLM": CohereForCausalLM,
        "GraniteForCausalLM": GraniteForCausalLM,
        "GraniteMoeForCausalLM": GraniteMoeForCausalLM,
        "GemmaForCausalLM": GemmaForCausalLM,
        "Gemma2ForCausalLM": Gemma2ForCausalLM,
        "Gemma3ForCausalLM": Gemma3ForCausalLM,
        "Gemma3ForConditionalGeneration": Gemma3MMForConditionalGeneration,
        "DeepseekV2ForCausalLM": DeepseekV2ForCausalLM,
        "DeepseekV3ForCausalLM": DeepseekV3ForCausalLM,
        "GptOssForCausalLM": GptOssForCausalLM,
        "OlmoeForCausalLM": OlmoeForCausalLM,
        "Exaone4ForCausalLM": Exaone4ForCausalLM,
        "Glm4MoeForCausalLM": Glm4MoeForCausalLM,
        "MiniMaxM2ForCausalLM": MiniMaxM2ForCausalLM,
        "Ernie4_5_MoeForCausalLM": Ernie45MoeForCausalLM,
        "Dots1ForCausalLM": Dots1ForCausalLM,
        "DbrxForCausalLM": DbrxForCausalLM,
        "HunYuanDenseV1ForCausalLM": HunYuanDenseV1ForCausalLM,
        "ApertusForCausalLM": ApertusForCausalLM,
        "GPT2LMHeadModel": GPT2LMHeadModel,
        "GPTBigCodeForCausalLM": GPTBigCodeForCausalLM,
        "OPTForCausalLM": OPTForCausalLM,
    }
    if architecture not in registry:
        raise ValueError(
            f"unsupported architecture {architecture!r}; known: {sorted(registry)}"
        )
    return registry[architecture]
