"""Model registry: HF architecture string -> implementation class.

Role-parity with the reference's vllm/model_executor/models/__init__.py
registry (35+ architectures).  Families share implementations — e.g. the
Llama module serves Llama/Mistral/Aquila/InternLM-style checkpoints.
"""
from __future__ import annotations

import importlib
from typing import Optional, Type

# architecture -> (module, class)
_MODEL_REGISTRY = {
    "LlamaForCausalLM": ("llama", "LlamaForCausalLM"),
    "LLaMAForCausalLM": ("llama", "LlamaForCausalLM"),
    "MistralForCausalLM": ("llama", "LlamaForCausalLM"),
    "Qwen2ForCausalLM": ("qwen2", "Qwen2ForCausalLM"),
    "QWenLMHeadModel": ("qwen", "QWenLMHeadModel"),
    "GemmaForCausalLM": ("gemma", "GemmaForCausalLM"),
    "OPTForCausalLM": ("opt", "OPTForCausalLM"),
    "GPT2LMHeadModel": ("gpt2", "GPT2LMHeadModel"),
    "GPT2ForCausalLM": ("gpt2", "GPT2LMHeadModel"),
    "GPTNeoXForCausalLM": ("gpt_neox", "GPTNeoXForCausalLM"),
    "GPTJForCausalLM": ("gpt_j", "GPTJForCausalLM"),
    "MixtralForCausalLM": ("mixtral", "MixtralForCausalLM"),
    "PhiForCausalLM": ("phi", "PhiForCausalLM"),
    "StableLmForCausalLM": ("stablelm", "StableLmForCausalLM"),
    "StablelmForCausalLM": ("stablelm", "StableLmForCausalLM"),
    "StableLMEpochForCausalLM": ("stablelm", "StableLmForCausalLM"),
    "Starcoder2ForCausalLM": ("starcoder2", "Starcoder2ForCausalLM"),
    "InternLM2ForCausalLM": ("internlm2", "InternLM2ForCausalLM"),
    "AquilaForCausalLM": ("llama", "LlamaForCausalLM"),
    "AquilaModel": ("llama", "LlamaForCausalLM"),
    "InternLMForCausalLM": ("llama", "LlamaForCausalLM"),
    "YiForCausalLM": ("llama", "LlamaForCausalLM"),
    "BaiChuanForCausalLM": ("baichuan", "BaichuanForCausalLM"),
    "BaichuanForCausalLM": ("baichuan", "BaichuanForCausalLM"),
    "BloomForCausalLM": ("bloom", "BloomForCausalLM"),
    "FalconForCausalLM": ("falcon", "FalconForCausalLM"),
    "RWForCausalLM": ("falcon", "FalconForCausalLM"),
    "MPTForCausalLM": ("mpt", "MPTForCausalLM"),
    "MptForCausalLM": ("mpt", "MPTForCausalLM"),
    "GPTBigCodeForCausalLM": ("gpt_bigcode", "GPTBigCodeForCausalLM"),
    "DeepseekForCausalLM": ("deepseek", "DeepseekForCausalLM"),
    "DbrxForCausalLM": ("dbrx", "DbrxForCausalLM"),
    # The fork's dbrx_quant.py role: quantized checkpoints flow through
    # the same per-expert quant-dict path in dbrx.py.
    "QuantDbrxForCausalLM": ("dbrx", "DbrxForCausalLM"),
    "ChatGLMModel": ("chatglm", "ChatGLMForCausalLM"),
    "ChatGLMForConditionalGeneration": ("chatglm", "ChatGLMForCausalLM"),
    "OlmoForCausalLM": ("olmo", "OlmoForCausalLM"),
    "OLMoForCausalLM": ("olmo", "OlmoForCausalLM"),
    "OrionForCausalLM": ("orion", "OrionForCausalLM"),
    "DeciLMForCausalLM": ("decilm", "DeciLMForCausalLM"),
    "StarcoderForCausalLM": ("gpt_bigcode", "GPTBigCodeForCausalLM"),
}


class ModelRegistry:

    @staticmethod
    def load_model_cls(model_arch: str) -> Optional[Type]:
        if model_arch not in _MODEL_REGISTRY:
            return None
        module_name, cls_name = _MODEL_REGISTRY[model_arch]
        module = importlib.import_module(
            f"vllm_splitwise_tpu.models.{module_name}")
        return getattr(module, cls_name, None)

    @staticmethod
    def get_supported_archs():
        return list(_MODEL_REGISTRY.keys())
