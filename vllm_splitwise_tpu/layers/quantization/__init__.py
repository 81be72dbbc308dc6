"""Quantization method registry (reference role:
vllm/model_executor/layers/quantization/__init__.py)."""
from __future__ import annotations

from typing import Dict, Type

from vllm_splitwise_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_splitwise_tpu.layers.quantization.awq import AWQConfig
from vllm_splitwise_tpu.layers.quantization.gptq import GPTQConfig
from vllm_splitwise_tpu.layers.quantization.int8 import Int8Config
from vllm_splitwise_tpu.layers.quantization.marlin import MarlinConfig
from vllm_splitwise_tpu.layers.quantization.squeezellm import (
    SqueezeLLMConfig)

_QUANTIZATION_CONFIG_REGISTRY: Dict[str, Type[QuantizationConfig]] = {
    "awq": AWQConfig,
    "gptq": GPTQConfig,
    "squeezellm": SqueezeLLMConfig,
    "int8": Int8Config,
    "marlin": MarlinConfig,
}


def get_quantization_config(quantization: str) -> Type[QuantizationConfig]:
    if quantization not in _QUANTIZATION_CONFIG_REGISTRY:
        raise ValueError(f"Invalid quantization method: {quantization}")
    return _QUANTIZATION_CONFIG_REGISTRY[quantization]


__all__ = [
    "QuantizationConfig",
    "AWQConfig",
    "GPTQConfig",
    "SqueezeLLMConfig",
    "Int8Config",
    "MarlinConfig",
    "get_quantization_config",
]
