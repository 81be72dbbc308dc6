"""SqueezeLLM LUT quantization (reference role:
vllm/model_executor/layers/quantization/squeezellm.py + csrc LUT kernel).

The per-channel 16-entry lookup table has no affine structure, so the
weight is reconstructed at LOAD time and requantized symmetric int8
(lossless to ~1e-2 of the LUT values, recovering the memory/bandwidth
win through the int8 fused kernel) rather than running a gather in the
hot loop — gathers waste the MXU on TPU.
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from vllm_splitwise_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_splitwise_tpu.ops.quant_loaders import (quantize_int8,
                                                  unpack_squeezellm)


class SqueezeLLMConfig(QuantizationConfig):

    def __init__(self, weight_bits: int) -> None:
        self.weight_bits = weight_bits
        if self.weight_bits != 4:
            raise ValueError(
                "Currently, only 4-bit weight quantization is supported "
                f"for SqueezeLLM, but got {self.weight_bits} bits.")

    def __repr__(self) -> str:
        return f"SqueezeLLMConfig(weight_bits={self.weight_bits})"

    @classmethod
    def get_name(cls) -> str:
        return "squeezellm"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "SqueezeLLMConfig":
        weight_bits = cls.get_from_keys(config, ["wbits", "bits"])
        return cls(weight_bits)

    @property
    def tensor_names(self) -> List[str]:
        return ["qweight", "lookup_table"]

    def convert(self, parts: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w = unpack_squeezellm(parts["qweight"], parts["lookup_table"])
        qweight, scales = quantize_int8(w)
        return {"qweight": qweight, "scales": scales}

    def make_dummy(self, rng: np.random.RandomState, in_features: int,
                   out_features: int, group_size: int = None
                   ) -> Dict[str, Any]:
        w = rng.standard_normal((in_features, out_features)).astype(
            np.float32) / np.sqrt(in_features)
        qweight, scales = quantize_int8(w)
        return {"qweight": qweight, "scales": scales}
