"""AWQ weight-only quantization (reference role:
vllm/model_executor/layers/quantization/awq.py + csrc awq kernels)."""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from vllm_splitwise_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_splitwise_tpu.ops.quant_loaders import (quantize_int4,
                                                  to_internal_int4,
                                                  unpack_awq)


class AWQConfig(QuantizationConfig):

    def __init__(self, weight_bits: int, group_size: int,
                 zero_point: bool) -> None:
        self.weight_bits = weight_bits
        self.group_size = group_size
        self.zero_point = zero_point
        if self.weight_bits != 4:
            raise ValueError(
                "Currently, only 4-bit weight quantization is supported "
                f"for AWQ, but got {self.weight_bits} bits.")

    def __repr__(self) -> str:
        return (f"AWQConfig(weight_bits={self.weight_bits}, "
                f"group_size={self.group_size}, "
                f"zero_point={self.zero_point})")

    @classmethod
    def get_name(cls) -> str:
        return "awq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "AWQConfig":
        weight_bits = cls.get_from_keys(config, ["w_bit", "bits"])
        group_size = cls.get_from_keys(config, ["q_group_size",
                                                "group_size"])
        zero_point = bool(
            config.get("zero_point", config.get("zero_point", True)))
        return cls(weight_bits, group_size, zero_point)

    @property
    def tensor_names(self) -> List[str]:
        return ["qweight", "qzeros", "scales"]

    def convert(self, parts: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w_int, scales, zeros = unpack_awq(parts["qweight"],
                                          parts["qzeros"],
                                          parts["scales"],
                                          bits=self.weight_bits)
        return to_internal_int4(w_int, scales, zeros)

    def make_dummy(self, rng: np.random.RandomState, in_features: int,
                   out_features: int, group_size: int = None
                   ) -> Dict[str, Any]:
        w = rng.standard_normal((in_features, out_features)).astype(
            np.float32) / np.sqrt(in_features)
        g = group_size or (self.group_size if self.group_size > 0 else 128)
        w_int, scales, zeros = quantize_int4(w, g)
        return to_internal_int4(w_int, scales, zeros)
