"""Symmetric per-channel INT8 weight-only quantization (TPU-native
addition — the natural low-effort 2x bandwidth win; quantizes any dense
checkpoint on the fly at load time, no calibration tensors needed)."""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from vllm_splitwise_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_splitwise_tpu.ops.quant_loaders import quantize_int8


class Int8Config(QuantizationConfig):

    def __init__(self) -> None:
        pass

    def __repr__(self) -> str:
        return "Int8Config()"

    @classmethod
    def get_name(cls) -> str:
        return "int8"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "Int8Config":
        return cls()

    @property
    def tensor_names(self) -> List[str]:
        # Quantizes plain dense checkpoints: the convert hook receives the
        # dense fp weight.
        return ["weight"]

    def quantize_on_the_fly(self) -> bool:
        return True

    def convert(self, parts: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w = parts["weight"].astype(np.float32)
        qweight, scales = quantize_int8(w)
        return {"qweight": qweight, "scales": scales}

    def make_dummy(self, rng: np.random.RandomState, in_features: int,
                   out_features: int, group_size: int = None
                   ) -> Dict[str, Any]:
        w = rng.standard_normal((in_features, out_features)).astype(
            np.float32) / np.sqrt(in_features)
        qweight, scales = quantize_int8(w)
        return {"qweight": qweight, "scales": scales}
