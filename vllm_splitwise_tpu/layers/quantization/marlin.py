"""Marlin W4A16 checkpoints (reference role:
vllm/model_executor/layers/quantization/marlin.py + the dedicated
csrc/quantization/marlin/marlin_cuda_kernel.cu GEMM).

TPU redesign: marlin's value is a GPU kernel schedule, not a numeric
format — its tile/thread permutation is inverted once at load time
(ops/quant_loaders.unpack_marlin) and the weights run through the same
fused int4 dequant+matmul Pallas kernel as GPTQ/AWQ.  Symmetric 4-bit,
zero point 8, group size 128 or channelwise (-1).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from vllm_splitwise_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_splitwise_tpu.ops.quant_loaders import (to_internal_int4,
                                                  unpack_marlin)


class MarlinConfig(QuantizationConfig):

    def __init__(self, group_size: int) -> None:
        if group_size not in (128, -1):
            raise ValueError(
                "Currently, only group size 128 and -1 (channelwise) is "
                f"supported for Marlin, but got group_size {group_size}.")
        self.group_size = group_size

    def __repr__(self) -> str:
        return f"MarlinConfig(group_size={self.group_size})"

    @classmethod
    def get_name(cls) -> str:
        return "marlin"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "MarlinConfig":
        return cls(cls.get_from_keys(config, ["group_size"]))

    @property
    def tensor_names(self) -> List[str]:
        # Marlin serializes the packed weight as "B" and scales as "s"
        # (reference marlin.py:193-195); its "workspace" tensor is a GPU
        # locking scratch with no TPU role.
        return ["B", "s"]

    def convert(self, parts: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w_int, scales, zeros = unpack_marlin(parts["B"], parts["s"])
        return to_internal_int4(w_int, scales, zeros)

    def make_dummy(self, rng: np.random.RandomState, in_features: int,
                   out_features: int, group_size: int = None
                   ) -> Dict[str, Any]:
        from vllm_splitwise_tpu.ops.quant_loaders import quantize_int4
        w = rng.standard_normal((in_features, out_features)).astype(
            np.float32) / np.sqrt(in_features)
        g = group_size or (128 if self.group_size == -1 else
                           self.group_size)
        w_int, scales, zeros = quantize_int4(w, g)
        return to_internal_int4(w_int, scales, zeros)
