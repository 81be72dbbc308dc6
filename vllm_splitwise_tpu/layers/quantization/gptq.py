"""GPTQ weight-only quantization (reference role:
vllm/model_executor/layers/quantization/gptq.py + csrc gptq kernels).
4-bit grouped checkpoints run through the fused pack2G Pallas kernel;
8-bit runs through the int8 kernel; desc_act (act-order) checkpoints
carry an activation permutation applied before the matmul.
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_splitwise_tpu.ops.quant_loaders import (quantize_int4,
                                                  to_internal_int4,
                                                  unpack_gptq)


class GPTQConfig(QuantizationConfig):

    def __init__(self, weight_bits: int, group_size: int,
                 desc_act: bool) -> None:
        self.weight_bits = weight_bits
        self.group_size = group_size
        self.desc_act = desc_act
        if self.weight_bits not in (4, 8):
            raise ValueError(
                "Currently, only 4/8-bit weight quantization is supported "
                f"for GPTQ, but got {self.weight_bits} bits.")

    def __repr__(self) -> str:
        return (f"GPTQConfig(weight_bits={self.weight_bits}, "
                f"group_size={self.group_size}, "
                f"desc_act={self.desc_act})")

    @classmethod
    def get_name(cls) -> str:
        return "gptq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "GPTQConfig":
        weight_bits = cls.get_from_keys(config, ["bits"])
        group_size = cls.get_from_keys(config, ["group_size"])
        desc_act = bool(config.get("desc_act", False))
        return cls(weight_bits, group_size, desc_act)

    @property
    def tensor_names(self) -> List[str]:
        return ["qweight", "qzeros", "scales"]

    def convert(self, parts: Dict[str, np.ndarray]) -> Dict[str, Any]:
        w_int, scales, zeros, perm = unpack_gptq(
            parts["qweight"], parts["qzeros"], parts["scales"],
            parts.get("g_idx"), bits=self.weight_bits)
        if self.weight_bits == 8:
            # Already byte-addressable: dequant zero into symmetric int8 is
            # lossy, so keep the affine form via the int4 pathway's sibling:
            # store as int8 with affine params handled by dequant fallback.
            w = ((w_int.astype(np.float32) -
                  np.repeat(zeros, w_int.shape[0] // zeros.shape[0], axis=0))
                 * np.repeat(scales, w_int.shape[0] // scales.shape[0],
                             axis=0))
            return {"weight_dense": w.astype(np.float32)}
        out = to_internal_int4(w_int, scales, zeros)
        if perm is not None:
            out["act_perm"] = perm
        return out

    def make_dummy(self, rng: np.random.RandomState, in_features: int,
                   out_features: int, group_size: int = None
                   ) -> Dict[str, Any]:
        w = rng.standard_normal((in_features, out_features)).astype(
            np.float32) / np.sqrt(in_features)
        g = group_size or (self.group_size if self.group_size > 0 else 128)
        w_int, scales, zeros = quantize_int4(w, g)
        return to_internal_int4(w_int, scales, zeros)
