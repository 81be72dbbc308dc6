"""SqueezeLLM LUT quantization (reference role:
vllm/model_executor/layers/quantization/squeezellm.py + the exact LUT
dequant CUDA kernel, csrc/quantization/squeezellm/quant_cuda_kernel.cu).

The per-channel 16-entry lookup table has no affine structure, so there
are two serving modes:

* ``exact`` (default, reference parity): weights are reconstructed at
  load time as float16 — EXACTLY the LUT entries, bit-for-bit (the
  checkpoint LUT is float16) — and the matmul runs in float32 precision,
  matching the CUDA kernel's fp16-weights/fp32-accumulate semantics.
  On TPU there is no fast in-register gather, so the 4-bit HBM
  footprint of the CUDA kernel becomes 16-bit here; SqueezeLLM's
  *accuracy story* is preserved at the cost of the bandwidth win.
* ``int8`` (opt-in via VST_SQUEEZELLM_INT8=1): the LUT-dequantized
  weights are requantized to symmetric per-channel int8 and served
  through the fused int8 kernel — the r4 behavior.  ~1e-2-relative
  deviation from the LUT values, 2x less HBM, faster decode.
"""
from __future__ import annotations

import os
from typing import Any, Dict, List

import numpy as np

from vllm_splitwise_tpu.layers.quantization.base_config import (
    QuantizationConfig)
from vllm_splitwise_tpu.ops.quant_loaders import (quantize_int8,
                                                  unpack_squeezellm)


def _int8_mode() -> bool:
    return os.environ.get("VST_SQUEEZELLM_INT8", "0") == "1"


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
        if _int8_mode():
            qweight, scales = quantize_int8(w)
            return {"qweight": qweight, "scales": scales}
        # Exact: float16 holds every LUT entry bit-for-bit (checkpoints
        # store the LUT as float16), so the served weight matrix IS the
        # LUT dequantization, not an approximation of it.
        return {"weight_lut": w.astype(np.float16)}

    def make_dummy(self, rng: np.random.RandomState, in_features: int,
                   out_features: int, group_size: int = None
                   ) -> Dict[str, Any]:
        # Dummy generation mirrors the real layout: a per-channel
        # 16-entry LUT and random codes.
        lut = (rng.standard_normal((out_features, 16)) /
               np.sqrt(in_features)).astype(np.float16)
        codes = rng.randint(0, 16, size=(in_features, out_features))
        w = lut[np.arange(out_features)[None, :], codes].astype(
            np.float32)
        if _int8_mode():
            qweight, scales = quantize_int8(w)
            return {"qweight": qweight, "scales": scales}
        return {"weight_lut": w.astype(np.float16)}
