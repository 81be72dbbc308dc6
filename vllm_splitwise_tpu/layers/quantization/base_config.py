"""Quantization config interface.

A config knows (a) which serialized tensor names make up one quantized
linear weight, (b) how to convert them to the internal layout consumed by
``layers.linear.dense`` (pack2G int4 / int8 / dense), and (c) how to
synthesize random quantized weights for ``load_format='dummy'``.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, List

import numpy as np


class QuantizationConfig(ABC):

    @classmethod
    @abstractmethod
    def get_name(cls) -> str:
        ...

    @classmethod
    @abstractmethod
    def from_config(cls, config: Dict[str, Any]) -> "QuantizationConfig":
        """Build from the HF `quantization_config` dict."""

    @classmethod
    def get_from_keys(cls, config: Dict[str, Any],
                      keys: List[str]) -> Any:
        for key in keys:
            if key in config:
                return config[key]
        raise ValueError(f"Cannot find any of {keys} in the model's "
                         "quantization config.")

    @property
    @abstractmethod
    def tensor_names(self) -> List[str]:
        """Per-linear serialized tensor suffixes (e.g. qweight, scales)."""

    def is_complete(self, parts: Dict[str, np.ndarray]) -> bool:
        return all(n in parts for n in self.tensor_names)

    @abstractmethod
    def convert(self, parts: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Serialized tensors -> internal param dict ([in, out] layout)."""

    @abstractmethod
    def make_dummy(self, rng: np.random.RandomState, in_features: int,
                   out_features: int,
                   group_size: int = None) -> Dict[str, Any]:
        """Random quantized weights (group_size overrides the config's
        when the layer is too small for it)."""
