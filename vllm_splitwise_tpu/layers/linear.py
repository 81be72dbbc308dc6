"""Linear layers with pluggable quantization methods and mesh shardings.

The reference implements tensor parallelism as explicit
Column/Row/QKV/MergedColumnParallelLinear modules with hand-inserted NCCL
all-reduces (vllm/model_executor/layers/linear.py:121-643).  On TPU that
machinery collapses: parallelism is expressed as a ``PartitionSpec`` on
each weight and GSPMD inserts the collectives.  What remains — and what
this module provides — is:

* ``LinearMethodBase``: the quantization plug-in point (parity with the
  reference's ``LinearMethodBase``, linear.py:29-77).  A method owns the
  weight layout (dense bf16, packed int4 + scales, ...) and the matmul.
* Weight-loading helpers that shard/merge HF checkpoint tensors into the
  runtime layout (stacked qkv / gate+up, parity with the reference's
  per-parameter ``weight_loader`` hooks).

Weights are stored TRANSPOSED relative to torch convention:
``[in_features, out_features]`` so the forward pass is a plain
``x @ w`` (natural MXU layout, no transposes in the hot path).
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


class LinearMethodBase(ABC):
    """Owns weight creation and the forward matmul for one linear layer."""

    @abstractmethod
    def create_weights(self, in_features: int, out_features: int,
                       dtype: jnp.dtype, rng: jax.Array,
                       shard_out: bool) -> Dict[str, Any]:
        """Returns {name: array} params plus a parallel {name: PartitionSpec}
        under key '_specs'. shard_out: True = column-parallel (shard output
        dim), False = row-parallel (shard input dim)."""

    @abstractmethod
    def apply(self, params: Dict[str, Any], x: jax.Array) -> jax.Array:
        ...


class UnquantizedLinearMethod(LinearMethodBase):

    def create_weights(self, in_features, out_features, dtype, rng,
                       shard_out) -> Dict[str, Any]:
        scale = 1.0 / np.sqrt(in_features)
        w = jax.random.uniform(rng, (in_features, out_features),
                               dtype=jnp.float32, minval=-scale,
                               maxval=scale).astype(dtype)
        spec = P(None, "model") if shard_out else P("model", None)
        return {"weight": w, "_specs": {"weight": spec}}

    def apply(self, params, x):
        w = params["weight"]
        return jnp.dot(x, w, preferred_element_type=x.dtype)


def linear(x: jax.Array,
           weight: jax.Array,
           bias: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ w (+ b).  w: [in, out]."""
    y = jnp.dot(x, weight)
    if bias is not None:
        y = y + bias
    return y
