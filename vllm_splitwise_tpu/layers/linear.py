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

import os
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


def _block_n() -> int:
    """Preferred N tile for the stacked quant matmuls (A/B tunable via
    VST_QM_BLOCK_N; _pick_block caps it to the largest 128-aligned
    divisor of N).  Full-width tiles won the on-chip A/B at decode
    batch sizes: fewer, fully contiguous weight-row DMAs."""
    return int(os.environ.get("VST_QM_BLOCK_N", "16384"))


def _w4a8_enabled() -> bool:
    """W4A8 (int8-MXU) decode matmuls, default on; VST_W4A8=0 reverts to
    exact bf16 weight dequant.  Read at trace time so tests can pin it."""
    return os.environ.get("VST_W4A8", "1") == "1"


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


def dense(x: jax.Array, w, bias: Optional[jax.Array] = None,
          layer_index=None, pre_op: str = "none",
          pre_w: Optional[jax.Array] = None,
          pre_eps: float = 1e-6,
          residual: Optional[jax.Array] = None) -> jax.Array:
    """The universal projection: y = x @ W (+ b) where W is either a plain
    [in, out] array or a quantized param dict (pack2G int4 / int8 /
    dense-fallback — see ops/quant_matmul.py).  Models call this instead
    of jnp.dot so quantization is a checkpoint property, not a model-code
    property (the role of the reference's LinearMethodBase plug-ins).

    ``pre_op``/``pre_w`` optionally fold the op feeding the projection
    ("rmsnorm" with its weight, or "silu_mul" on a merged gate_up
    output) into the W4A8 kernel's quantize prologue — one fused launch
    instead of separate elementwise fusions; every other weight kind
    applies the same math in XLA first (identical numerics).
    ``residual`` folds the transformer skip-add (y += residual) into the
    W4A8 kernel's epilogue; other paths add it in XLA (commutative —
    identical numerics either way)."""
    if isinstance(w, dict):
        from vllm_splitwise_tpu.ops.quant_matmul import (
            quant_matmul_int4, quant_matmul_int4_stacked, quant_matmul_int8,
            quant_matmul_int8_stacked)
        from vllm_splitwise_tpu.ops.quant_matmul import apply_pre_op
        lead = x.shape[:-1]
        k = x.shape[-1]
        x2 = x.reshape(-1, k)

        # The pre-op can ride the W4A8 kernel's fused quantize prologue
        # only on the plain stacked-int4 path; everywhere else apply the
        # identical XLA math up front.
        fusable = ("sz_bands" in w and "weight_dense" not in w
                   and "act_perm" not in w and w["qweight"].ndim == 3)
        if pre_op != "none" and not fusable:
            x2 = apply_pre_op(x2, pre_op, pre_w, pre_eps)
            k = x2.shape[-1]
            pre_op = "none"

        if "act_perm" in w:
            # GPTQ desc_act: activations follow the weight-row reorder.
            perm = w["act_perm"]
            if perm.ndim == 2:  # stacked [L, K]: same perm every layer
                perm = perm[0]
            x2 = jnp.take(x2, perm, axis=1)

        def pad_phantom(x2, k):
            # Odd-group-count weights carry one phantom zero group (see
            # quant_loaders.to_internal_int4); pad x's K dim with zeros
            # to match the packed weight's K.  (The fused W4A8 wrapper
            # pads internally instead — it must see the real width for
            # the rmsnorm mean.)
            k_w = w["qweight"].shape[-2] * 2
            if k_w > k:
                return jnp.pad(x2, ((0, 0), (0, k_w - k))), k_w
            return x2, k

        if "weight_lut" in w:
            # Exact SqueezeLLM (quantization/squeezellm.py): the f16
            # weights ARE the LUT entries; compute in f32 so no bf16
            # rounding re-approximates them (the reference CUDA kernel's
            # fp16-weights / fp32-accumulate semantics,
            # csrc/quantization/squeezellm/quant_cuda_kernel.cu).
            wl = w["weight_lut"]
            if wl.ndim == 3:
                wl = jax.lax.dynamic_index_in_dim(wl, layer_index,
                                                  keepdims=False)
            y = jnp.dot(x2.astype(jnp.float32), wl.astype(jnp.float32),
                        precision=jax.lax.Precision.HIGHEST
                        ).astype(x.dtype)
        elif "weight_dense" in w:
            y = jnp.dot(x2, w["weight_dense"].astype(x.dtype))
        elif "sz_bands" in w:
            from vllm_splitwise_tpu.ops.quant_matmul import (
                infer_group_size, unpack_sz_bands)
            k_eff = k // 2 if pre_op == "silu_mul" else k
            if "sz_group" in w:
                group_size = int(w["sz_group"].shape[-2])
            else:
                group_size = infer_group_size(k_eff,
                                              w["sz_bands"].shape[-2])
            if w["qweight"].ndim == 3:
                # Stacked scan layout: kernel indexes the [L, ...] stack.
                # Decode-size matmuls default to the int8-MXU W4A8
                # kernel (per-token int8 activations, ~0.4% extra quant
                # error, +44% decode tput); VST_W4A8=0 reverts to pure
                # bf16 weight dequant.
                # Mosaic needs the kernel's [bm, 4G] x-block lane dim
                # 128-aligned (one full band per superblock grid step);
                # unaligned group sizes stay on the exact dequant path
                # (whose XLA fallback is lossless).
                if (_w4a8_enabled() and x2.shape[0] <= 128
                        and (4 * group_size) % 128 == 0):
                    from vllm_splitwise_tpu.ops.quant_matmul import \
                        quant_matmul_int4_mxu_stacked
                    res2 = None
                    if residual is not None:
                        res2 = residual.reshape(-1, residual.shape[-1])
                    y = quant_matmul_int4_mxu_stacked(
                        x2, w["qweight"], w["sz_bands"], layer_index,
                        group_size=group_size, block_n=_block_n(),
                        pre_op=pre_op, pre_w=pre_w, eps=pre_eps,
                        residual=res2)
                    residual = None  # folded in-kernel
                else:
                    x2 = apply_pre_op(x2, pre_op, pre_w, pre_eps)
                    x2, _ = pad_phantom(x2, k_eff)
                    y = quant_matmul_int4_stacked(x2, w["qweight"],
                                                  w["sz_bands"],
                                                  layer_index,
                                                  group_size=group_size,
                                                  block_n=_block_n())
            else:
                # Unrolled slice of a stacked dict: un-band the scales
                # and drop any phantom padding block.
                x2, k = pad_phantom(x2, k)
                s_raw, z_raw = unpack_sz_bands(w["sz_bands"], k,
                                               group_size)
                y = quant_matmul_int4(x2, w["qweight"][:k // 2], s_raw,
                                      z_raw, group_size=group_size)
        elif "zeros" in w:
            x2, k = pad_phantom(x2, k)
            group_size = k // w["scales"].shape[-1 - 1]
            y = quant_matmul_int4(x2, w["qweight"], w["scales"], w["zeros"],
                                  group_size=group_size)
        elif w["qweight"].ndim == 3:
            y = quant_matmul_int8_stacked(x2, w["qweight"], w["scales"],
                                          layer_index)
        else:
            y = quant_matmul_int8(x2, w["qweight"], w["scales"])
        y = y.reshape(*lead, -1)
    else:
        if pre_op != "none":
            from vllm_splitwise_tpu.ops.quant_matmul import apply_pre_op
            x = apply_pre_op(x, pre_op, pre_w, pre_eps)
        y = jnp.dot(x, w)
    if bias is not None:
        y = y + bias
    if residual is not None:
        y = y + residual
    return y
