"""Rotary position embeddings with NeoX/GPT-J styles and linear /
dynamic-NTK / YaRN context-extension scaling.

Feature-parity with the reference's vllm/model_executor/layers/
rotary_embedding.py:46-279 (which offloads to a CUDA kernel at
csrc/pos_encoding_kernels.cu).  On TPU the cos/sin cache lives in HBM as a
jnp array and application is pure VPU math that XLA fuses into the
surrounding projections — no kernel needed.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _rotate_neox(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate((-x2, x1), axis=-1)


def _rotate_gptj(x: jax.Array) -> jax.Array:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    x = jnp.stack((-x2, x1), axis=-1)
    return x.reshape(*x.shape[:-2], -1)


class RotaryEmbedding:
    """Base RoPE: precomputes a [max_position, rotary_dim] cos/sin cache."""

    def __init__(
        self,
        head_size: int,
        rotary_dim: int,
        max_position_embeddings: int,
        base: float,
        is_neox_style: bool,
    ) -> None:
        self.head_size = head_size
        self.rotary_dim = rotary_dim
        self.max_position_embeddings = max_position_embeddings
        self.base = base
        self.is_neox_style = is_neox_style
        cos, sin = self._compute_cos_sin_cache()
        self.cos_cache = cos  # [max_pos, rotary_dim/2]
        self.sin_cache = sin

    def _compute_inv_freq(self, base: float) -> jax.Array:
        return 1.0 / (base**(jnp.arange(0, self.rotary_dim, 2,
                                        dtype=jnp.float32) / self.rotary_dim))

    def _compute_cos_sin_cache(self) -> Tuple[jax.Array, jax.Array]:
        inv_freq = self._compute_inv_freq(self.base)
        t = jnp.arange(self.max_position_embeddings, dtype=jnp.float32)
        freqs = jnp.einsum("i,j->ij", t, inv_freq)
        return jnp.cos(freqs), jnp.sin(freqs)

    def _apply(self, x: jax.Array, cos: jax.Array,
               sin: jax.Array) -> jax.Array:
        """x: [..., heads, head_size]; cos/sin: [..., rotary_dim/2]."""
        orig_dtype = x.dtype
        rot = x[..., :self.rotary_dim].astype(jnp.float32)
        rest = x[..., self.rotary_dim:]
        # cos/sin broadcast over the heads axis.
        cos = cos[..., None, :]
        sin = sin[..., None, :]
        if self.is_neox_style:
            cos = jnp.concatenate([cos, cos], axis=-1)
            sin = jnp.concatenate([sin, sin], axis=-1)
            out = rot * cos + _rotate_neox(rot) * sin
        else:
            cos = jnp.repeat(cos, 2, axis=-1)
            sin = jnp.repeat(sin, 2, axis=-1)
            out = rot * cos + _rotate_gptj(rot) * sin
        out = out.astype(orig_dtype)
        if rest.shape[-1] == 0:
            return out
        return jnp.concatenate([out, rest], axis=-1)

    def __call__(
        self,
        positions: jax.Array,  # [...] int32 (any leading shape)
        query: jax.Array,      # [..., num_q_heads, head_size]
        key: jax.Array,        # [..., num_kv_heads, head_size]
    ) -> Tuple[jax.Array, jax.Array]:
        cos = jnp.take(self.cos_cache, positions, axis=0, mode="clip")
        sin = jnp.take(self.sin_cache, positions, axis=0, mode="clip")
        return self._apply(query, cos, sin), self._apply(key, cos, sin)


class LinearScalingRotaryEmbedding(RotaryEmbedding):
    """Positions are divided by a constant factor (SuperHOT-style)."""

    def __init__(self, head_size, rotary_dim, max_position_embeddings, base,
                 is_neox_style, scaling_factor: float) -> None:
        self.scaling_factor = scaling_factor
        super().__init__(head_size, rotary_dim, max_position_embeddings, base,
                         is_neox_style)

    def _compute_cos_sin_cache(self):
        inv_freq = self._compute_inv_freq(self.base)
        max_len = int(self.max_position_embeddings * self.scaling_factor)
        t = jnp.arange(max_len, dtype=jnp.float32) / self.scaling_factor
        freqs = jnp.einsum("i,j->ij", t, inv_freq)
        return jnp.cos(freqs), jnp.sin(freqs)


class DynamicNTKScalingRotaryEmbedding(RotaryEmbedding):
    """NTK-aware base rescaling for the extended context."""

    def __init__(self, head_size, rotary_dim, max_position_embeddings, base,
                 is_neox_style, scaling_factor: float) -> None:
        self.scaling_factor = scaling_factor
        super().__init__(head_size, rotary_dim, max_position_embeddings, base,
                         is_neox_style)

    def _compute_cos_sin_cache(self):
        max_len = int(self.max_position_embeddings * self.scaling_factor)
        base = self.base * (
            (self.scaling_factor * max_len / self.max_position_embeddings) -
            (self.scaling_factor - 1))**(self.rotary_dim /
                                         (self.rotary_dim - 2))
        inv_freq = self._compute_inv_freq(base)
        t = jnp.arange(max_len, dtype=jnp.float32)
        freqs = jnp.einsum("i,j->ij", t, inv_freq)
        return jnp.cos(freqs), jnp.sin(freqs)


def _yarn_find_correction_dim(num_rotations: float, dim: int, base: float,
                              max_position_embeddings: int) -> float:
    return (dim * math.log(max_position_embeddings /
                           (num_rotations * 2 * math.pi))) / (2 *
                                                              math.log(base))


def _yarn_find_correction_range(low_rot: float, high_rot: float, dim: int,
                                base: float,
                                max_position_embeddings: int) -> Tuple[int, int]:
    low = math.floor(
        _yarn_find_correction_dim(low_rot, dim, base,
                                  max_position_embeddings))
    high = math.ceil(
        _yarn_find_correction_dim(high_rot, dim, base,
                                  max_position_embeddings))
    return max(low, 0), min(high, dim - 1)


def _yarn_linear_ramp_mask(low: float, high: float, dim: int) -> jax.Array:
    if low == high:
        high += 0.001  # Avoid zero division.
    ramp = (jnp.arange(dim, dtype=jnp.float32) - low) / (high - low)
    return jnp.clip(ramp, 0.0, 1.0)


def _yarn_get_mscale(scale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * math.log(scale) + 1.0


class YaRNScalingRotaryEmbedding(RotaryEmbedding):
    """YaRN (Peng et al.): per-dim interpolation/extrapolation blend plus
    attention-temperature mscale."""

    def __init__(self, head_size, rotary_dim, max_position_embeddings, base,
                 is_neox_style, scaling_factor: float, *,
                 extrapolation_factor: float = 1.0,
                 attn_factor: float = 1.0,
                 beta_fast: float = 32.0,
                 beta_slow: float = 1.0) -> None:
        self.scaling_factor = scaling_factor
        self.extrapolation_factor = extrapolation_factor
        self.attn_factor = attn_factor
        self.beta_fast = beta_fast
        self.beta_slow = beta_slow
        self.mscale = float(
            _yarn_get_mscale(scaling_factor) * attn_factor)
        super().__init__(head_size, rotary_dim, max_position_embeddings, base,
                         is_neox_style)

    def _compute_inv_freq(self, scaling_factor: float) -> jax.Array:  # type: ignore[override]
        pos_freqs = self.base**(jnp.arange(0, self.rotary_dim, 2,
                                           dtype=jnp.float32) /
                                self.rotary_dim)
        inv_freq_extrapolation = 1.0 / pos_freqs
        inv_freq_interpolation = 1.0 / (scaling_factor * pos_freqs)
        low, high = _yarn_find_correction_range(self.beta_fast,
                                                self.beta_slow,
                                                self.rotary_dim, self.base,
                                                self.max_position_embeddings)
        inv_freq_mask = (1 - _yarn_linear_ramp_mask(
            low, high, self.rotary_dim // 2)) * self.extrapolation_factor
        return (inv_freq_interpolation * (1 - inv_freq_mask) +
                inv_freq_extrapolation * inv_freq_mask)

    def _compute_cos_sin_cache(self):
        inv_freq = self._compute_inv_freq(self.scaling_factor)
        t = jnp.arange(
            int(self.max_position_embeddings * self.scaling_factor),
            dtype=jnp.float32)
        freqs = jnp.einsum("i,j->ij", t, inv_freq)
        return jnp.cos(freqs) * self.mscale, jnp.sin(freqs) * self.mscale


def get_rope(
    head_size: int,
    rotary_dim: int,
    max_position: int,
    base: float,
    is_neox_style: bool = True,
    rope_scaling: Optional[Dict[str, Any]] = None,
) -> RotaryEmbedding:
    if rope_scaling is None:
        return RotaryEmbedding(head_size, rotary_dim, max_position, base,
                               is_neox_style)
    scaling_type = rope_scaling.get("type",
                                    rope_scaling.get("rope_type", "linear"))
    scaling_factor = rope_scaling.get("factor", 1.0)
    if scaling_type == "linear":
        return LinearScalingRotaryEmbedding(head_size, rotary_dim,
                                            max_position, base,
                                            is_neox_style, scaling_factor)
    if scaling_type == "dynamic":
        return DynamicNTKScalingRotaryEmbedding(head_size, rotary_dim,
                                                max_position, base,
                                                is_neox_style, scaling_factor)
    if scaling_type == "yarn":
        original_max_position = rope_scaling.get(
            "original_max_position_embeddings", max_position)
        extra_kwargs = {
            k: v
            for k, v in rope_scaling.items() if k in ("extrapolation_factor",
                                                      "attn_factor",
                                                      "beta_fast", "beta_slow")
        }
        return YaRNScalingRotaryEmbedding(head_size, rotary_dim,
                                          original_max_position, base,
                                          is_neox_style, scaling_factor,
                                          **extra_kwargs)
    raise ValueError(f"Unknown RoPE scaling type {scaling_type}")
