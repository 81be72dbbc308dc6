"""RMSNorm (+ fused residual-add variant).

Role-parity with the reference's rms_norm / fused_add_rms_norm CUDA
kernels (csrc/layernorm_kernels.cu).  On TPU these are pure-jnp: XLA fuses
the normalize+scale (+add) chain into neighboring ops, so a hand kernel
buys nothing.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32)).astype(orig_dtype)


def fused_add_rms_norm(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    eps: float = 1e-6,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (normed(x + residual), x + residual)."""
    added = x + residual
    return rms_norm(added, weight, eps), added


def layer_norm(x: jax.Array,
               weight: jax.Array,
               bias: Optional[jax.Array],
               eps: float = 1e-5) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
