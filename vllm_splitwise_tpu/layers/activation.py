"""Activation functions (reference role: csrc/activation_kernels.cu +
vllm/model_executor/layers/activation.py).  Pure jnp — XLA fuses these
into the surrounding matmuls on TPU."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def silu_and_mul(x: jax.Array) -> jax.Array:
    """x: [..., 2d] -> silu(x[..., :d]) * x[..., d:]  (SwiGLU gate)."""
    d = x.shape[-1] // 2
    return jax.nn.silu(x[..., :d]) * x[..., d:]


def gelu_and_mul(x: jax.Array, approximate: str = "none") -> jax.Array:
    d = x.shape[-1] // 2
    return jax.nn.gelu(x[..., :d],
                       approximate=(approximate == "tanh")) * x[..., d:]


def gelu_new(x: jax.Array) -> jax.Array:
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * jnp.power(x, 3.0))))


def gelu_fast(x: jax.Array) -> jax.Array:
    return 0.5 * x * (1.0 + jnp.tanh(x * 0.7978845608 * (1.0 + 0.044715 * x * x)))


_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
}


def get_act_fn(name: str):
    name = name.lower()
    if name not in _ACTIVATIONS:
        raise ValueError(f"Activation function {name!r} is not supported.")
    return _ACTIVATIONS[name]
