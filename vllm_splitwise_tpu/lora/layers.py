"""Batched multi-LoRA application (reference role: vllm/lora/layers.py +
the punica BGMV kernels).

``lora_apply`` computes the per-token adapter contribution with two
einsums over the full slot stack plus a one-hot select — at rank r and S
slots the extra FLOPs are S*r/H of the base matmul, a few percent, with
no gather/scatter (which XLA/TPU handles poorly).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def lora_apply(
    x: jax.Array,        # [B, T, H] or [T, H]
    a_stack: jax.Array,  # [S, H, r]
    b_stack: jax.Array,  # [S, r, out]
    slot_idx: jax.Array,  # [B] int32 — adapter slot per sequence row
) -> jax.Array:
    """Returns the LoRA delta to add to the base projection output."""
    squeeze = x.ndim == 2
    if squeeze:
        x = x[None]
    b, t, h = x.shape
    s = a_stack.shape[0]
    # [B, T, S, r]
    mid = jnp.einsum("bth,shr->btsr", x, a_stack.astype(x.dtype))
    # [B, T, S, out]
    out = jnp.einsum("btsr,sro->btso", mid, b_stack.astype(x.dtype))
    onehot = jax.nn.one_hot(slot_idx, s, dtype=x.dtype)  # [B, S]
    delta = jnp.einsum("btso,bs->bto", out, onehot)
    return delta[0] if squeeze else delta
