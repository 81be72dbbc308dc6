"""Prefill (prompt-phase) attention.

Role-parity with the reference's prefill paths (flash_attn_func /
context_attention_fwd, vllm/model_executor/layers/attention/backends/
flash_attn.py:88-125).  The batched-prompt path is a dense causal
attention over padded [B, T] prompts — expressed in XLA ops, which fuse
the mask+softmax chain on TPU; a Pallas flash kernel can replace the core
later without changing callers.  Supports GQA, ALiBi-free RoPE models,
sliding windows, and attention against a cached prefix (prefix caching /
chunked prefill) via an extra paged-KV context block.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def prefill_attention(
    q: jax.Array,          # [B, T, num_q_heads, head_dim]
    k: jax.Array,          # [B, T, num_kv_heads, head_dim]
    v: jax.Array,
    seq_lens: jax.Array,   # [B] int32 — valid (unpadded) lengths
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    start_positions: Optional[jax.Array] = None,  # [B] absolute pos of q[0]
    alibi_slopes: Optional[jax.Array] = None,     # [num_q_heads] f32
    # Prefix caching: (k_prefix [B, Tp, kvh, hd], v_prefix, prefix_lens
    # [B]) — queries also attend over these cached-context positions.
    prefix_kv=None,
) -> jax.Array:
    """Causal self-attention over padded prompt batches.

    Padding tokens (position >= seq_len) attend only to themselves
    numerically (their output is garbage and later discarded).  When
    ``start_positions`` is given, q AND k are the SAME suffix chunk
    sitting at absolute positions start..start+T (both get the offset);
    the cached tokens before `start` are attended via ``prefix_kv``, NOT
    by widening k.
    """
    batch, q_len, num_q_heads, head_dim = q.shape
    _, kv_len, num_kv_heads, _ = k.shape
    if scale is None:
        scale = 1.0 / (head_dim**0.5)
    group = num_q_heads // num_kv_heads

    qf = q.astype(jnp.float32).reshape(batch, q_len, num_kv_heads, group,
                                       head_dim)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    # [B, kvh, g, Tq, Tk]
    s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale

    q_pos = jnp.arange(q_len)[None, :]  # [1, Tq]
    k_pos = jnp.arange(kv_len)[None, :]
    if start_positions is not None:
        # k here is the SAME suffix chunk as q: both sit at absolute
        # positions start..start+T.  Offsetting only q made the causal
        # mask too permissive (suffix queries attended future suffix
        # tokens whenever a cached prefix was in play).
        q_pos = q_pos + start_positions[:, None]
        k_pos = k_pos + start_positions[:, None]

    causal = q_pos[:, :, None] >= k_pos[:, None, :]      # [B, Tq, Tk]
    # seq_lens counts SUFFIX tokens: validity uses the local k index.
    k_local = jnp.arange(kv_len)[None, None, :]
    valid = k_local < seq_lens[:, None, None]            # [B, 1->Tq, Tk]
    mask = jnp.logical_and(causal, valid)
    if alibi_slopes is not None:
        # ALiBi: bias = slope_h * (k_pos - q_pos) (<= 0 under causality).
        slopes = alibi_slopes.astype(jnp.float32).reshape(
            num_kv_heads, group)
        dist = (k_pos[:, None, :] - q_pos[:, :, None]).astype(jnp.float32)
        s = s + slopes[None, :, :, None, None] * dist[:, None, None, :, :]
    if sliding_window is not None:
        in_window = q_pos[:, :, None] - k_pos[:, None, :] < sliding_window
        mask = jnp.logical_and(mask, in_window)

    s = jnp.where(mask[:, None, None, :, :], s, DEFAULT_MASK_VALUE)

    if prefix_kv is not None:
        k_pre, v_pre, prefix_lens = prefix_kv
        kf_pre = k_pre.astype(jnp.float32)
        vf_pre = v_pre.astype(jnp.float32)
        pre_len = kf_pre.shape[1]
        s_pre = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf_pre) * scale
        pre_pos = jnp.arange(pre_len)[None, :]
        pre_valid = pre_pos < prefix_lens[:, None]        # [B, Tp]
        # Cached positions always precede the suffix queries (causal by
        # construction); sliding windows additionally bound the reach.
        pre_mask = jnp.broadcast_to(pre_valid[:, None, :],
                                    (batch, q_len, pre_len))
        if sliding_window is not None:
            in_window = (q_pos[:, :, None] - pre_pos[:, None, :]
                         < sliding_window)
            pre_mask = jnp.logical_and(pre_mask, in_window)
        if alibi_slopes is not None:
            slopes = alibi_slopes.astype(jnp.float32).reshape(
                num_kv_heads, group)
            dist_pre = (pre_pos[:, None, :] -
                        q_pos[:, :, None]).astype(jnp.float32)
            s_pre = s_pre + slopes[None, :, :, None, None] * \
                dist_pre[:, None, None, :, :]
        s_pre = jnp.where(pre_mask[:, None, None, :, :], s_pre,
                          DEFAULT_MASK_VALUE)
        s = jnp.concatenate([s_pre, s], axis=-1)
        vf = jnp.concatenate([vf_pre, vf], axis=1)

    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p, vf)
    return out.reshape(batch, q_len, num_q_heads, head_dim).astype(q.dtype)
