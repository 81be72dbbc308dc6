"""Batched multi-LoRA application (reference role: vllm/lora/layers.py +
the punica BGMV kernels).

``lora_apply`` computes the per-token adapter contribution with two
einsums over the full slot stack plus a one-hot select — at rank r and S
slots the extra FLOPs are S*r/H of the base matmul, a few percent, with
no gather/scatter (which XLA/TPU handles poorly).

``lora_embedding`` / ``lora_logits`` carry the reference's
embedding/LM-head adapters with extra-vocab support
(vllm/lora/layers.py:150 VocabParallelEmbeddingWithLoRA, :786
SamplerWithLoRA; models/llama.py:292-304): adapter-added token ids live
in ``[base_vocab, base_vocab + extra)``; their input embeddings come
from per-adapter ``extra_in`` rows, their logits from per-adapter
``extra_out`` rows, and both sides also take a low-rank delta.  These
GLOBAL (non-per-layer) stacks ride the same lora pytree as the layer
stacks under the keys in :data:`GLOBAL_STACK_KEYS`; the model's layer
scan must exclude them.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# lora-pytree keys that are NOT [slots, layers, ...] per-layer stacks.
GLOBAL_STACK_KEYS = frozenset({
    "embed_A", "embed_B", "extra_in",
    "lm_head_A", "lm_head_B", "extra_out", "extra_count",
})


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


def lora_embedding(
    ids: jax.Array,         # [B, T] int32 (may contain extra-vocab ids)
    base_embed: jax.Array,  # [Vp, H] the base embedding table
    embed_a: jax.Array,     # [S, V_tot, r] per-TOKEN low-rank factors
    embed_b: jax.Array,     # [S, r, H]
    extra_in: jax.Array,    # [S, E, H] adapter-added input embeddings
    slot_idx: jax.Array,    # [B]
    base_vocab: int,
) -> jax.Array:
    """Input embeddings with LoRA + adapter-added vocab rows: id t embeds
    to (t < V ? W[t] : extra_in[slot, t-V]) + embed_b[slot].T @
    embed_a[slot, t] (vllm/lora/layers.py:150 semantics)."""
    s, v_tot, r = embed_a.shape
    extra = extra_in.shape[1]
    dt = base_embed.dtype
    in_base = ids < base_vocab
    base = jnp.take(base_embed, jnp.where(in_base, ids, 0), axis=0)
    eid = jnp.clip(ids - base_vocab, 0, max(extra - 1, 0))
    ext = jnp.take(extra_in.reshape(s * extra, -1),
                   slot_idx[:, None] * extra + eid, axis=0).astype(dt)
    emb = jnp.where(in_base[..., None], base, ext)
    # Low-rank delta; A is indexed per TOKEN id over the full id range.
    mid = jnp.take(embed_a.reshape(s * v_tot, r),
                   slot_idx[:, None] * v_tot +
                   jnp.clip(ids, 0, v_tot - 1), axis=0)  # [B, T, r]
    b_sel = jnp.take(embed_b, slot_idx, axis=0)  # [B, r, H]
    return emb + jnp.einsum("btr,brh->bth", mid.astype(dt),
                            b_sel.astype(dt))


def lora_logits(
    hidden: jax.Array,      # [rows, H]
    base_logits: jax.Array,  # [rows, >= base_vocab] f32 (head output)
    lm_a: jax.Array,        # [S, H, r]
    lm_b: jax.Array,        # [S, r, V_tot]
    extra_out: jax.Array,   # [S, E, H] adapter-added OUTPUT embeddings
    extra_count: jax.Array,  # [S] valid extra rows per adapter
    slot_idx: jax.Array,    # [rows]
    base_vocab: int,
) -> jax.Array:
    """[rows, base_vocab + E] logits: base head (+ low-rank delta) for
    base ids, per-adapter output-embedding rows for added ids; added ids
    outside a row's adapter (or beyond its declared count) score -inf
    (vllm/lora/layers.py:786 SamplerWithLoRA semantics)."""
    s, extra, _ = extra_out.shape
    hf = hidden.astype(jnp.float32)
    ex = jnp.einsum("bh,seh->bse", hf, extra_out.astype(jnp.float32))
    onehot = jax.nn.one_hot(slot_idx, s, dtype=jnp.float32)
    ex = jnp.einsum("bse,bs->be", ex, onehot)
    counts = jnp.take(extra_count, slot_idx, axis=0)  # [rows]
    valid = jnp.arange(extra)[None, :] < counts[:, None]
    neg = jnp.finfo(jnp.float32).min
    ex = jnp.where(valid, ex, neg)
    logits = jnp.concatenate(
        [base_logits[..., :base_vocab].astype(jnp.float32), ex], axis=-1)
    delta = lora_apply(hf[:, None, :], lm_a, lm_b, slot_idx)[:, 0]
    v_tot = delta.shape[-1]
    width = base_vocab + extra
    if v_tot < width:
        delta = jnp.pad(delta, ((0, 0), (0, width - v_tot)))
    return logits + delta[..., :width].astype(jnp.float32)
