"""Paged KV-cache manipulation ops (page-major layout).

TPU-native equivalents of the reference's cache CUDA kernels
(csrc/cache_kernels.cu: swap_blocks:21, copy_blocks:66,
reshape_and_cache:155): token KV scatter into pages, page-to-page copies
(copy-on-write), and device<->host page swaps.

Layout: ``pages[num_pages, page_size, num_kv_heads, head_dim]`` — one
page is one CONTIGUOUS block, so the attention kernel issues one DMA per
page, token rows are whole [kvh, hd] slabs, and every op here works on
leading (untiled) dimensions where XLA's gather/scatter/DUS are
efficient and in-place.  Stacked (lax.scan) models prepend a layer axis.
A "slot" is a flat token position: slot = page_idx * page_size + offset.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def write_to_kv_cache(
    k: jax.Array,            # [num_tokens, num_kv_heads, head_dim]
    v: jax.Array,
    k_pages: jax.Array,      # [num_pages, page_size, kvh, head_dim]
    v_pages: jax.Array,
    slot_mapping: jax.Array,  # [num_tokens] int32, -1 = padding (dropped)
) -> Tuple[jax.Array, jax.Array]:
    """Scatter freshly computed K/V vectors into their cache slots.

    Functional: returns the updated page arrays (donate them under jit so
    XLA updates in place).  Token rows are contiguous leading-dim rows of
    the flattened [slots, kvh, hd] view — a plain row scatter.
    """
    num_pages, page_size, num_kv_heads, head_dim = k_pages.shape
    total_slots = num_pages * page_size

    k = k.astype(k_pages.dtype)
    v = v.astype(v_pages.dtype)

    k_flat = k_pages.reshape(total_slots, num_kv_heads, head_dim)
    v_flat = v_pages.reshape(total_slots, num_kv_heads, head_dim)
    slots = jnp.where(slot_mapping < 0, total_slots, slot_mapping)
    k_flat = k_flat.at[slots].set(k, mode="drop")
    v_flat = v_flat.at[slots].set(v, mode="drop")
    return (k_flat.reshape(k_pages.shape), v_flat.reshape(v_pages.shape))


def write_to_kv_cache_stacked(
    k: jax.Array,             # [num_tokens, num_kv_heads, head_dim]
    v: jax.Array,
    k_all: jax.Array,         # [L, num_pages, ps, num_kv_heads, head_dim]
    v_all: jax.Array,
    slot_mapping: jax.Array,  # [num_tokens] int32, -1 = padding
    layer: jax.Array,         # scalar int32
) -> Tuple[jax.Array, jax.Array]:
    """Scatter K/V into layer `layer` of a STACKED cache without slicing
    out the layer.

    Decode-size writes are one dynamic-update-slice per token — the
    dynamic offsets (layer, page, off) all index UNTILED dimensions, so
    XLA updates the loop-carried cache buffer in place.  Prefill-size
    writes use a flat row scatter.
    """
    num_layers, num_pages, page_size, num_kv_heads, head_dim = k_all.shape
    num_tokens = k.shape[0]
    k = k.astype(k_all.dtype)
    v = v.astype(v_all.dtype)
    layer = jnp.asarray(layer, jnp.int32)
    total_slots = num_pages * page_size

    if num_tokens > 64:
        k_flat = k_all.reshape(num_layers, total_slots, num_kv_heads,
                               head_dim)
        v_flat = v_all.reshape(num_layers, total_slots, num_kv_heads,
                               head_dim)
        slots = jnp.where(slot_mapping < 0, total_slots, slot_mapping)
        layer_b = jnp.broadcast_to(layer, slots.shape)
        k_flat = k_flat.at[layer_b, slots].set(k, mode="drop")
        v_flat = v_flat.at[layer_b, slots].set(v, mode="drop")
        return (k_flat.reshape(k_all.shape), v_flat.reshape(v_all.shape))

    def body(i, carry):
        ka, va = carry
        slot = slot_mapping[i]
        valid = slot >= 0
        slot = jnp.clip(slot, 0, total_slots - 1)
        page = slot // page_size
        off = slot % page_size
        upd_k = k[i][None, None, None]   # [1, 1, 1, kvh, hd]
        upd_v = v[i][None, None, None]
        old_k = jax.lax.dynamic_slice(
            ka, (layer, page, off, 0, 0),
            (1, 1, 1, num_kv_heads, head_dim))
        old_v = jax.lax.dynamic_slice(
            va, (layer, page, off, 0, 0),
            (1, 1, 1, num_kv_heads, head_dim))
        upd_k = jnp.where(valid, upd_k, old_k)
        upd_v = jnp.where(valid, upd_v, old_v)
        ka = jax.lax.dynamic_update_slice(ka, upd_k,
                                          (layer, page, off, 0, 0))
        va = jax.lax.dynamic_update_slice(va, upd_v,
                                          (layer, page, off, 0, 0))
        return ka, va

    return jax.lax.fori_loop(0, num_tokens, body, (k_all, v_all))


def copy_blocks(
    k_pages: jax.Array,
    v_pages: jax.Array,
    src_indices: jax.Array,  # [num_copies] int32
    dst_indices: jax.Array,  # [num_copies] int32, -1 = padding (dropped)
) -> Tuple[jax.Array, jax.Array]:
    """Page-granularity copy (copy-on-write fork divergence)."""
    num_pages = k_pages.shape[0]
    src = jnp.where(src_indices < 0, 0, src_indices)
    dst = jnp.where(dst_indices < 0, num_pages, dst_indices)
    k_src = jnp.take(k_pages, src, axis=0, mode="clip")
    v_src = jnp.take(v_pages, src, axis=0, mode="clip")
    k_pages = k_pages.at[dst].set(k_src, mode="drop")
    v_pages = v_pages.at[dst].set(v_src, mode="drop")
    return k_pages, v_pages


def gather_pages(pages: jax.Array, indices: jax.Array) -> jax.Array:
    """Pull a set of pages out of the cache (KV migration send side)."""
    return jnp.take(pages, indices, axis=0, mode="clip")


def scatter_pages(pages: jax.Array, indices: jax.Array,
                  values: jax.Array) -> jax.Array:
    """Write a set of pages into the cache (KV migration receive side)."""
    return pages.at[indices].set(values.astype(pages.dtype), mode="drop")


def swap_out_blocks(
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_host: np.ndarray,
    v_host: np.ndarray,
    mapping: Dict[int, int],
) -> None:
    """Device -> host page copies (preemption swap).  Eager, not jitted:
    host arrays are mutated in place."""
    if not mapping:
        return
    src = jnp.asarray(sorted(mapping.keys()), dtype=jnp.int32)
    k_gather = np.asarray(gather_pages(k_pages, src))
    v_gather = np.asarray(gather_pages(v_pages, src))
    for i, s in enumerate(sorted(mapping.keys())):
        d = mapping[s]
        k_host[d] = k_gather[i]
        v_host[d] = v_gather[i]


def swap_in_blocks(
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_host: np.ndarray,
    v_host: np.ndarray,
    mapping: Dict[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Host -> device page copies (resume after swap preemption)."""
    if not mapping:
        return k_pages, v_pages
    src = sorted(mapping.keys())
    dst = jnp.asarray([mapping[s] for s in src], dtype=jnp.int32)
    k_vals = jnp.asarray(k_host[src])
    v_vals = jnp.asarray(v_host[src])
    return (scatter_pages(k_pages, dst, k_vals),
            scatter_pages(v_pages, dst, v_vals))
