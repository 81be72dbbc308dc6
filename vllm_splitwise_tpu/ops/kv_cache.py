"""Paged KV-cache manipulation ops (page-major layout).

TPU-native equivalents of the reference's cache CUDA kernels
(csrc/cache_kernels.cu: swap_blocks:21, copy_blocks:66,
reshape_and_cache:155): token KV scatter into pages, page-to-page copies
(copy-on-write), and device<->host page swaps.

Layout: ``pages[num_pages, num_kv_heads, page_size, head_dim]`` — one
page is one CONTIGUOUS block with a HEAD-MAJOR interior, so the
attention kernel issues one DMA per page AND needs no per-chunk
relayout (see ops/paged_attention.py).  The cost lands here instead: a
token's K/V is a strided [kvh, 1, hd] slab, so writes scatter per-head
rows rather than contiguous token rows.  Stacked (lax.scan) models
prepend a layer axis.  A "slot" is a flat token position:
slot = page_idx * page_size + offset.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_for_cache(x: jax.Array, cache_dtype,
                       kv_scale: float = 1.0) -> jax.Array:
    """Narrow K/V to the cache dtype.

    Quantized caches (int8 / fp8) store ``x / kv_scale``; the attention
    kernels multiply back by ``kv_scale`` on read (the reference's
    fp8-e5m2 cache path, csrc/quantization/fp8_e5m2_kvcache).  int8 gets
    round+clip; fp8 saturates on its own."""
    cache_dtype = jnp.dtype(cache_dtype)
    if cache_dtype == jnp.int8:
        xf = x.astype(jnp.float32) / kv_scale
        return jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    if cache_dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        xf = x.astype(jnp.float32)
        if kv_scale != 1.0:
            xf = xf / kv_scale
        return xf.astype(cache_dtype)
    return x.astype(cache_dtype)


def write_to_kv_cache(
    k: jax.Array,            # [num_tokens, num_kv_heads, head_dim]
    v: jax.Array,
    k_pages: jax.Array,      # [num_pages, kvh, page_size, head_dim]
    v_pages: jax.Array,
    slot_mapping: jax.Array,  # [num_tokens] int32, -1 = padding (dropped)
    kv_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Scatter freshly computed K/V vectors into their cache slots.

    Functional: returns the updated page arrays (donate them under jit so
    XLA updates in place).  Head-major pages make a token a strided
    [kvh, 1, hd] slab: scattered via (page, offset) advanced indexing.
    """
    num_pages, num_kv_heads, page_size, head_dim = k_pages.shape

    k = quantize_for_cache(k, k_pages.dtype, kv_scale)
    v = quantize_for_cache(v, v_pages.dtype, kv_scale)

    slots = slot_mapping
    pages = jnp.where(slots < 0, num_pages, slots // page_size)
    offs = jnp.where(slots < 0, 0, slots % page_size)
    k_pages = k_pages.at[pages, :, offs].set(k, mode="drop")
    v_pages = v_pages.at[pages, :, offs].set(v, mode="drop")
    return k_pages, v_pages


def write_to_kv_cache_stacked(
    k: jax.Array,             # [num_tokens, num_kv_heads, head_dim]
    v: jax.Array,
    k_all: jax.Array,         # [L, num_pages, num_kv_heads, ps, head_dim]
    v_all: jax.Array,
    slot_mapping: jax.Array,  # [num_tokens] int32, -1 = padding
    layer: jax.Array,         # scalar int32
    kv_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Scatter K/V into layer `layer` of a STACKED cache without slicing
    out the layer.

    Decode-size writes are one dynamic-update-slice per token at
    (layer, page, 0, off, 0); prefill-size writes use a (layer, page,
    offset) advanced-index scatter over [kvh, hd] slabs.
    """
    num_layers, num_pages, num_kv_heads, page_size, head_dim = k_all.shape
    num_tokens = k.shape[0]
    k = quantize_for_cache(k, k_all.dtype, kv_scale)
    v = quantize_for_cache(v, v_all.dtype, kv_scale)
    layer = jnp.asarray(layer, jnp.int32)

    # Head-major pages make a token a STRIDED [kvh, 1, hd] slab; both a
    # per-token tiled-dim dynamic_update_slice and a strided-window
    # scatter lower to slab copies on TPU (13x slower end-to-end).  So
    # every write is a PAGE-granularity read-modify-write instead:
    # gather the touched pages (contiguous windows on untiled leading
    # dims), merge the token rows in registers, scatter whole pages
    # back.  Each touched page must carry at most ONE token per call —
    # decode does by construction (one token per sequence, sequences own
    # disjoint pages); prefill rows are split into per-offset waves by
    # the caller (write_prefill_rows).
    slots = slot_mapping
    pages = jnp.where(slots < 0, num_pages, slots // page_size)
    offs = jnp.where(slots < 0, 0, slots % page_size)
    layer_b = jnp.broadcast_to(layer, slots.shape)

    def rmw(all_pages, rows):
        old = all_pages.at[layer_b, pages].get(mode="fill", fill_value=0)
        #                                  [T, kvh, ps, hd]
        off_iota = jax.lax.broadcasted_iota(jnp.int32, old.shape, 2)
        tile = jnp.where(off_iota == offs[:, None, None, None],
                         rows[:, :, None, :], old)
        return all_pages.at[layer_b, pages].set(tile, mode="drop")

    return rmw(k_all, k), rmw(v_all, v)


def write_prefill_rows(
    k: jax.Array,             # [B*T_pad, num_kv_heads, head_dim]
    v: jax.Array,
    k_all: jax.Array,         # [L, num_pages, kvh, ps, head_dim]
    v_all: jax.Array,
    slot_rows: jax.Array,     # [B, T_pad] int32; each row CONSECUTIVE
    layer: jax.Array,         # scalar int32       slots (-1 = padding)
    kv_scale: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    """Prefill-size write: build whole page tiles from each sequence's
    consecutive slot run and write them with page-granularity
    read-modify-write (one gather/scatter of contiguous [kvh, ps, hd]
    windows; no strided scatters — see write_to_kv_cache_stacked).

    Relies on the prompt-write invariant that every row of ``slot_rows``
    is ``start + arange(T_pad)`` (masked with -1): consecutive slots walk
    pages monotonically, so tile (b, j) covers exactly one page.
    """
    num_layers, num_pages, num_kv_heads, page_size, head_dim = k_all.shape
    bsz, t_pad = slot_rows.shape
    k = quantize_for_cache(k, k_all.dtype, kv_scale).reshape(
        bsz, t_pad, num_kv_heads, head_dim)
    v = quantize_for_cache(v, v_all.dtype, kv_scale).reshape(
        bsz, t_pad, num_kv_heads, head_dim)
    layer = jnp.asarray(layer, jnp.int32)

    npr = t_pad // page_size + 1        # page tiles per row
    first = slot_rows[:, 0]             # start slot (may be -1: empty)
    shift = jnp.where(first < 0, 0, first % page_size)    # [B]

    # token_idx[b, j, off] = index (within the row) of the token that
    # lands at offset `off` of the row's j-th touched page.
    j_iota = jnp.arange(npr, dtype=jnp.int32)[None, :, None]
    off_iota = jnp.arange(page_size, dtype=jnp.int32)[None, None, :]
    token_idx = j_iota * page_size + off_iota - shift[:, None, None]
    in_range = (token_idx >= 0) & (token_idx < t_pad)
    tclip = jnp.clip(token_idx, 0, t_pad - 1)
    slot_at = jnp.take_along_axis(
        slot_rows[:, None, :].repeat(npr, axis=1), tclip, axis=2)
    valid = in_range & (slot_at >= 0)                     # [B, npr, ps]

    page_ids = jnp.where(valid, slot_at // page_size, -1)
    # One page id per tile (or -1 if the tile is empty).
    tile_page = jnp.max(page_ids, axis=2)                 # [B, npr]
    flat_pages = jnp.where(tile_page < 0, num_pages,
                           tile_page).reshape(-1)
    layer_b = jnp.broadcast_to(layer, flat_pages.shape)

    def rmw(all_pages, rows):
        # rows: [B, T_pad, kvh, hd]
        vals = jnp.take_along_axis(
            rows[:, None], tclip[..., None, None], axis=2)
        # vals: [B, npr, ps, kvh, hd] -> head-major tile
        vals = vals.transpose(0, 1, 3, 2, 4)
        old = all_pages.at[layer_b, flat_pages].get(mode="fill",
                                                    fill_value=0)
        old = old.reshape(bsz, npr, num_kv_heads, page_size, head_dim)
        tile = jnp.where(valid[:, :, None, :, None], vals, old)
        return all_pages.at[layer_b, flat_pages].set(
            tile.reshape(bsz * npr, num_kv_heads, page_size, head_dim),
            mode="drop")

    return rmw(k_all, k), rmw(v_all, v)


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
