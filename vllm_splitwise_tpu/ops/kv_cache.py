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

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantPages(NamedTuple):
    """Sub-byte-quantized KV pages: nibble-packed data + per-token scales.

    ``data``  — ``[(L,) P, KVH, PS//2, HD]`` int8; byte ``(h, r, d)``
    packs TOKEN PAIR ``2r`` (low nibble) and ``2r+1`` (high nibble) at
    head-dim ``d``, both signed int4 in [-7, 7].  Pairing tokens (not
    head dims) keeps the lane dimension at the full ``HD`` so page DMAs
    stay 128-lane aligned (Mosaic rejects sub-128 lane HBM slices); the
    attention kernel runs two half-token-count MXU dots whose outputs
    concatenate along the (small) score lanes.
    ``scale`` — ``[(L,) P, KVH, PS]`` bfloat16 per-token-per-head scale
    (KIVI-style finest practical granularity; dequant = int4 * scale).
    The kernel never DMAs this layout: scales are gathered+permuted into
    dense per-batch arrays in XLA (see ops/paged_attention.py).

    Registered as a pytree (NamedTuple), so jit/scan/donation treat the
    two leaves like any other cache array.  ``ndim``/``shape`` mirror the
    data leaf so callers' stacked-vs-flat checks keep working.
    """
    data: jax.Array
    scale: jax.Array

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def shape(self):
        return self.data.shape


INT4_MAX = 7.0


def quantize_int4_values(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """[..., HD] float -> (unpacked int4-in-int8 values in [-7, 7],
    [...] bf16 per-row scale)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    # Round the scale to its stored (bf16) value BEFORE quantizing so the
    # write and the dequant use the exact same step size.
    scale = jnp.maximum(amax / INT4_MAX, 1e-8).astype(jnp.bfloat16)
    q = jnp.clip(jnp.round(xf / scale.astype(jnp.float32)[..., None]),
                 -INT4_MAX, INT4_MAX).astype(jnp.int8)
    return q, scale


def pack_int4_pairs(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Pack two int4-in-int8 value tensors into one byte tensor.

    BIASED-LOW convention: ``byte = (hi << 4) | (lo + 8)`` so that the
    signed byte value is EXACTLY ``16*hi + (lo + 8)`` (no wrap: range
    [-128, 127]).  The attention kernel exploits this identity to read
    both nibbles with plain int8 MXU dots — one on the raw bytes, one on
    ``byte & 0xF`` — because Mosaic only legalizes and/or (no shifts) on
    int8 vectors."""
    return jnp.bitwise_or(
        jnp.bitwise_and(lo + jnp.int8(8), jnp.int8(0xF)),
        jnp.left_shift(hi, jnp.int8(4)))


def quantize_int4_pages(x: jax.Array) -> QuantPages:
    """Quantize dense pages ``[..., PS, HD]`` into token-pair-packed
    QuantPages (tests / cache builders)."""
    q4, sc = quantize_int4_values(x)
    packed = pack_int4_pairs(q4[..., 0::2, :], q4[..., 1::2, :])
    return QuantPages(packed, sc)


def unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Nibble-packed int8 -> (low, high) int4 values (biased-low
    convention, see pack_int4_pairs).  XLA-side only — the Pallas kernel
    never unpacks (int8 shifts don't legalize on the TPU VPU)."""
    four = jnp.int8(4)
    lo = jnp.bitwise_and(packed, jnp.int8(0xF)) - jnp.int8(8)
    hi = jax.lax.shift_right_arithmetic(packed, four)
    return lo, hi


def dequantize_int4(pages: QuantPages) -> jax.Array:
    """QuantPages -> [(L,) P, KVH, PS, HD] float32 (tests / oracle /
    prefix-cache gathers)."""
    lo, hi = unpack_int4(pages.data)          # each [..., PS//2, HD]
    q = jnp.stack([lo, hi], axis=-2)          # [..., PS//2, 2, HD]
    shape = q.shape[:-3] + (q.shape[-3] * 2, q.shape[-1])
    q = q.reshape(shape).astype(jnp.float32)  # token order 2r, 2r+1
    return q * pages.scale.astype(jnp.float32)[..., None]


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
    int4 = isinstance(k_all, QuantPages)
    if int4:
        (num_layers, num_pages, num_kv_heads, half_ps,
         _) = k_all.data.shape
        page_size = half_ps * 2
        k, k_sc = quantize_int4_values(k)
        v, v_sc = quantize_int4_values(v)
    else:
        (num_layers, num_pages, num_kv_heads, page_size,
         head_dim) = k_all.shape
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

    if int4:
        return (QuantPages(_rmw_token_int4(k_all.data, k, layer_b, pages,
                                           offs),
                           _rmw_token_scale(k_all.scale, k_sc, layer_b,
                                            pages, offs)),
                QuantPages(_rmw_token_int4(v_all.data, v, layer_b, pages,
                                           offs),
                           _rmw_token_scale(v_all.scale, v_sc, layer_b,
                                            pages, offs)))
    return (_rmw_token(k_all, k, layer_b, pages, offs),
            _rmw_token(v_all, v, layer_b, pages, offs))


def _rmw_token(all_pages, rows, layer_b, pages, offs):
    """Page-granularity RMW of one token row per touched page."""
    old = all_pages.at[layer_b, pages].get(mode="fill", fill_value=0)
    #                                  [T, kvh, ps, hd]
    off_iota = jax.lax.broadcasted_iota(jnp.int32, old.shape, 2)
    tile = jnp.where(off_iota == offs[:, None, None, None],
                     rows[:, :, None, :], old)
    return all_pages.at[layer_b, pages].set(tile, mode="drop")


def _rmw_token_scale(all_scales, rows, layer_b, pages, offs):
    # rows: [T, kvh]; scale pages: [L, P, kvh, ps]; old: [T, kvh, ps]
    old = all_scales.at[layer_b, pages].get(mode="fill", fill_value=0)
    off_iota = jax.lax.broadcasted_iota(jnp.int32, old.shape, 2)
    tile = jnp.where(off_iota == offs[:, None, None],
                     rows[:, :, None].astype(old.dtype), old)
    return all_scales.at[layer_b, pages].set(tile, mode="drop")


def _rmw_token_int4(all_pages, rows, layer_b, pages, offs):
    # rows: [T, kvh, hd] int4-in-int8; data pages [L, P, kvh, ps/2, hd]
    # token at offset `off` owns nibble (off % 2) of byte row
    # (off // 2): merge into the gathered page, keep neighbors.
    old = all_pages.at[layer_b, pages].get(mode="fill", fill_value=0)
    byte_row = (offs // 2)[:, None, None, None]
    par3 = (offs % 2)[:, None, None]           # vs rows [T, kvh, hd]
    par4 = (offs % 2)[:, None, None, None]     # vs old  [T, kvh, r, hd]
    row_iota = jax.lax.broadcasted_iota(jnp.int32, old.shape, 2)
    nib = jnp.where(
        par3 == 0,
        jnp.bitwise_and(rows + jnp.int8(8), jnp.int8(0xF)),
        jnp.left_shift(rows, jnp.int8(4)))[:, :, None, :]
    keep = jnp.where(par4 == 0, jnp.int8(0xF0 - 256),
                     jnp.int8(0x0F)).astype(jnp.int8)
    merged = jnp.bitwise_or(jnp.bitwise_and(old, keep), nib)
    tile = jnp.where(row_iota == byte_row, merged, old)
    return all_pages.at[layer_b, pages].set(tile, mode="drop")


def write_to_kv_cache_stacked_fused(
    k: jax.Array,             # [num_tokens, num_kv_heads, head_dim]
    v: jax.Array,
    kv_all,                   # [L, 2P, kvh, ps, hd] (or int4 QuantPages)
    slot_mapping: jax.Array,  # [num_tokens] int32 LOGICAL slots, -1 pad
    layer: jax.Array,         # scalar int32
    kv_scale: float = 1.0,
):
    """Decode-size write into an INTERLEAVED fused cache: logical block b
    keeps K at physical page 2b and V at 2b+1 (one attention DMA per
    logical page — see ops/paged_attention.py).  Returns the updated
    fused array (donate under jit)."""
    int4 = isinstance(kv_all, QuantPages)
    if int4:
        num_phys, _, half_ps, _ = kv_all.data.shape[1:]
        page_size = half_ps * 2
        k, k_sc = quantize_int4_values(k)
        v, v_sc = quantize_int4_values(v)
    else:
        _, num_phys, _, page_size, _ = kv_all.shape
        k = quantize_for_cache(k, kv_all.dtype, kv_scale)
        v = quantize_for_cache(v, kv_all.dtype, kv_scale)
    layer = jnp.asarray(layer, jnp.int32)

    slots = slot_mapping
    pages = slots // page_size
    k_pages = jnp.where(slots < 0, num_phys, 2 * pages)
    v_pages = jnp.where(slots < 0, num_phys, 2 * pages + 1)
    offs = jnp.where(slots < 0, 0, slots % page_size)
    layer_b = jnp.broadcast_to(layer, slots.shape)

    # K pages and V pages are disjoint, so the two RMWs chain safely.
    if int4:
        data = _rmw_token_int4(kv_all.data, k, layer_b, k_pages, offs)
        data = _rmw_token_int4(data, v, layer_b, v_pages, offs)
        sc = _rmw_token_scale(kv_all.scale, k_sc, layer_b, k_pages, offs)
        sc = _rmw_token_scale(sc, v_sc, layer_b, v_pages, offs)
        return QuantPages(data, sc)
    kv_all = _rmw_token(kv_all, k, layer_b, k_pages, offs)
    return _rmw_token(kv_all, v, layer_b, v_pages, offs)


def _plan_prefill_tiles(slot_rows: jax.Array, page_size: int):
    """Tile planning shared by the prefill writers.

    Page tiles per row: a row starting at offset `shift` covers
    ceil((shift + t_pad) / ps) pages — up to t_pad // ps + 2 when it
    starts mid-page (speculative-verify windows do; prompt rows start
    at offset 0).  Empty tiles resolve to page -1.

    Returns ``(tclip, valid, tile_page)``: ``tclip[b, j, off]`` is the
    (clipped) index within the row of the token landing at offset ``off``
    of the row's j-th touched page; ``valid`` masks live entries;
    ``tile_page[b, j]`` is the LOGICAL page of tile j (-1 if empty).
    """
    bsz, t_pad = slot_rows.shape
    npr = t_pad // page_size + 2
    first = slot_rows[:, 0]             # start slot (may be -1: empty)
    shift = jnp.where(first < 0, 0, first % page_size)    # [B]

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
    return tclip, valid, tile_page


def _rmw_tile(all_pages, rows, layer_b, flat_pages, tclip, valid):
    # rows: [B, T_pad, kvh, hd]; pages [L, P, kvh, ps, hd]
    bsz, npr, page_size = tclip.shape
    kvh, hd = rows.shape[-2], rows.shape[-1]
    vals = jnp.take_along_axis(
        rows[:, None], tclip[..., None, None], axis=2)
    # vals: [B, npr, ps, kvh, hd] -> head-major tile
    vals = vals.transpose(0, 1, 3, 2, 4)
    old = all_pages.at[layer_b, flat_pages].get(mode="fill",
                                                fill_value=0)
    old = old.reshape(bsz, npr, kvh, page_size, hd)
    tile = jnp.where(valid[:, :, None, :, None], vals, old)
    return all_pages.at[layer_b, flat_pages].set(
        tile.reshape(bsz * npr, kvh, page_size, hd), mode="drop")


def _rmw_tile_scale(all_scales, rows, layer_b, flat_pages, tclip, valid):
    # rows: [B, T_pad, kvh]; scale pages: [L, P, kvh, ps]
    bsz, npr, page_size = tclip.shape
    kvh = rows.shape[-1]
    vals = jnp.take_along_axis(rows[:, None], tclip[..., None], axis=2)
    vals = vals.transpose(0, 1, 3, 2)      # [B, npr, kvh, ps]
    old = all_scales.at[layer_b, flat_pages].get(mode="fill",
                                                 fill_value=0)
    old = old.reshape(bsz, npr, kvh, page_size)
    tile = jnp.where(valid[:, :, None, :], vals.astype(old.dtype), old)
    return all_scales.at[layer_b, flat_pages].set(
        tile.reshape(bsz * npr, kvh, page_size), mode="drop")


def _rmw_tile_int4(all_pages, rows, layer_b, flat_pages, tclip, valid):
    # rows: [B, T_pad, kvh, hd] int4-in-int8 values.  Byte row r of a
    # page packs the tokens at offsets 2r (low nibble) and 2r+1
    # (high): gather both token lanes, merge nibble-wise with the old
    # page so half-filled pairs keep their neighbor.
    bsz, npr, page_size = tclip.shape
    kvh, head_dim = rows.shape[-2], rows.shape[-1]
    half = page_size // 2
    vals = jnp.take_along_axis(
        rows[:, None], tclip[..., None, None], axis=2)
    # [B, npr, ps, kvh, hd] -> [B, npr, kvh, ps, hd]
    vals = vals.transpose(0, 1, 3, 2, 4)
    v_lo = vals[:, :, :, 0::2]             # [B, npr, kvh, ps/2, hd]
    v_hi = vals[:, :, :, 1::2]
    ok_lo = valid[:, :, None, 0::2, None]
    ok_hi = valid[:, :, None, 1::2, None]
    old = all_pages.at[layer_b, flat_pages].get(mode="fill",
                                                fill_value=0)
    old = old.reshape(bsz, npr, kvh, half, head_dim)
    lo_nib = jnp.where(ok_lo,
                       jnp.bitwise_and(v_lo + jnp.int8(8),
                                       jnp.int8(0xF)),
                       jnp.bitwise_and(old, jnp.int8(0x0F)))
    hi_nib = jnp.where(ok_hi, jnp.left_shift(v_hi, jnp.int8(4)),
                       jnp.bitwise_and(old, jnp.int8(0xF0 - 256)))
    tile = jnp.bitwise_or(lo_nib, hi_nib)
    return all_pages.at[layer_b, flat_pages].set(
        tile.reshape(bsz * npr, kvh, half, head_dim), mode="drop")


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
    int4 = isinstance(k_all, QuantPages)
    bsz, t_pad = slot_rows.shape
    if int4:
        (num_layers, num_pages, num_kv_heads, half_ps,
         head_dim) = k_all.data.shape
        page_size = half_ps * 2
        k, k_sc = quantize_int4_values(k)
        v, v_sc = quantize_int4_values(v)
        k = k.reshape(bsz, t_pad, num_kv_heads, head_dim)
        v = v.reshape(bsz, t_pad, num_kv_heads, head_dim)
        k_sc = k_sc.reshape(bsz, t_pad, num_kv_heads)
        v_sc = v_sc.reshape(bsz, t_pad, num_kv_heads)
    else:
        (num_layers, num_pages, num_kv_heads, page_size,
         head_dim) = k_all.shape
        k = quantize_for_cache(k, k_all.dtype, kv_scale).reshape(
            bsz, t_pad, num_kv_heads, head_dim)
        v = quantize_for_cache(v, v_all.dtype, kv_scale).reshape(
            bsz, t_pad, num_kv_heads, head_dim)
    layer = jnp.asarray(layer, jnp.int32)

    tclip, valid, tile_page = _plan_prefill_tiles(slot_rows, page_size)
    flat_pages = jnp.where(tile_page < 0, num_pages,
                           tile_page).reshape(-1)
    layer_b = jnp.broadcast_to(layer, flat_pages.shape)

    if int4:
        return (QuantPages(
            _rmw_tile_int4(k_all.data, k, layer_b, flat_pages, tclip,
                           valid),
            _rmw_tile_scale(k_all.scale, k_sc, layer_b, flat_pages, tclip,
                            valid)),
                QuantPages(
            _rmw_tile_int4(v_all.data, v, layer_b, flat_pages, tclip,
                           valid),
            _rmw_tile_scale(v_all.scale, v_sc, layer_b, flat_pages, tclip,
                            valid)))
    return (_rmw_tile(k_all, k, layer_b, flat_pages, tclip, valid),
            _rmw_tile(v_all, v, layer_b, flat_pages, tclip, valid))


def write_prefill_rows_fused(
    k: jax.Array,             # [B*T_pad, num_kv_heads, head_dim]
    v: jax.Array,
    kv_all,                   # [L, 2P, kvh, ps, hd] (or int4 QuantPages)
    slot_rows: jax.Array,     # [B, T_pad] int32 LOGICAL slots (-1 pad)
    layer: jax.Array,         # scalar int32
    kv_scale: float = 1.0,
):
    """Prefill-size write into the INTERLEAVED fused cache (logical block
    b keeps K at physical page 2b, V at 2b+1 — see paged_attention).
    Same tile plan as write_prefill_rows, applied twice with disjoint
    physical page ids."""
    int4 = isinstance(kv_all, QuantPages)
    bsz, t_pad = slot_rows.shape
    if int4:
        num_phys, num_kv_heads, half_ps, head_dim = kv_all.data.shape[1:]
        page_size = half_ps * 2
        k, k_sc = quantize_int4_values(k)
        v, v_sc = quantize_int4_values(v)
        k = k.reshape(bsz, t_pad, num_kv_heads, head_dim)
        v = v.reshape(bsz, t_pad, num_kv_heads, head_dim)
        k_sc = k_sc.reshape(bsz, t_pad, num_kv_heads)
        v_sc = v_sc.reshape(bsz, t_pad, num_kv_heads)
    else:
        (_, num_phys, num_kv_heads, page_size, head_dim) = kv_all.shape
        k = quantize_for_cache(k, kv_all.dtype, kv_scale).reshape(
            bsz, t_pad, num_kv_heads, head_dim)
        v = quantize_for_cache(v, kv_all.dtype, kv_scale).reshape(
            bsz, t_pad, num_kv_heads, head_dim)
    layer = jnp.asarray(layer, jnp.int32)

    tclip, valid, tile_page = _plan_prefill_tiles(slot_rows, page_size)
    k_flat = jnp.where(tile_page < 0, num_phys,
                       2 * tile_page).reshape(-1)
    v_flat = jnp.where(tile_page < 0, num_phys,
                       2 * tile_page + 1).reshape(-1)
    layer_b = jnp.broadcast_to(layer, k_flat.shape)

    # K tiles and V tiles land on disjoint pages, so the RMWs chain.
    if int4:
        data = _rmw_tile_int4(kv_all.data, k, layer_b, k_flat, tclip, valid)
        data = _rmw_tile_int4(data, v, layer_b, v_flat, tclip, valid)
        sc = _rmw_tile_scale(kv_all.scale, k_sc, layer_b, k_flat, tclip,
                             valid)
        sc = _rmw_tile_scale(sc, v_sc, layer_b, v_flat, tclip, valid)
        return QuantPages(data, sc)
    out = _rmw_tile(kv_all, k, layer_b, k_flat, tclip, valid)
    return _rmw_tile(out, v, layer_b, v_flat, tclip, valid)


def fused_page_indices(idx: jax.Array) -> jax.Array:
    """Logical page ids -> interleaved physical ids [2i, 2i+1, ...] for
    the fused KV layout (copy/swap/migration index expansion).  The
    SINGLE definition of the fused physical mapping — host-side plans
    use :func:`fused_page_ids` below."""
    idx = jnp.asarray(idx, dtype=jnp.int32)
    return jnp.stack([2 * idx, 2 * idx + 1], axis=-1).reshape(-1)


def fused_page_ids(ids: List[int]) -> List[int]:
    """Host-list twin of :func:`fused_page_indices` (same mapping; keep
    the two adjacent so the layout invariant lives in one place)."""
    return [j for i in ids for j in (2 * i, 2 * i + 1)]


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

    def cp(pages):
        return jax.tree.map(
            lambda a: a.at[dst].set(jnp.take(a, src, axis=0, mode="clip"),
                                    mode="drop"), pages)

    return cp(k_pages), cp(v_pages)


def gather_pages(pages, indices: jax.Array):
    """Pull a set of pages out of the cache (KV migration send side).
    Works leaf-wise on QuantPages (int4 caches migrate data + scales)."""
    return jax.tree.map(
        lambda a: jnp.take(a, indices, axis=0, mode="clip"), pages)


def scatter_pages(pages, indices: jax.Array, values):
    """Write a set of pages into the cache (KV migration receive side)."""
    return jax.tree.map(
        lambda p, v: p.at[indices].set(v.astype(p.dtype), mode="drop"),
        pages, values)


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

    def leaf_out(dev, host):
        gathered = np.asarray(jnp.take(dev, src, axis=0, mode="clip"))
        for i, s in enumerate(sorted(mapping.keys())):
            host[mapping[s]] = gathered[i]

    jax.tree.map(leaf_out, k_pages, k_host)
    jax.tree.map(leaf_out, v_pages, v_host)


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

    def leaf_in(dev, host):
        vals = jnp.asarray(np.ascontiguousarray(host[src]))
        return dev.at[dst].set(vals.astype(dev.dtype), mode="drop")

    return (jax.tree.map(leaf_in, k_pages, k_host),
            jax.tree.map(leaf_in, v_pages, v_host))
