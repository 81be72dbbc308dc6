"""Grouped (ragged) expert matmul for MoE (reference role: the Triton
fused_moe kernel + moe_align_block_size, vllm/model_executor/layers/
fused_moe/fused_moe.py:18-150 and csrc/moe_align_block_size_kernels.cu).

Dense-dispatch (every token through every expert) is fine for decode —
weight streaming dominates — but costs E/topk x extra FLOPs at prefill.
This path is FLOPs-proportional:

1. ``moe_align`` (XLA): sort the (token, expert) pairs by expert and pad
   each expert's run to a TILE multiple — the reference's
   moe_align_block_size — producing a gather order, a per-TILE expert
   id vector, and scatter-back indices.  All static shapes (worst case
   T*topk + E*TILE rows).
2. ``grouped_matmul`` (Pallas): a block-diagonal matmul whose weight
   BlockSpec is indexed by the scalar-prefetched per-tile expert id.
   Sorted order means consecutive tiles mostly share an expert, so
   Pallas skips the weight re-fetch and each expert's weights stream
   from HBM once.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128       # sorted-token rows per tile
FT = 512         # output-feature tile


def moe_align(
    topk_ids: jax.Array,   # [T, k] int32
    num_experts: int,
    tile: int = TILE,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (src [TKP] int32 — flat (token*k) index feeding each
    sorted-padded row, -1 for padding; expert_per_tile [num_tiles];
    dest [TK] — each flat pair's row in the sorted-padded layout;
    num_real [E] counts).  TKP = T*k + E*tile (static)."""
    t, k = topk_ids.shape
    tk = t * k
    flat = topk_ids.reshape(-1).astype(jnp.int32)
    counts = jnp.bincount(flat, length=num_experts)          # [E]
    padded = ((counts + tile - 1) // tile) * tile
    group_start = jnp.concatenate(
        [jnp.zeros((1, ), jnp.int32),
         jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    run_start = jnp.concatenate(
        [jnp.zeros((1, ), jnp.int32),
         jnp.cumsum(counts)[:-1].astype(jnp.int32)])

    order = jnp.argsort(flat, stable=True)                   # [TK]
    sorted_experts = flat[order]
    rank = jnp.arange(tk, dtype=jnp.int32) - run_start[sorted_experts]
    dest_sorted = group_start[sorted_experts] + rank          # [TK]

    # Tile-aligned worst case: sum(padded) <= tk + E*(tile-1), and the
    # matmul grids walk tkp // tile tiles, so tkp itself must be a tile
    # multiple that covers the bound.
    tkp = ((tk + tile - 1) // tile) * tile + num_experts * tile
    src = jnp.full((tkp, ), -1, dtype=jnp.int32)
    src = src.at[dest_sorted].set(order.astype(jnp.int32))
    dest = jnp.zeros((tk, ), jnp.int32).at[order].set(dest_sorted)

    num_tiles = tkp // tile
    tile_start = jnp.arange(num_tiles, dtype=jnp.int32) * tile
    bounds = jnp.cumsum(padded)                               # [E]
    expert_per_tile = jnp.searchsorted(bounds, tile_start,
                                       side="right").astype(jnp.int32)
    # Trailing all-padding tiles fall past the last bound (id == E):
    # clamp — their rows are zeros, any valid weight block works.
    expert_per_tile = jnp.minimum(expert_per_tile, num_experts - 1)
    return src, expert_per_tile, dest, counts


def _grouped_kernel(expert_ids_ref, x_ref, w_ref, o_ref):
    # fp32 operands get full-precision passes on the MXU; bf16/int paths
    # (the production dtypes) keep the fast default.
    precision = (jax.lax.Precision.HIGHEST
                 if x_ref.dtype == jnp.float32 else
                 jax.lax.Precision.DEFAULT)
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[0],
        dimension_numbers=(((1, ), (0, )), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", ))
def grouped_matmul(
    x_sorted: jax.Array,      # [TKP, H] (expert-sorted, padded rows = 0)
    w: jax.Array,             # [E, H, F] stacked expert weights
    expert_per_tile: jax.Array,  # [TKP // TILE] int32
    interpret: bool = False,
) -> jax.Array:
    """Block-diagonal matmul: rows of tile t hit expert expert_per_tile[t].
    Returns [TKP, F] in x_sorted's dtype."""
    tkp, h = x_sorted.shape
    num_experts, _, f = w.shape
    num_tiles = tkp // TILE
    # Largest lane-aligned output tile dividing f.
    ft = f
    for cand in (FT, 256, 128):
        if f % cand == 0:
            ft = min(f, cand) if f >= cand else f
            break
    assert f % ft == 0, f"output dim {f} not 128-aligned"

    return pl.pallas_call(
        _grouped_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles, f // ft),
            in_specs=[
                pl.BlockSpec((TILE, h), lambda t, j, eids: (t, 0)),
                # Weight block chosen by the tile's expert id: sorted
                # order makes consecutive tiles share experts, so the
                # revisit skips the HBM fetch.
                pl.BlockSpec((1, h, ft), lambda t, j, eids: (eids[t], 0, j)),
            ],
            out_specs=pl.BlockSpec((TILE, ft), lambda t, j, eids: (t, j)),
        ),
        out_shape=jax.ShapeDtypeStruct((tkp, f), x_sorted.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"), ),
        interpret=interpret,
    )(expert_per_tile, x_sorted, w)


def fused_moe_grouped(
    x: jax.Array,             # [T, H]
    w1: jax.Array,            # [E, H, F]
    w3,                       # [E, H, F] or None
    w2: jax.Array,            # [E, F, H]
    topk_weights: jax.Array,  # [T, k] f32
    topk_ids: jax.Array,      # [T, k] i32
    act_fn,
    interpret: bool = False,
) -> jax.Array:
    """FLOPs-proportional MoE FFN over expert-sorted tiles."""
    t, h = x.shape
    k = topk_ids.shape[1]
    num_experts = w1.shape[0]
    src, expert_per_tile, dest, _ = moe_align(topk_ids, num_experts)

    x_sorted = jnp.where(src[:, None] >= 0,
                         jnp.take(x, jnp.maximum(src, 0) // k, axis=0,
                                  mode="clip"), 0).astype(x.dtype)

    h1 = grouped_matmul(x_sorted, w1, expert_per_tile, interpret=interpret)
    if w3 is not None:
        inner = act_fn(h1) * grouped_matmul(x_sorted, w3, expert_per_tile,
                                            interpret=interpret)
    else:
        inner = act_fn(h1)
    out_sorted = grouped_matmul(inner.astype(x.dtype), w2, expert_per_tile,
                                interpret=interpret)      # [TKP, H]

    # Scatter back + weighted combine over each token's k experts.
    gathered = jnp.take(out_sorted, dest, axis=0,
                        mode="clip").reshape(t, k, h)
    return jnp.einsum("tkh,tk->th", gathered.astype(jnp.float32),
                      topk_weights.astype(jnp.float32)).astype(x.dtype)


def stack_expert_quant(vals):
    """Stack a uniform list of per-expert pack2G int4 dicts into one
    banded [E, ...] dict for the grouped kernels; returns None if the
    experts are not uniform plain-int4 dicts (caller keeps the list)."""
    if not vals or not all(isinstance(v, dict) for v in vals):
        return None
    names = set(vals[0])
    if names not in ({"qweight", "scales", "zeros"},
                     {"qweight", "scales"}):
        return None
    if any(set(v) != names or v["qweight"].shape != vals[0]["qweight"].shape
           for v in vals):
        return None
    sub = {k: jnp.stack([v[k] for v in vals]) for k in names}
    if "zeros" not in names:
        # int8 experts ({qweight [K, N] int8, scales [1, N]}).
        return sub
    from vllm_splitwise_tpu.ops.quant_matmul import (pack_sz_bands,
                                                     pad_qweight_even)
    k_dim = sub["qweight"].shape[1] * 2
    group = k_dim // sub["scales"].shape[1]
    sub["sz_bands"] = pack_sz_bands(sub.pop("scales"), sub.pop("zeros"),
                                    group)
    sub["qweight"] = pad_qweight_even(sub["qweight"], group)
    sub["sz_group"] = jnp.zeros((1, group, 0), jnp.float32)
    return sub


def fused_moe_grouped_quant(
    x: jax.Array,             # [T, H]
    w1: dict,                 # stacked int4 dict [E, ...]
    w3,                       # stacked int4 dict or None
    w2: dict,
    topk_weights: jax.Array,  # [T, k] f32
    topk_ids: jax.Array,      # [T, k] i32
    act_fn,
    interpret: bool = False,
) -> jax.Array:
    """Quantized grouped MoE (the fork's group_gptq_gemm/awq_group_gemm
    role): three grouped fused dequant+matmuls over expert-sorted tiles
    instead of E separate kernel dispatch chains per layer."""
    from vllm_splitwise_tpu.ops.quant_matmul import (
        quant_matmul_int4_grouped, quant_matmul_int8_grouped)

    t, h = x.shape
    k = topk_ids.shape[1]
    num_experts = w1["qweight"].shape[0]
    src, expert_per_tile, dest, _ = moe_align(topk_ids, num_experts)

    x_sorted = jnp.where(src[:, None] >= 0,
                         jnp.take(x, jnp.maximum(src, 0) // k, axis=0,
                                  mode="clip"), 0).astype(x.dtype)

    def gmm(rows, wd):
        if "sz_bands" in wd:
            return quant_matmul_int4_grouped(
                rows, wd["qweight"], wd["sz_bands"], expert_per_tile,
                group_size=int(wd["sz_group"].shape[-2]),
                interpret=interpret)
        return quant_matmul_int8_grouped(rows, wd["qweight"],
                                         wd["scales"], expert_per_tile,
                                         interpret=interpret)

    h1 = gmm(x_sorted, w1)
    if w3 is not None:
        inner = act_fn(h1) * gmm(x_sorted, w3)
    else:
        inner = act_fn(h1)
    out_sorted = gmm(inner.astype(x.dtype), w2)

    gathered = jnp.take(out_sorted, dest, axis=0,
                        mode="clip").reshape(t, k, h)
    return jnp.einsum("tkh,tk->th", gathered.astype(jnp.float32),
                      topk_weights.astype(jnp.float32)).astype(x.dtype)
