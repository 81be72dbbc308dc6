"""Fused weight-dequant + matmul kernels (weight-only quantization).

TPU-native replacement for the reference's CUDA quantization kernels
(csrc/quantization/gptq/q_gemm.cu, awq/gemm_kernels.cu,
marlin/marlin_cuda_kernel.cu): one Pallas kernel serves GPTQ, AWQ and
Marlin's role because all three reduce to the same math — int4 weights,
per-(group, out-channel) scales and zero points, dequantized on the fly
into the matmul.

Internal INT4 layout ("pack2G"): the K dimension is split into blocks of
``2*G`` rows (G = quantization group size).  Each block stores its two
groups in ONE int8 row-tile of shape [G, N]: the low nibble of row r holds
k = block*2G + r (group 2b), the high nibble holds k = block*2G + G + r
(group 2b+1).  Unpacking in-kernel is therefore two cheap vector ops (AND
/ SHIFT) and produces two CONTIGUOUS [G, N] group tiles — no interleaving
shuffles, unlike the HF GPTQ/AWQ packings which are repacked to this
layout once at load time (ops/quant_loaders.py).

Why this beats bf16 on TPU: decode-time matmuls are HBM-bandwidth-bound
on weight bytes; int4 halves bytes vs int8 and quarters them vs bf16, so
the roofline allows ~4x faster weight streaming.  The MXU still computes
in bf16: each group tile is dequantized ``(q - z) * s`` (z, s broadcast
[1, N] over the group's rows) and fed to ``jax.lax.dot_general`` with
f32 accumulation.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Packing helpers (host side, load time)
# ---------------------------------------------------------------------------


def pack_int4(w_q: np.ndarray, group_size: int) -> np.ndarray:
    """[K, N] int values in [0, 15] -> int8 [K/2, N] in pack2G layout."""
    k, n = w_q.shape
    assert k % (2 * group_size) == 0, (k, group_size)
    blocks = k // (2 * group_size)
    w_q = w_q.reshape(blocks, 2, group_size, n).astype(np.uint8)
    lo = w_q[:, 0]
    hi = w_q[:, 1]
    packed = (lo | (hi << 4)).astype(np.uint8)
    return packed.reshape(blocks * group_size, n).view(np.int8)


def unpack_int4(packed: np.ndarray, group_size: int) -> np.ndarray:
    """Inverse of :func:`pack_int4` (tests / XLA fallback)."""
    kk, n = packed.shape  # kk = K/2
    blocks = kk // group_size
    p = packed.view(np.uint8).reshape(blocks, group_size, n)
    lo = (p & 0xF).astype(np.uint8)
    hi = (p >> 4).astype(np.uint8)
    out = np.stack([lo, hi], axis=1)  # [blocks, 2, G, n]
    return out.reshape(blocks * 2 * group_size, n)


# ---------------------------------------------------------------------------
# XLA reference / fallback
# ---------------------------------------------------------------------------


def dequant_int4(qweight: jax.Array, scales: jax.Array, zeros: jax.Array,
                 group_size: int, dtype=jnp.bfloat16) -> jax.Array:
    """pack2G int8 [K/2, N] -> dense [K, N] (XLA; materializes the full
    weight — used off-TPU and as the kernel oracle)."""
    kk, n = qweight.shape
    blocks = kk // group_size
    p = qweight.astype(jnp.uint8).reshape(blocks, group_size, n)
    lo = (p & 0xF).astype(jnp.float32)
    hi = (p >> 4).astype(jnp.float32)
    q = jnp.stack([lo, hi], axis=1).reshape(blocks * 2, group_size, n)
    s = scales.astype(jnp.float32)[:, None, :]
    z = zeros.astype(jnp.float32)[:, None, :]
    w = (q - z) * s
    return w.reshape(blocks * 2 * group_size, n).astype(dtype)


def quant_matmul_int4_reference(x, qweight, scales, zeros, group_size):
    w = dequant_int4(qweight, scales, zeros, group_size, dtype=jnp.float32)
    return jnp.dot(x.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas INT4 kernel
# ---------------------------------------------------------------------------


def _int4_matmul_kernel(
    x_ref,        # [bm, 2G] bf16
    q_ref,        # [G, bn] int8 (pack2G block)
    s_ref,        # [8, bn] f32 (rows 0/1 = the two groups; 8-row padded
    z_ref,        # [8, bn]      to satisfy Mosaic sublane tiling)
    o_ref,        # [bm, bn]
    acc_ref,      # [bm, bn] f32 scratch
    *,
    group_size: int,
    out_dtype,
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Mosaic has no direct u8->bf16 cast; widen to i32 first.
    p = q_ref[...].astype(jnp.uint8).astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.bfloat16)       # group 2b   rows [0, G)
    hi = (p >> 4).astype(jnp.bfloat16)        # group 2b+1 rows [G, 2G)

    s0 = s_ref[0:1, :].astype(jnp.bfloat16)
    s1 = s_ref[1:2, :].astype(jnp.bfloat16)
    z0 = z_ref[0:1, :].astype(jnp.bfloat16)
    z1 = z_ref[1:2, :].astype(jnp.bfloat16)

    w_lo = (lo - z0) * s0                      # [G, bn] bf16
    w_hi = (hi - z1) * s1
    w = jnp.concatenate([w_lo, w_hi], axis=0)  # [2G, bn]

    x = x_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n",
                              "interpret"))
def quant_matmul_int4(
    x: jax.Array,         # [M, K] (bf16/f32)
    qweight: jax.Array,   # [K/2, N] int8 pack2G
    scales: jax.Array,    # [K/G, N]
    zeros: jax.Array,     # [K/G, N]
    *,
    group_size: int,
    block_m: int = 0,     # 0 = auto
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """y = x @ dequant(qweight)."""
    m, k = x.shape
    kk, n = qweight.shape
    assert kk * 2 == k, (k, kk)
    num_groups = k // group_size
    assert scales.shape == (num_groups, n), (scales.shape, num_groups, n)

    if not (_use_pallas() or interpret):
        return quant_matmul_int4_reference(x, qweight, scales, zeros,
                                           group_size)

    if block_m == 0:
        block_m = 128 if m >= 128 else max(8, _round_up(m, 8))
    block_n = _pick_block(n, block_n)

    bk = 2 * group_size
    grid = (_cdiv(m, block_m), n // block_n, k // bk)

    m_pad = _round_up(m, block_m) - m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    # Mosaic requires >=8 sublanes per block: lay the two group rows of
    # each k-block into an 8-row band (rows 2..7 unused).
    num_blocks = k // bk
    s8 = jnp.zeros((num_blocks, 8, n), dtype=jnp.float32)
    s8 = s8.at[:, :2].set(scales.astype(jnp.float32).reshape(
        num_blocks, 2, n))
    z8 = jnp.zeros((num_blocks, 8, n), dtype=jnp.float32)
    z8 = z8.at[:, :2].set(zeros.astype(jnp.float32).reshape(
        num_blocks, 2, n))
    s8 = s8.reshape(num_blocks * 8, n)
    z8 = z8.reshape(num_blocks * 8, n)

    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, group_size=group_size,
                          out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((group_size, block_n), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((8, block_n), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((8, block_n), lambda i, j, kb: (kb, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qweight, s8, z8)
    return out[:m] if m_pad else out


def _pick_block(n: int, preferred: int, cap: int = 5632) -> int:
    """Largest lane-aligned (multiple of 128) divisor of n that is <= cap.

    Bigger N tiles mean fewer grid steps: the kernels are grid-step-
    overhead-bound at decode batch sizes (~350 ns/step measured), so e.g.
    N=11008 runs 5x faster tiled (1, 2, 16) than (1, 43, 16).
    """
    cap = max(cap, preferred)
    best = 0
    for d in range(128, min(n, cap) + 1, 128):
        if n % d == 0:
            best = d
    return best if best else n


# ---------------------------------------------------------------------------
# INT8 (per-channel or grouped) — same structure, no packing
# ---------------------------------------------------------------------------


def _int8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, out_dtype):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    x = x_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        # Per-output-channel scale applied once on the accumulator.
        o_ref[...] = (acc_ref[...] * s_ref[0:1, :].astype(jnp.float32)
                      ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def quant_matmul_int8(
    x: jax.Array,        # [M, K]
    qweight: jax.Array,  # [K, N] int8 (symmetric)
    scales: jax.Array,   # [1, N] per-channel
    *,
    block_m: int = 0,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = qweight.shape
    if not (_use_pallas() or interpret):
        w = qweight.astype(jnp.float32) * scales.astype(jnp.float32)
        return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)

    if block_m == 0:
        block_m = 128 if m >= 128 else max(8, _round_up(m, 8))
    block_n = _pick_block(n, block_n)
    block_k = _pick_block(k, block_k)

    grid = (_cdiv(m, block_m), n // block_n, k // block_k)
    m_pad = _round_up(m, block_m) - m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qweight, scales)
    return out[:m] if m_pad else out


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


# ---------------------------------------------------------------------------
# Stacked (scan-model) variants: the kernel reads layer `layer_index` of
# the FULL [L, ...] weight stack via scalar-prefetch-driven index maps, so
# scan bodies never slice (= copy) a layer's weights out of HBM.
# ---------------------------------------------------------------------------


def pad_scales_p8(scales: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """[.., K/G, N] raw scales -> [.., K/(2G)*8, N] 8-row-banded layout
    consumed by the kernels (rows 0/1 of each band = the block's two
    groups).  Applied ONCE at load time."""
    *lead, rows, n = scales.shape
    nb = rows // 2
    out = jnp.zeros((*lead, nb, 8, n), dtype=jnp.float32)
    out = out.at[..., :2, :].set(
        scales.astype(jnp.float32).reshape(*lead, nb, 2, n))
    return out.reshape(*lead, nb * 8, n)


def _int4_matmul_kernel_stacked(
    layer_ref,    # [1] int32 (scalar prefetch)
    x_ref,        # [bm, 2G]
    q_ref,        # [1, G, bn] int8
    s_ref,        # [1, 8, bn] f32 (scales)
    z_ref,        # [1, 8, bn] f32
    o_ref,        # [bm, bn]
    acc_ref,
    *,
    group_size: int,
    out_dtype,
):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    p = q_ref[0].astype(jnp.uint8).astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.bfloat16)
    hi = (p >> 4).astype(jnp.bfloat16)
    s0 = s_ref[0, 0:1, :].astype(jnp.bfloat16)
    s1 = s_ref[0, 1:2, :].astype(jnp.bfloat16)
    z0 = z_ref[0, 0:1, :].astype(jnp.bfloat16)
    z1 = z_ref[0, 1:2, :].astype(jnp.bfloat16)
    w = jnp.concatenate([(lo - z0) * s0, (hi - z1) * s1], axis=0)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n",
                              "interpret"))
def quant_matmul_int4_stacked(
    x: jax.Array,          # [M, K]
    qweight: jax.Array,    # [L, K/2, N] int8 pack2G
    scales_p8: jax.Array,  # [L, K/(2G)*8, N] (pad_scales_p8 layout)
    zeros_p8: jax.Array,
    layer_index: jax.Array,  # scalar i32
    *,
    group_size: int,
    block_m: int = 0,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    num_layers, kk, n = qweight.shape
    assert kk * 2 == k

    if not (_use_pallas() or interpret):
        qw = jax.lax.dynamic_index_in_dim(qweight, layer_index,
                                          keepdims=False)
        s8 = jax.lax.dynamic_index_in_dim(scales_p8, layer_index,
                                          keepdims=False)
        z8 = jax.lax.dynamic_index_in_dim(zeros_p8, layer_index,
                                          keepdims=False)
        nb = k // (2 * group_size)
        s = s8.reshape(nb, 8, n)[:, :2].reshape(nb * 2, n)
        z = z8.reshape(nb, 8, n)[:, :2].reshape(nb * 2, n)
        return quant_matmul_int4_reference(x, qw, s, z, group_size)

    if block_m == 0:
        block_m = 128 if m >= 128 else max(8, _round_up(m, 8))
    block_n = _pick_block(n, block_n)
    bk = 2 * group_size
    grid = (_cdiv(m, block_m), n // block_n, k // bk)

    m_pad = _round_up(m, block_m) - m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    layer_arr = jnp.asarray([layer_index], dtype=jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel_stacked,
                          group_size=group_size, out_dtype=x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, bk), lambda i, j, kb, L: (i, kb)),
                pl.BlockSpec((1, group_size, block_n),
                             lambda i, j, kb, L: (L[0], kb, j)),
                pl.BlockSpec((1, 8, block_n),
                             lambda i, j, kb, L: (L[0], kb, j)),
                pl.BlockSpec((1, 8, block_n),
                             lambda i, j, kb, L: (L[0], kb, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, kb, L: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(layer_arr, x.astype(jnp.bfloat16), qweight, scales_p8, zeros_p8)
    return out[:m] if m_pad else out


def _int8_matmul_kernel_stacked(layer_ref, x_ref, q_ref, s_ref, o_ref,
                                acc_ref, *, out_dtype):
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w = q_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[...] = (acc_ref[...] *
                      s_ref[0, 0:1, :].astype(jnp.float32)).astype(
                          out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret"))
def quant_matmul_int8_stacked(
    x: jax.Array,        # [M, K]
    qweight: jax.Array,  # [L, K, N] int8
    scales: jax.Array,   # [L, 1, N]
    layer_index: jax.Array,
    *,
    block_m: int = 0,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, _, n = qweight.shape
    if not (_use_pallas() or interpret):
        qw = jax.lax.dynamic_index_in_dim(qweight, layer_index,
                                          keepdims=False)
        s = jax.lax.dynamic_index_in_dim(scales, layer_index,
                                         keepdims=False)
        w = qw.astype(jnp.float32) * s.astype(jnp.float32)
        return jnp.dot(x.astype(jnp.float32), w).astype(x.dtype)

    if block_m == 0:
        block_m = 128 if m >= 128 else max(8, _round_up(m, 8))
    block_n = _pick_block(n, block_n)
    block_k = _pick_block(k, block_k)
    grid = (_cdiv(m, block_m), n // block_n, k // block_k)
    m_pad = _round_up(m, block_m) - m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    layer_arr = jnp.asarray([layer_index], dtype=jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel_stacked, out_dtype=x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, block_k),
                             lambda i, j, kb, L: (i, kb)),
                pl.BlockSpec((1, block_k, block_n),
                             lambda i, j, kb, L: (L[0], kb, j)),
                pl.BlockSpec((1, 1, block_n),
                             lambda i, j, kb, L: (L[0], 0, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, kb, L: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(layer_arr, x.astype(jnp.bfloat16), qweight, scales)
    return out[:m] if m_pad else out
