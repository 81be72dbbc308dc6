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
    """[K, N] int values in [0, 15] -> int8 [K/2, N] in pack2G layout.

    Signed-high packing: the byte is ``lo | (((hi - 8) & 0xF) << 4)``,
    i.e. as a SIGNED int8 it equals ``16*(hi - 8) + lo`` exactly.  The
    W4A8 kernel exploits this to recover both nibbles from int8 MXU
    dots alone — ``x @ lo  = x @ (byte & 0xF)`` and ``x @ (hi - 8) =
    (x @ byte - x @ (byte & 0xF)) >> 4`` — leaving ONE vector bit-op
    per weight element instead of a full unpack."""
    k, n = w_q.shape
    assert k % (2 * group_size) == 0, (k, group_size)
    blocks = k // (2 * group_size)
    w_q = w_q.reshape(blocks, 2, group_size, n).astype(np.uint8)
    lo = w_q[:, 0]
    hi = w_q[:, 1]
    packed = (lo | (((hi + 8) & 0xF) << 4)).astype(np.uint8)
    return packed.reshape(blocks * group_size, n).view(np.int8)


def unpack_int4(packed: np.ndarray, group_size: int) -> np.ndarray:
    """Inverse of :func:`pack_int4` (tests / XLA fallback)."""
    kk, n = packed.shape  # kk = K/2
    blocks = kk // group_size
    pu = packed.view(np.uint8).reshape(blocks, group_size, n)
    ps = packed.view(np.int8).reshape(blocks, group_size, n)
    lo = (pu & 0xF).astype(np.uint8)
    # Arithmetic shift of the signed byte gives hi - 8 exactly.
    hi = ((ps >> 4).astype(np.int16) + 8).astype(np.uint8)
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
    p = qweight.astype(jnp.int32).reshape(blocks, group_size, n)
    lo = (p & 0xF).astype(jnp.float32)
    hi = ((p >> 4) + 8).astype(jnp.float32)
    q = jnp.stack([lo, hi], axis=1).reshape(blocks * 2, group_size, n)
    s = scales.astype(jnp.float32)[:, None, :]
    z = zeros.astype(jnp.float32)[:, None, :]
    w = (q - z) * s
    return w.reshape(blocks * 2 * group_size, n).astype(dtype)


def quant_matmul_int4_reference(x, qweight, scales, zeros, group_size):
    w = dequant_int4(qweight, scales, zeros, group_size, dtype=jnp.float32)
    return jnp.dot(x.astype(jnp.float32), w,
                   preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas INT4 kernel
# ---------------------------------------------------------------------------


def _int4_matmul_kernel(
    x_ref,        # [bm, 2G] bf16
    q_ref,        # [G, bn] int8 (pack2G block)
    sz_ref,       # [8, bn] f32 (pack_sz_bands: two k-blocks per band)
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

    # Mosaic has no direct u8->bf16 cast; widen (sign-extending) first.
    p = q_ref[...].astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.bfloat16)       # group 2b   rows [0, G)
    hi = ((p >> 4) + 8).astype(jnp.bfloat16)  # group 2b+1 rows [G, 2G)

    even = (kb % 2) == 0
    sz = sz_ref[...].astype(jnp.bfloat16)
    s0 = jnp.where(even, sz[0:1, :], sz[4:5, :])
    s1 = jnp.where(even, sz[1:2, :], sz[5:6, :])
    z0 = jnp.where(even, sz[2:3, :], sz[6:7, :])
    z1 = jnp.where(even, sz[3:4, :], sz[7:8, :])

    w_lo = (lo - z0) * s0                      # [G, bn] bf16
    w_hi = (hi - z1) * s1
    w = jnp.concatenate([w_lo, w_hi], axis=0)  # [2G, bn]

    x = x_ref[...]
    acc_ref[...] += jax.lax.dot_general(
        x, w, dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

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

    # Mosaic needs the x-block's lane dim (2*G) 128-aligned or equal to
    # the full (padded) K; tiny group sizes (tests, exotic checkpoints)
    # take the dense reference path — interpret mode is laxer, so gate
    # on the real-lowering rule, not on interpret.
    lane_ok = (2 * group_size) % 128 == 0 or 2 * group_size == k
    if not ((_use_pallas() and lane_ok) or (interpret and lane_ok)):
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

    sz_bands = pack_sz_bands(scales, zeros, group_size)

    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, group_size=group_size,
                          out_dtype=x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, bk), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((group_size, block_n), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((8, block_n), lambda i, j, kb: (kb // 2, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), qweight, sz_bands)
    return out[:m] if m_pad else out


def _pick_block(n: int, preferred: int, cap: int = 5632,
                strict: bool = False) -> int:
    """Largest lane-aligned (multiple of 128) divisor of n that is <= cap.

    Bigger N tiles mean fewer grid steps: the kernels are grid-step-
    overhead-bound at decode batch sizes (~350 ns/step measured), so e.g.
    N=11008 runs 5x faster tiled (1, 2, 16) than (1, 43, 16).

    When no aligned divisor fits the cap: non-strict mode returns n
    itself only when n is already within the cap (small / odd shapes run
    single-tile); ``strict=True`` returns 0 so VMEM-guard callers can
    shrink another axis instead of silently blowing the limit.
    """
    cap = max(cap, preferred)
    best = 0
    for d in range(128, min(n, cap) + 1, 128):
        if n % d == 0:
            best = d
    if best:
        return best
    if n <= cap:
        return n
    return 0 if strict else n


def _int8_scoped_vmem(bm: int, bn: int, bk: int, out_bytes: int) -> int:
    """Scoped-VMEM estimate for the int8 matmul kernels, matching the
    compiler's accounting measured on-chip 2026-08-20 (probe_int8_head):
    double-buffered pipelined blocks + the f32 accumulator.  Observed:
    (bn=3200, bk=4096, bm=24, f32 out) -> 25.8 MB reported; model 26.8."""
    return (2 * bn * bk           # qweight int8 x2 buffers
            + 2 * bm * bk * 2     # x bf16
            + 2 * 8 * bn * 4      # scales (sublane-padded)
            + 2 * bm * bn * out_bytes
            + bm * bn * 4)        # accumulator scratch


_INT8_VMEM_LIMIT = 14 * 1024 * 1024  # 16 MB scoped limit minus margin


def _fit_int8_blocks(m_blk: int, n: int, k: int, bn: int, bk: int,
                     out_bytes: int) -> Tuple[int, int]:
    """Shrink (block_n, block_k) until the kernel fits scoped VMEM.

    Shrinks the larger axis first (fewer grid steps for the same
    footprint); measured flat perf across fitting tiles at the LM-head
    shape (362-377 us for everything >= 1280x512), so fitting cheaply
    beats tiling aggressively."""
    while _int8_scoped_vmem(m_blk, bn, bk, out_bytes) > _INT8_VMEM_LIMIT:
        if bk >= bn and bk > 128:
            smaller = _pick_block(k, 128, cap=bk - 128, strict=True)
        elif bn > 128:
            smaller = _pick_block(n, 128, cap=bn - 128, strict=True)
            if smaller:
                bn = smaller
                continue
            smaller = 0
        else:
            smaller = 0
        if smaller:
            bk = smaller
            continue
        # Neither axis has a smaller aligned divisor: shrink whichever
        # still can, else give up and let the compiler report precisely.
        nk = _pick_block(k, 128, cap=bk - 128, strict=True) if bk > 128 else 0
        nn = _pick_block(n, 128, cap=bn - 128, strict=True) if bn > 128 else 0
        if nk:
            bk = nk
        elif nn:
            bn = nn
        else:
            break
    return bn, bk


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
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    @pl.when(kb == num_kb - 1)
    def _():
        # Per-output-channel scale applied once on the accumulator.
        o_ref[...] = (acc_ref[...] * s_ref[0:1, :].astype(jnp.float32)
                      ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype",
                              "interpret"))
def quant_matmul_int8(
    x: jax.Array,        # [M, K]
    qweight: jax.Array,  # [K, N] int8 (symmetric)
    scales: jax.Array,   # [1, N] per-channel
    *,
    block_m: int = 0,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    _, n = qweight.shape
    out_dtype = x.dtype if out_dtype is None else out_dtype
    if not (_use_pallas() or interpret):
        w = qweight.astype(jnp.float32) * scales.astype(jnp.float32)
        return jnp.dot(x.astype(jnp.float32), w).astype(out_dtype)

    if block_m == 0:
        block_m = 128 if m >= 128 else max(8, _round_up(m, 8))
    block_n = _pick_block(n, block_n)
    block_k = _pick_block(k, block_k)
    # VMEM guard (r3 regression: at the vocab-width LM head shape
    # N=32000/K=4096 the unguarded picks bn=3200/bk=4096 demand 25.8 MB
    # scoped and kill the compile on-chip — BENCH_r03.json rc=1).
    block_n, block_k = _fit_int8_blocks(
        block_m, n, k, block_n, block_k, jnp.dtype(out_dtype).itemsize)

    grid = (_cdiv(m, block_m), n // block_n, k // block_k)
    m_pad = _round_up(m, block_m) - m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, kb: (i, kb)),
            pl.BlockSpec((block_k, block_n), lambda i, j, kb: (kb, j)),
            pl.BlockSpec((1, block_n), lambda i, j, kb: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, kb: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), out_dtype),
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


def _sz_dtype():
    """Band-metadata storage dtype.  f32 (default) is exact for any
    checkpoint; VST_SZ_DTYPE=f16 HALVES the metadata HBM stream (~6% of
    the int4 weight bytes) and is STILL exact for real GPTQ/AWQ
    checkpoints — their scales ship as float16 and their zero points are
    small integers, both bit-representable in f16.  Read at pack time so
    A/B runs need no code change."""
    import os
    return jnp.float16 if os.environ.get("VST_SZ_DTYPE") == "f16" \
        else jnp.float32


def pack_sz_bands(scales: jnp.ndarray, zeros: jnp.ndarray,
                  group_size: int) -> jnp.ndarray:
    """[.., K/G, N] raw (scales, zeros) -> ONE [.., ceil(nb/2)*8, N]
    band array (dtype per :func:`_sz_dtype`), nb = K/(2G) k-blocks.

    Row layout per 8-row band: even k-block at rows 0..3 = (s0, s1, z0,
    z1), odd k-block at rows 4..7.  Mosaic needs >=8 sublanes per block
    anyway, so packing two k-blocks' metadata into one band makes the
    padding free: the kernels stream K*N/16 f32 bytes of metadata per
    matmul instead of K*N/2 (two separate 8-row-padded arrays) — at 7B
    decode shapes that is ~1.2 GB/step less HBM traffic.
    """
    dt = _sz_dtype()
    *lead, rows, n = scales.shape
    nb = rows // 2                       # k-blocks of 2G rows
    nbands = (nb + 1) // 2
    sz = jnp.stack([scales.astype(dt), zeros.astype(dt)],
                   axis=-2)              # [.., K/G, 2, N] -> per group
    # Per k-block quad (s0, s1, z0, z1):
    sz = sz.reshape(*lead, nb, 2, 2, n)        # [.., nb, group01, sz, N]
    quad = jnp.concatenate([sz[..., :, 0, :], sz[..., :, 1, :]],
                           axis=-2)            # [.., nb, 4, N]
    if nb % 2:
        quad = jnp.concatenate(
            [quad, jnp.zeros((*lead, 1, 4, n), dt)], axis=-3)
    return quad.reshape(*lead, nbands, 8, n).reshape(
        *lead, nbands * 8, n)


def pad_qweight_even(qweight: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Pad a pack2G qweight's row dim so the k-block count is even (one
    zero phantom block), matching the stacked kernel's superblock grid.
    Applied once at load/stack time — padding inside the jitted matmul
    would copy the whole [L, K/2, N] stack every call."""
    rows = qweight.shape[-2]
    nb = rows // group_size
    if nb % 2 == 0:
        return qweight
    pad = [(0, 0)] * (qweight.ndim - 2) + [(0, group_size), (0, 0)]
    return jnp.pad(qweight, pad)


def unpack_sz_bands(sz_bands: jnp.ndarray, k: int,
                    group_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of :func:`pack_sz_bands` -> raw f32 ([K/G, N], [K/G, N])."""
    nb = k // (2 * group_size)
    rows, n = sz_bands.shape[-2:]
    quad = sz_bands.astype(jnp.float32).reshape(
        rows // 8 * 2, 4, n)[:nb]                       # [nb, 4, N]
    s = quad[:, 0:2].reshape(nb * 2, n)
    z = quad[:, 2:4].reshape(nb * 2, n)
    return s, z


def infer_group_size(k: int, sz_rows: int) -> int:
    """Recover the quantization group size from a band array's row count.

    nbands = sz_rows/8 covers nb in {2*nbands - 1, 2*nbands}; the even
    candidate is preferred (both only collide for non-standard K/G
    combinations, which the loaders never produce)."""
    nbands = sz_rows // 8
    cands = [k // (2 * nb) for nb in (2 * nbands, 2 * nbands - 1)
             if nb > 0 and k % (2 * nb) == 0]
    if not cands:
        raise ValueError(
            f"cannot infer group size from K={k}, rows={sz_rows}")
    # Both block counts can divide K (odd nb, e.g. K=768: G=96 or 128),
    # but at most ONE candidate is a power of two — real quant configs
    # always use power-of-two groups, so that one wins.
    for g in cands:
        if g & (g - 1) == 0:
            return g
    return cands[0]


def _int4_matmul_kernel_stacked(
    layer_ref,    # [1] int32 (scalar prefetch)
    x_ref,        # [bm, 2G] bf16
    q_ref,        # [1, G, bn] int8
    sz_ref,       # [1, 8, bn] f32 (pack_sz_bands: two k-blocks per band)
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

    p = q_ref[0].astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.bfloat16)
    hi = ((p >> 4) + 8).astype(jnp.bfloat16)
    # Even k-block -> band rows 0..3, odd -> rows 4..7 (s0, s1, z0, z1).
    # (A "superblock" variant consuming the whole band per grid step
    # measured 3.5x SLOWER end-to-end — bigger k-blocks break Mosaic's
    # DMA/compute pipelining here.)
    even = (kb % 2) == 0
    sz = sz_ref[0].astype(jnp.bfloat16)
    s0 = jnp.where(even, sz[0:1, :], sz[4:5, :])
    s1 = jnp.where(even, sz[1:2, :], sz[5:6, :])
    z0 = jnp.where(even, sz[2:3, :], sz[6:7, :])
    z1 = jnp.where(even, sz[3:4, :], sz[7:8, :])
    w = jnp.concatenate([(lo - z0) * s0, (hi - z1) * s1], axis=0)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, dimension_numbers=(((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

    @pl.when(kb == num_kb - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n",
                              "interpret"))
def quant_matmul_int4_stacked(
    x: jax.Array,          # [M, K]
    qweight: jax.Array,    # [L, K/2, N] int8 pack2G
    sz_bands: jax.Array,   # [L, ceil(nb/2)*8, N] (pack_sz_bands layout)
    layer_index: jax.Array,  # scalar i32
    *,
    group_size: int,
    block_m: int = 0,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    num_layers, kk, n = qweight.shape
    g = group_size
    nb = k // (2 * g)                  # real pack2G k-blocks
    # qweight may carry a zero phantom block (pad_qweight_even); the
    # grid only walks the real blocks.
    assert kk * 2 >= k, (k, kk)

    # Mosaic needs the [bm, 2G] x-block lane dim 128-aligned (or equal to
    # K); unaligned group sizes (e.g. G=32 with K>64) take the XLA path.
    lane_ok = (2 * g) % 128 == 0 or 2 * g == k
    if not ((_use_pallas() and lane_ok) or interpret):
        qw = jax.lax.dynamic_index_in_dim(qweight, layer_index,
                                          keepdims=False)[:k // 2]
        sz = jax.lax.dynamic_index_in_dim(sz_bands, layer_index,
                                          keepdims=False)
        s, z = unpack_sz_bands(sz, k, g)
        return quant_matmul_int4_reference(x, qw, s, z, g)

    if block_m == 0:
        block_m = 128 if m >= 128 else max(8, _round_up(m, 8))
    block_n = _pick_block(n, block_n)
    bk = 2 * g
    grid = (_cdiv(m, block_m), n // block_n, nb)

    m_pad = _round_up(m, block_m) - m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))

    layer_arr = jnp.asarray([layer_index], dtype=jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel_stacked,
                          group_size=g, out_dtype=x.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_m, bk), lambda i, j, kb, L: (i, kb)),
                pl.BlockSpec((1, group_size, block_n),
                             lambda i, j, kb, L: (L[0], kb, j)),
                pl.BlockSpec((1, 8, block_n),
                             lambda i, j, kb, L: (L[0], kb // 2, j)),
            ],
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, kb, L: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(layer_arr, x.astype(jnp.bfloat16), qweight, sz_bands)
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
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

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
    block_n, block_k = _fit_int8_blocks(
        block_m, n, k, block_n, block_k, jnp.dtype(x.dtype).itemsize)
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


# ---------------------------------------------------------------------------
# W4A8 variant: int8 activations through the native int8 MXU.
#
# The bf16-dequant kernels above spend most of their VPU budget turning
# nibbles into bf16 ((q - z) * s on every weight element).  Here the
# activations are quantized per-token to int8 (one scale per row), the
# MXU runs native int8 x int8 -> int32 per group, and dequantization
# collapses into a per-block epilogue on the [bm, bn] accumulator:
#
#   out[m, n] = sx[m] * sum_g s_g[n] * (acc_g[m, n] - z_g[n] * sumx_g[m])
#
# VPU work per weight element drops to unpack+narrow (no bf16 math).
# ---------------------------------------------------------------------------


def quantize_activations_int8(x: jax.Array, group_size: int):
    """[M, K] float -> (xq int8 [M, K], sx f32 [M, 1], sums f32 [M, K/G]).

    Per-token symmetric quantization; ``sums`` are the per-group sums of
    the quantized activations needed for the zero-point term."""
    m, k = x.shape
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-10)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    sums = xq.astype(jnp.float32).reshape(m, k // group_size,
                                          group_size).sum(-1)
    return xq, sx, sums


def _quantize_tail(xf, xq_ref, sums_ref, sx_ref, g, k_real):
    """Shared prologue tail: per-token symmetric int8 + per-group sums +
    lane-broadcast scale, written in the W4A8 matmul's input layout.
    Columns >= k_real are phantom padding and quantize to exact 0."""
    bm, kp = xf.shape
    if kp > k_real:
        lane = jax.lax.broadcasted_iota(jnp.int32, (bm, kp), 1)
        xf = jnp.where(lane < k_real, xf, 0.0)
    sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-10)
    q = jnp.clip(jnp.round(xf / sx), -127.0, 127.0)
    xq_ref[...] = q.astype(jnp.int8)
    sx_ref[...] = jnp.broadcast_to(sx, sx_ref.shape)
    pieces = []
    pad = jnp.zeros((bm, 126), jnp.float32)
    for blk in range(kp // (2 * g)):
        s0 = jnp.sum(q[:, 2 * blk * g:(2 * blk + 1) * g], axis=1,
                     keepdims=True)
        s1 = jnp.sum(q[:, (2 * blk + 1) * g:(2 * blk + 2) * g], axis=1,
                     keepdims=True)
        pieces.append(jnp.concatenate([s0, s1, pad], axis=1))
    sums_ref[...] = jnp.concatenate(pieces, axis=1)


def _quantize_acts_kernel(x_ref, xq_ref, sums_ref, sx_ref, *,
                          group_size: int, k_real: int):
    """Fused activation-quantization prologue in ONE kernel launch.  The
    XLA lowering of the same math is ~4 separate fusion launches per
    matmul site (abs-max reduce, round/clip, group-sum reduce,
    sums-lane scatter) — at decode shapes each launch is ~3-5 us of
    issue latency on tensors that move ~0.1 MiB, so the launches ARE
    the cost."""
    _quantize_tail(x_ref[...].astype(jnp.float32), xq_ref, sums_ref,
                   sx_ref, group_size, k_real)


def _rmsnorm_quantize_kernel(x_ref, w_ref, xq_ref, sums_ref, sx_ref, *,
                             group_size: int, k_real: int, eps: float):
    """RMSNorm fused ahead of the quantize tail (zero-padded lanes do
    not perturb the mean: it divides by the REAL width)."""
    xf = x_ref[...].astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=1, keepdims=True) / k_real
    xf = xf * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)
    _quantize_tail(xf, xq_ref, sums_ref, sx_ref, group_size, k_real)


def _silu_mul_quantize_kernel(x_ref, xq_ref, sums_ref, sx_ref, *,
                              group_size: int, k_real: int):
    """silu(gate) * up fused ahead of the quantize tail; the input is
    the merged gate_up projection output [bm, 2*K]."""
    xf = x_ref[...].astype(jnp.float32)
    bm, two_k = xf.shape
    a = xf[:, :two_k // 2]
    b = xf[:, two_k // 2:]
    act = (a / (1.0 + jnp.exp(-a))) * b
    if act.shape[1] < sums_ref.shape[1] // 128 * 2 * group_size:
        act = jnp.pad(act, ((0, 0), (0, sums_ref.shape[1] // 128 * 2 *
                                     group_size - act.shape[1])))
    _quantize_tail(act, xq_ref, sums_ref, sx_ref, group_size, k_real)


def quantize_activations_int8_fused(x: jax.Array, group_size: int,
                                    k_pad: int, block_m: int,
                                    pre_op: str = "none",
                                    pre_w=None, eps: float = 1e-6,
                                    interpret: bool = False):
    """(x [M, K]) -> (xq int8 [M_pad, k_pad], sums_wide [M_pad, nb*128],
    sx_wide [M_pad, 128]) via the fused Pallas prologue.  ``pre_op``
    optionally folds the op feeding the matmul into the same launch:
    "rmsnorm" (x is the raw hidden state, pre_w the norm weight) or
    "silu_mul" (x is the merged gate_up output [M, 2*K])."""
    m, k_in = x.shape
    k_real = k_in // 2 if pre_op == "silu_mul" else k_in
    m_pad = _round_up(m, block_m)
    # Lane padding happens inside the kernel (k_real masking) except for
    # silu_mul whose halves must stay adjacent; pad rows only here.
    if pre_op != "silu_mul" and k_pad > k_in:
        x = jnp.pad(x, ((0, m_pad - m), (0, k_pad - k_in)))
    elif m_pad > m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    nb = k_pad // (2 * group_size)
    outs = (
        jax.ShapeDtypeStruct((m_pad, k_pad), jnp.int8),
        jax.ShapeDtypeStruct((m_pad, nb * 128), jnp.float32),
        jax.ShapeDtypeStruct((m_pad, 128), jnp.float32),
    )
    if pre_op == "rmsnorm":
        kern = functools.partial(_rmsnorm_quantize_kernel,
                                 group_size=group_size, k_real=k_real,
                                 eps=eps)
        w = pre_w.reshape(1, -1)
        if k_pad > w.shape[1]:
            w = jnp.pad(w, ((0, 0), (0, k_pad - w.shape[1])))
        args = (x, w)
    elif pre_op == "silu_mul":
        kern = functools.partial(_silu_mul_quantize_kernel,
                                 group_size=group_size, k_real=k_real)
        args = (x, )
    else:
        kern = functools.partial(_quantize_acts_kernel,
                                 group_size=group_size, k_real=k_real)
        args = (x, )
    xq, sums_wide, sx_wide = pl.pallas_call(
        kern, out_shape=outs, interpret=interpret)(*args)
    return xq, sums_wide, sx_wide


def _int4_mxu_kernel_stacked(
    layer_ref,    # [1] int32 (scalar prefetch)
    x_ref,        # [bm, 4G] int8 (one full band = two k-blocks of x)
    sums_ref,     # [bm, 256] f32 (group sums: k-block h at cols 128h+{0,1})
    q_ref,        # [1, 2G, bn] int8 pack2G (both k-blocks of the band)
    sz_ref,       # [1, 8, bn] f32 (one pack_sz_bands band)
    sx_ref,       # [bm, 128] f32 (per-token act scale, lane-broadcast)
    *rest,        # [res_ref,] o_ref, acc_ref
    group_size: int,
    has_residual: bool = False,
):
    """Superblock grid step: each step consumes ONE full metadata band =
    two pack2G k-blocks = 4 quant groups (4G k-rows).  Half the grid
    steps of the classic one-k-block step, double the DMA size (better
    pipeline utilization at decode shapes), and the band's (s, z) rows
    sit at STATIC offsets — no even/odd parity selects.  An optional
    residual block rides the epilogue (saves one XLA elementwise kernel
    per projection at decode shapes)."""
    if has_residual:
        res_ref, o_ref, acc_ref = rest
    else:
        res_ref = None
        o_ref, acc_ref = rest
    g = group_size
    kb = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # f16 bands (VST_SZ_DTYPE=f16) widen to f32 on load; f32 is a no-op.
    sz = sz_ref[0].astype(jnp.float32)         # [8, bn]
    xq = x_ref[...]                            # [bm, 4G] int8
    sums = sums_ref[...]                       # [bm, 256]
    dn = (((1, ), (0, )), ((), ()))
    acc = jnp.zeros_like(acc_ref)
    for h in (0, 1):                           # the band's two k-blocks
        # Signed-high pack2G (see pack_int4): byte = 16*(hi-8) + lo.
        # Both nibble dots come off the int8 MXU without unpacking the
        # weight block — the ONLY per-element vector op is one bitwise
        # AND; the shift/bias fix-ups run on the [bm, bn] accumulators.
        p = q_ref[0, h * g:(h + 1) * g]        # [G, bn] int8 raw
        pm = jnp.bitwise_and(p, jnp.int8(0xF))
        x_lo = xq[:, 2 * h * g:(2 * h + 1) * g]
        x_hi = xq[:, (2 * h + 1) * g:(2 * h + 2) * g]
        d_lo = jax.lax.dot_general(x_lo, pm, dimension_numbers=dn,
                                   preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
        d_hi_m = jax.lax.dot_general(x_hi, pm, dimension_numbers=dn,
                                     preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
        d_hi_raw = jax.lax.dot_general(x_hi, p, dimension_numbers=dn,
                                       preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
        # x_hi @ (hi - 8); the difference is an exact multiple of 16.
        hi_signed = jax.lax.shift_right_arithmetic(d_hi_raw - d_hi_m, 4)

        s0 = sz[4 * h + 0:4 * h + 1, :]
        s1 = sz[4 * h + 1:4 * h + 2, :]
        z0 = sz[4 * h + 2:4 * h + 3, :]
        z1 = sz[4 * h + 3:4 * h + 4, :]
        if x_ref.shape[0] >= 64:
            # Prefill tiles (bm >= 64): the VPU fix-up chain on [bm, bn]
            # accumulators dominates the band step (at bm=128 it exceeds
            # the three int8 MXU dots), so fold the zero-point
            # corrections into ONE [bm,2]x[2,bn] dot — the hi nibble's
            # +8 bias rides its correction row (z1-8)*s1.  Exact same
            # math, ~30% fewer VPU ops per band.  Decode tiles keep the
            # fused elementwise form: at full-width block_n the corr
            # temporary pushed the b32 serving shape 348 KB past the
            # 16 MB scoped-VMEM limit (prefill tiles run block_n <=
            # 2048-4096, where the temporary is small).
            dn_c = (((1, ), (0, )), ((), ()))
            c_rows = jnp.concatenate([z0 * s0, (z1 - 8.0) * s1], axis=0)
            corr = jax.lax.dot_general(
                sums[:, 128 * h:128 * h + 2], c_rows,
                dimension_numbers=dn_c,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            acc += (d_lo.astype(jnp.float32) * s0 +
                    hi_signed.astype(jnp.float32) * s1 - corr)
        else:
            sum0 = sums[:, 128 * h + 0:128 * h + 1]   # [bm, 1]
            sum1 = sums[:, 128 * h + 1:128 * h + 2]
            acc_lo = d_lo.astype(jnp.float32)
            acc_hi = hi_signed.astype(jnp.float32) + 8.0 * sum1
            acc += (acc_lo - sum0 * z0) * s0 + (acc_hi - sum1 * z1) * s1
    acc_ref[...] += acc

    @pl.when(kb == num_kb - 1)
    def _():
        # Per-token activation scale folded here: the output leaves the
        # kernel in the model dtype (an f32 out + XLA epilogue multiply
        # measured ~0.4 ms/step of extra HBM traffic at 7B decode).
        out = acc_ref[...] * sx_ref[:, 0:1]
        if has_residual:
            out = out + res_ref[...].astype(jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)


def apply_pre_op(x: jax.Array, pre_op: str, pre_w, eps: float):
    """XLA lowering of the prologue pre-ops (non-TPU fallback and the
    non-W4A8 kernels; must match the Pallas prologue's math)."""
    if pre_op == "rmsnorm":
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) *
                pre_w.astype(jnp.float32)).astype(x.dtype)
    if pre_op == "silu_mul":
        a, b = jnp.split(x.astype(jnp.float32), 2, axis=-1)
        return (jax.nn.silu(a) * b).astype(x.dtype)
    return x


@functools.partial(
    jax.jit, static_argnames=("group_size", "block_m", "block_n",
                              "pre_op", "eps", "interpret"))
def quant_matmul_int4_mxu_stacked(
    x: jax.Array,          # [M, K] float (bf16/f32)
    qweight: jax.Array,    # [L, K/2, N] int8 pack2G
    sz_bands: jax.Array,   # [L, ceil(nb/2)*8, N]
    layer_index: jax.Array,
    *,
    group_size: int,
    block_m: int = 0,
    block_n: int = 512,
    pre_op: str = "none",
    pre_w: "jax.Array" = None,
    eps: float = 1e-6,
    residual: "jax.Array" = None,
    interpret: bool = False,
) -> jax.Array:
    """W4A8 path: y ~= x @ dequant(qweight) with int8-MXU group matmuls.

    Activation quantization adds ~0.4% relative error on top of the int4
    weight quantization (per-token symmetric int8).  ``pre_op`` folds
    the op feeding the matmul into the quantize prologue launch:
    "rmsnorm" (x = raw hidden, pre_w = norm weight) or "silu_mul"
    (x = merged gate_up output [M, 2K]).  ``residual`` ([M, N]) rides
    the epilogue: y += residual in one kernel."""
    m, k_in = x.shape
    k = k_in // 2 if pre_op == "silu_mul" else k_in
    num_layers, kk, n = qweight.shape
    g = group_size
    nb = k // (2 * g)
    assert kk * 2 >= k, (k, kk)

    # Superblock grid: one full band (two k-blocks = 4G k-rows) per step.
    # Mosaic needs the [bm, 4G] x-block lane dim 128-aligned.
    lane_ok = (4 * g) % 128 == 0
    if not ((_use_pallas() and lane_ok) or interpret):
        x = apply_pre_op(x, pre_op, pre_w, eps)
        qw = jax.lax.dynamic_index_in_dim(qweight, layer_index,
                                          keepdims=False)[:k // 2]
        sz = jax.lax.dynamic_index_in_dim(sz_bands, layer_index,
                                          keepdims=False)
        s, z = unpack_sz_bands(sz, k, g)
        xq, sx, _ = quantize_activations_int8(x, g)
        xd = xq.astype(jnp.float32) * sx
        y = quant_matmul_int4_reference(xd.astype(x.dtype), qw, s, z, g)
        return y if residual is None else y + residual

    # Odd k-block counts (e.g. K=11008 at g128 -> 43) ride the phantom
    # zero block pad_qweight_even appended at stack time: its band
    # metadata is zero (pack_sz_bands pads with zeros), so the padded
    # x/sums lanes contribute exactly 0.
    nb_pad = kk // g
    assert nb_pad % 2 == 0 and nb_pad >= nb, (nb_pad, nb)
    num_bands = nb_pad // 2
    k_pad = nb_pad * 2 * g

    if block_m == 0:
        block_m = 128 if m >= 128 else max(8, _round_up(m, 8))
    # VMEM ceiling: the pipelined qweight/sz/out(/residual) blocks plus
    # the f32 accumulator must fit the ~16 MB scoped limit.  Full-width
    # N tiles win at decode rows and fit up to bm=24 (bm=32 only without
    # the residual block); a 64-row tile at N=12288 demands ~19 MB and
    # kills the compile (hit by short-prompt serving, 2026-08-20).
    # Limits below are measured-on-chip safe points at N=12288.
    def _n_limit(bm):
        if bm <= 24 or (bm <= 32 and residual is None):
            return 16384
        if bm <= 32:
            return 6144
        if bm <= 64:
            return 4096
        return 2048

    # Strict pick: when N has no lane-aligned divisor under the limit,
    # shrink block_m (raising the limit tier) rather than silently
    # running a full-width tile past the VMEM ceiling.
    picked = 0
    while True:
        n_limit = _n_limit(block_m)
        picked = _pick_block(n, min(block_n, n_limit), cap=n_limit,
                             strict=True)
        if picked or block_m <= 8:
            break
        block_m = max(8, block_m // 2)
    if not picked:
        # Explicit raise, not assert: this guards a production path and
        # python -O would strip an assert, leaving block_n=0 to produce
        # a zero-division grid.
        raise ValueError(
            f"no lane-aligned tile of N={n} fits the scoped-VMEM limit "
            f"(block_m={block_m}, n_limit={n_limit})")
    block_n = picked
    # Ragged-N tiles (VST_QM_RAGGED_N=1, prefill-size m only): when N's
    # only lane-aligned divisor under the VMEM limit is tiny (the merged
    # gate_up's 22016 = 172*128 allows just 512), grid-step count
    # explodes (43 n-steps x bands x m-steps).  A non-dividing 2048
    # tile with a cdiv grid cuts the step count ~4x; the final tile's
    # out-of-bounds lanes read undefined data but only ever write
    # out-of-bounds output lanes (column-local math), which Pallas
    # masks.  Gated off by default pending on-chip validation.
    import os
    if (os.environ.get("VST_QM_RAGGED_N", "0") == "1" and m >= 64
            and picked < 1024):
        block_n = min(_n_limit(block_m), 2048)
    grid = (_cdiv(m, block_m), _cdiv(n, block_n), num_bands)
    m_pad = _round_up(m, block_m) - m

    # One fused prologue launch builds the quantized activations, the
    # lane-padded per-k-block group sums (static in-kernel positions —
    # dynamic lane slicing is not a Mosaic primitive), and the
    # lane-broadcast per-token scale.
    xq, sums_wide, sx_wide = quantize_activations_int8_fused(
        x, g, k_pad, block_m, pre_op=pre_op, pre_w=pre_w, eps=eps,
        interpret=interpret)

    layer_arr = jnp.asarray([layer_index], dtype=jnp.int32).reshape(1)
    in_specs = [
        pl.BlockSpec((block_m, 4 * g),
                     lambda i, j, kb, L: (i, kb)),
        pl.BlockSpec((block_m, 256),
                     lambda i, j, kb, L: (i, kb)),
        pl.BlockSpec((1, 2 * g, block_n),
                     lambda i, j, kb, L: (L[0], kb, j)),
        pl.BlockSpec((1, 8, block_n),
                     lambda i, j, kb, L: (L[0], kb, j)),
        pl.BlockSpec((block_m, 128),
                     lambda i, j, kb, L: (i, 0)),
    ]
    operands = [layer_arr, xq, sums_wide, qweight, sz_bands, sx_wide]
    if residual is not None:
        if m_pad:
            residual = jnp.pad(residual, ((0, m_pad), (0, 0)))
        in_specs.append(
            pl.BlockSpec((block_m, block_n), lambda i, j, kb, L: (i, j)))
        operands.append(residual)
    out = pl.pallas_call(
        functools.partial(_int4_mxu_kernel_stacked, group_size=g,
                          has_residual=residual is not None),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((block_m, block_n),
                                   lambda i, j, kb, L: (i, j)),
            scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
    return out[:m] if m_pad else out


def quant_matmul_int4_grouped(
    x_sorted: jax.Array,     # [TKP, K] expert-sorted rows (TILE-aligned)
    qweight: jax.Array,      # [E, K/2(+pad), N] int8 pack2G
    sz_bands: jax.Array,     # [E, ceil(nb/2)*8, N]
    expert_per_tile: jax.Array,  # [TKP // 128] int32
    *,
    group_size: int,
    block_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Grouped (ragged MoE) variant of quant_matmul_int4_stacked: the
    leading stack dim is EXPERTS and each 128-row tile of the sorted
    activations selects its expert's blocks via the prefetched per-tile
    expert ids (reference role: ops.group_gptq_gemm / awq_group_gemm,
    csrc/ops.h:100-110 — the fork's quantized fused-MoE kernels)."""
    m, k = x_sorted.shape
    num_experts, kk, n = qweight.shape
    g = group_size
    nb = k // (2 * g)
    assert kk * 2 >= k, (k, kk)
    assert m % 128 == 0

    lane_ok = (2 * g) % 128 == 0 or 2 * g == k
    if not ((_use_pallas() and lane_ok) or interpret):
        # XLA fallback: per-expert exact dequant matmul over tiles.
        outs = []
        for t in range(m // 128):
            e = expert_per_tile[t]
            qw = jax.lax.dynamic_index_in_dim(qweight, e,
                                              keepdims=False)[:k // 2]
            sz = jax.lax.dynamic_index_in_dim(sz_bands, e, keepdims=False)
            s, z = unpack_sz_bands(sz, k, g)
            outs.append(quant_matmul_int4_reference(
                x_sorted[t * 128:(t + 1) * 128], qw, s, z, g))
        return jnp.concatenate(outs, axis=0)

    block_n = _pick_block(n, block_n)
    bk = 2 * g
    grid = (m // 128, n // block_n, nb)

    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel_stacked,
                          group_size=g, out_dtype=x_sorted.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((128, bk), lambda i, j, kb, E: (i, kb)),
                pl.BlockSpec((1, group_size, block_n),
                             lambda i, j, kb, E: (E[i], kb, j)),
                pl.BlockSpec((1, 8, block_n),
                             lambda i, j, kb, E: (E[i], kb // 2, j)),
            ],
            out_specs=pl.BlockSpec((128, block_n),
                                   lambda i, j, kb, E: (i, j)),
            scratch_shapes=[pltpu.VMEM((128, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x_sorted.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(expert_per_tile, x_sorted.astype(jnp.bfloat16), qweight, sz_bands)
    return out


def quant_matmul_int8_grouped(
    x_sorted: jax.Array,     # [TKP, K] expert-sorted rows (TILE-aligned)
    qweight: jax.Array,      # [E, K, N] int8
    scales: jax.Array,       # [E, 1, N]
    expert_per_tile: jax.Array,  # [TKP // 128] int32
    *,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Grouped int8 expert matmul (int8 sibling of
    quant_matmul_int4_grouped)."""
    m, k = x_sorted.shape
    num_experts, _, n = qweight.shape
    assert m % 128 == 0
    if not (_use_pallas() or interpret):
        outs = []
        for t in range(m // 128):
            e = expert_per_tile[t]
            w = (jax.lax.dynamic_index_in_dim(qweight, e, keepdims=False)
                 .astype(jnp.float32) *
                 jax.lax.dynamic_index_in_dim(scales, e, keepdims=False)
                 .astype(jnp.float32))
            outs.append(jnp.dot(
                x_sorted[t * 128:(t + 1) * 128].astype(jnp.float32),
                w).astype(x_sorted.dtype))
        return jnp.concatenate(outs, axis=0)

    block_n = _pick_block(n, block_n)
    block_k = _pick_block(k, block_k)
    block_n, block_k = _fit_int8_blocks(
        128, n, k, block_n, block_k, jnp.dtype(x_sorted.dtype).itemsize)
    grid = (m // 128, n // block_n, k // block_k)
    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel_stacked,
                          out_dtype=x_sorted.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((128, block_k), lambda i, j, kb, E: (i, kb)),
                pl.BlockSpec((1, block_k, block_n),
                             lambda i, j, kb, E: (E[i], kb, j)),
                pl.BlockSpec((1, 1, block_n),
                             lambda i, j, kb, E: (E[i], 0, j)),
            ],
            out_specs=pl.BlockSpec((128, block_n),
                                   lambda i, j, kb, E: (i, j)),
            scratch_shapes=[pltpu.VMEM((128, block_n), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), x_sorted.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(expert_per_tile, x_sorted.astype(jnp.bfloat16), qweight, scales)
    return out
