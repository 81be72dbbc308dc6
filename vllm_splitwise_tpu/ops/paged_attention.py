"""Pallas TPU paged-attention decode kernel.

TPU-native replacement for the reference's PagedAttention V1/V2 CUDA
kernels (csrc/attention/attention_kernels.cu:427-604).  Design differences
are deliberate:

* KV pages live in HBM with layout ``[num_kv_heads, num_pages, page_size,
  head_dim]`` — head-major so one (page, head) slice is a contiguous
  ``(page_size, head_dim)`` tile; with page_size=16, head_dim=128 and bf16
  that is exactly one TPU tile.
* The grid is ``(batch, num_kv_heads, num_page_chunks)``; page indices and
  context lengths are scalar-prefetched so the kernel can issue page DMAs
  before compute, double-buffered across chunks to overlap HBM reads with
  the MXU (this kernel is HBM-bandwidth-bound: the roofline is
  bytes-of-KV-read / HBM bandwidth).
* Online-softmax (flash) accumulation across chunks replaces the
  reference's V2 two-pass partitioned reduction: TPU grid steps over the
  chunk dimension run sequentially per (batch, head), so running max/sum
  accumulators live in VMEM scratch — no second reduction pass is needed.
* GQA is handled by blocking queries per KV head: q is viewed as
  ``[batch, num_kv_heads, group, head_dim]`` and each grid cell computes a
  ``(group, chunk_tokens)`` score tile.
* fp8/int8 KV caches dequantize in-kernel (scale applied after the load),
  doubling effective cache capacity and halving the bandwidth bound.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _paged_attention_kernel(
    # scalar-prefetch
    block_tables_ref,  # [B * pages_per_seq] int32
    context_lens_ref,  # [B] int32
    # inputs
    q_ref,             # [1, 1, group_padded, head_dim] (VMEM block)
    k_pages_hbm,       # [num_kv_heads, num_pages, page_size, head_dim] (ANY)
    v_pages_hbm,       # same
    *rest,             # [slopes_ref if has_alibi], out_ref, scratch...
    pages_per_seq: int,
    pages_per_chunk: int,
    page_size: int,
    scale: float,
    kv_scale: float,
    has_alibi: bool = False,
):
    if has_alibi:
        slopes_ref = rest[0]   # [1, group_padded] f32
        rest = rest[1:]
    else:
        slopes_ref = None
    (out_ref,            # [1, 1, group_padded, head_dim]
     k_vmem,             # [2, chunk_tokens, head_dim]
     v_vmem,
     sems,               # DMA sems [2, 2]
     m_ref,              # [group_padded, 128] f32
     l_ref,
     acc_ref) = rest     # [group_padded, head_dim] f32
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    num_chunks = pl.num_programs(2)

    chunk_tokens = pages_per_chunk * page_size
    ctx_len = context_lens_ref[b]

    def chunk_needed(chunk):
        return chunk * chunk_tokens < ctx_len

    def make_dmas(chunk, slot):
        """One DMA per page for K and V (pages are scattered in HBM)."""
        dmas = []
        for p in range(pages_per_chunk):  # static unroll
            page_idx = block_tables_ref[b * pages_per_seq +
                                        chunk * pages_per_chunk + p]
            dst = pl.ds(p * page_size, page_size)
            dmas.append(
                pltpu.make_async_copy(k_pages_hbm.at[h, page_idx],
                                      k_vmem.at[slot, dst, :],
                                      sems.at[slot, 0]))
            dmas.append(
                pltpu.make_async_copy(v_pages_hbm.at[h, page_idx],
                                      v_vmem.at[slot, dst, :],
                                      sems.at[slot, 1]))
        return dmas

    def start_chunk(chunk, slot):
        for dma in make_dmas(chunk, slot):
            dma.start()

    def wait_chunk(chunk, slot):
        for dma in make_dmas(chunk, slot):
            dma.wait()

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    # Warm-up: the first needed chunk issues its own DMA.
    @pl.when(jnp.logical_and(i == 0, chunk_needed(0)))
    def _():
        start_chunk(0, 0)

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Prefetch the next chunk while computing this one.
    @pl.when(jnp.logical_and(i + 1 < num_chunks, chunk_needed(i + 1)))
    def _():
        start_chunk(i + 1, next_slot)

    @pl.when(chunk_needed(i))
    def _():
        wait_chunk(i, slot)

        q = q_ref[0, 0].astype(jnp.float32)  # (group, head_dim)
        k = k_vmem[slot]                     # (chunk_tokens, head_dim)
        if k.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
            k = k.astype(jnp.float32) * kv_scale
        # (group, chunk_tokens) scores on the MXU.
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1, ), (1, )), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale

        # Mask out positions past the context length.
        token_pos = i * chunk_tokens + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        if slopes_ref is not None:
            # ALiBi: bias = slope * (pos - (ctx_len-1)).
            dist = (token_pos - (ctx_len - 1)).astype(jnp.float32)
            s = s + slopes_ref[0][:, None] * dist
        s = jnp.where(token_pos < ctx_len, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, 0:1]            # (group, 1)
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)   # (group, 1)
        p = jnp.exp(s - m_new)            # (group, chunk_tokens)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        v = v_vmem[slot]
        if v.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
            v = v.astype(jnp.float32) * kv_scale
        pv = jax.lax.dot_general(
            p, v.astype(jnp.float32),
            dimension_numbers=(((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (group, head_dim)

        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == num_chunks - 1)
    def _():
        l = l_ref[:, 0:1]
        # Guard fully-masked (padding) rows against 0/0.
        out = acc_ref[...] / jnp.maximum(l, 1e-20)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("pages_per_chunk", "scale", "kv_scale", "interpret"))
def paged_attention(
    q: jax.Array,             # [B, num_q_heads, head_dim]
    k_pages: jax.Array,       # [num_kv_heads, num_pages, page_size, head_dim]
    v_pages: jax.Array,
    block_tables: jax.Array,  # [B, pages_per_seq] int32
    context_lens: jax.Array,  # [B] int32
    *,
    pages_per_chunk: int = 8,
    scale: Optional[float] = None,
    kv_scale: float = 1.0,
    alibi_slopes: Optional[jax.Array] = None,  # [num_q_heads] f32
    interpret: bool = False,
) -> jax.Array:
    """Flash-style decode attention over a paged KV cache.

    Returns [B, num_q_heads, head_dim] in q's dtype.  ``block_tables``
    entries past a sequence's context length may be garbage (they are
    never read: chunks fully past the context are skipped, and partial
    chunks are masked).  NOTE: garbage entries must still be < num_pages;
    use 0-padding.
    """
    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, num_pages, page_size, head_dim_k = k_pages.shape
    assert head_dim == head_dim_k
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    pages_per_seq = block_tables.shape[1]

    if scale is None:
        scale = 1.0 / (head_dim**0.5)

    # Pad the chunk count so it divides pages_per_seq.
    if pages_per_seq % pages_per_chunk != 0:
        pad = _round_up(pages_per_seq, pages_per_chunk) - pages_per_seq
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        pages_per_seq += pad
    num_chunks = pages_per_seq // pages_per_chunk

    # Pad the GQA group to the f32 sublane tile (8) for clean VPU shapes.
    group_padded = max(_round_up(group, 8), 8)
    q_view = q.reshape(batch, num_kv_heads, group, head_dim)
    if group_padded != group:
        q_view = jnp.pad(q_view, ((0, 0), (0, 0), (0, group_padded - group),
                                  (0, 0)))

    chunk_tokens = pages_per_chunk * page_size

    grid = (batch, num_kv_heads, num_chunks)

    has_alibi = alibi_slopes is not None
    kernel = functools.partial(
        _paged_attention_kernel,
        pages_per_seq=pages_per_seq,
        pages_per_chunk=pages_per_chunk,
        page_size=page_size,
        scale=scale,
        kv_scale=kv_scale,
        has_alibi=has_alibi,
    )

    in_specs = [
        pl.BlockSpec(
            (1, 1, group_padded, head_dim),
            lambda b, h, i, *_: (b, h, 0, 0),
        ),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    inputs = [block_tables.reshape(-1), context_lens, q_view, k_pages,
              v_pages]
    if has_alibi:
        slopes2d = jnp.zeros((num_kv_heads, group_padded),
                             dtype=jnp.float32)
        slopes2d = slopes2d.at[:, :group].set(
            alibi_slopes.astype(jnp.float32).reshape(num_kv_heads, group))
        in_specs.append(
            pl.BlockSpec((1, group_padded), lambda b, h, i, *_: (h, 0)))
        inputs.append(slopes2d)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, group_padded, head_dim),
                lambda b, h, i, *_: (b, h, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_tokens, head_dim), k_pages.dtype),
                pltpu.VMEM((2, chunk_tokens, head_dim), v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((group_padded, 128), jnp.float32),
                pltpu.VMEM((group_padded, 128), jnp.float32),
                pltpu.VMEM((group_padded, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, group_padded, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"), ),
        interpret=interpret,
    )(*inputs)

    out = out[:, :, :group, :]
    return out.reshape(batch, num_q_heads, head_dim)


def paged_attention_reference(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    block_tables: jax.Array,
    context_lens: jax.Array,
    *,
    scale: Optional[float] = None,
    kv_scale: float = 1.0,
    alibi_slopes: Optional[jax.Array] = None,  # [num_q_heads] f32
) -> jax.Array:
    """Plain-XLA oracle (and CPU fallback) for :func:`paged_attention`.

    Gathers every sequence's pages into a dense [B, T, ...] view — memory
    hungry but simple; used for correctness tests and non-TPU backends.
    """
    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, _, page_size, _ = k_pages.shape
    group = num_q_heads // num_kv_heads
    pages_per_seq = block_tables.shape[1]
    max_len = pages_per_seq * page_size
    if scale is None:
        scale = 1.0 / (head_dim**0.5)

    # [kvh, B, pages, page_size, hd] -> [B, kvh, T, hd]
    k = jnp.take(k_pages, block_tables.reshape(-1), axis=1)
    k = k.reshape(num_kv_heads, batch, max_len, head_dim).swapaxes(0, 1)
    v = jnp.take(v_pages, block_tables.reshape(-1), axis=1)
    v = v.reshape(num_kv_heads, batch, max_len, head_dim).swapaxes(0, 1)
    if k.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
        k = k.astype(jnp.float32) * kv_scale
        v = v.astype(jnp.float32) * kv_scale

    qv = q.reshape(batch, num_kv_heads, group, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", qv, k.astype(jnp.float32)) * scale
    if alibi_slopes is not None:
        # Decode query sits at position ctx_len-1; bias = slope * (pos -
        # (ctx_len-1)).
        slopes = alibi_slopes.astype(jnp.float32).reshape(
            num_kv_heads, group)
        dist = (jnp.arange(max_len)[None, :] -
                (context_lens[:, None] - 1)).astype(jnp.float32)
        s = s + slopes[None, :, :, None] * dist[:, None, None, :]
    mask = (jnp.arange(max_len)[None, :] < context_lens[:, None])
    s = jnp.where(mask[:, None, None, :], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgt,bhtd->bhgd", p, v.astype(jnp.float32))
    return out.reshape(batch, num_q_heads, head_dim).astype(q.dtype)
