"""Pallas flash-attention kernel for prefill (prompt phase).

TPU-native replacement for the reference's flash_attn_func prefill path
(vllm/model_executor/layers/attention/backends/flash_attn.py:88-125).
The dense XLA path (ops/prefill_attention.py) materializes the full
[B, H, T, T] f32 score tensor — 4 GB per layer at T=4096 — while this
kernel streams K/V in blocks with online softmax: O(T) memory and HBM
traffic per layer.

Design (mirrors ops/paged_attention.py's conventions):
* Grid ``(B, kvh, num_q_blocks, num_k_blocks)`` — the last dim is
  "arbitrary" so the online-softmax scratch carries across K blocks.
* GQA folds the group into the score ROWS: q is viewed
  ``[B, kvh, nqb, QB*group, d]`` with row = (q position % QB) * group +
  g; masks derive the position as ``row // group``.
* Causality: with q and k from the SAME chunk, local positions suffice
  (any absolute start offset cancels in q_pos - k_pos), so cached-prefix
  attention stays in the dense path and this kernel needs no
  start_positions at all.
* The K-block index map clamps to the causal diagonal, so the upper
  triangle re-fetches the previous block (Pallas skips the DMA when the
  block index repeats) instead of streaming unused K/V.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

_QB = 128   # q positions per block
_KB = 128   # k positions per block


def _flash_prefill_kernel(
    # scalar prefetch
    seq_lens_ref,      # [B] int32 (valid suffix lengths)
    # blocked inputs
    q_ref,             # [1, 1, 1, QB*group, d]
    k_ref,             # [1, 1, KB, d]
    v_ref,
    *rest,             # [slopes_ref if alibi], out_ref, scratch
    group: int,
    scale: float,
    sliding_window: Optional[int],
    has_alibi: bool,
):
    if has_alibi:
        slopes_ref = rest[0]   # [1, 1, rows] f32 block (slope per row)
        rest = rest[1:]
    else:
        slopes_ref = None
    out_ref, m_ref, l_ref, acc_ref = rest

    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nkb = pl.num_programs(3)
    seq_len = seq_lens_ref[b]

    @pl.when(ki == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Causal diagonal + ragged length: skip blocks with no visible keys.
    needed = jnp.logical_and(ki * _KB <= qi * _QB + _QB - 1,
                             ki * _KB < seq_len)

    @pl.when(needed)
    def _():
        q = q_ref[0, 0, 0]                    # [R, d]
        k = k_ref[0, 0]                       # [KB, d]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1, ), (1, )), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT) * scale    # [R, KB]

        rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        q_pos = qi * _QB + rows // group
        k_pos = ki * _KB + cols
        mask = jnp.logical_and(q_pos >= k_pos, k_pos < seq_len)
        if sliding_window is not None:
            mask = jnp.logical_and(mask, q_pos - k_pos < sliding_window)
        if slopes_ref is not None:
            slope = slopes_ref[0, 0][:, None]       # [rows, 1]
            s = s + slope * (k_pos - q_pos).astype(jnp.float32)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, 0:1]
        l_prev = l_ref[:, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0, 0]                       # [KB, d]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((1, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)

        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == nkb - 1)
    def _():
        l = l_ref[:, 0:1]
        out = acc_ref[...] / jnp.maximum(l, 1e-20)
        out_ref[0, 0, 0] = out.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window", "interpret"))
def flash_prefill_attention(
    q: jax.Array,          # [B, T, num_q_heads, head_dim]
    k: jax.Array,          # [B, T, num_kv_heads, head_dim]
    v: jax.Array,
    seq_lens: jax.Array,   # [B] int32
    *,
    scale: Optional[float] = None,
    sliding_window: Optional[int] = None,
    alibi_slopes: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Blocked causal self-attention over padded prompt batches.
    Semantics match ops/prefill_attention.py's dense path with
    start_positions=None and prefix_kv=None."""
    batch, q_len, num_q_heads, head_dim = q.shape
    num_kv_heads = k.shape[2]
    group = num_q_heads // num_kv_heads
    if scale is None:
        scale = 1.0 / (head_dim**0.5)

    t_pad = _round_up(q_len, max(_QB, _KB))
    if t_pad != q_len:
        pad = ((0, 0), (0, t_pad - q_len), (0, 0), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    nqb = t_pad // _QB
    nkb = t_pad // _KB
    rows = _QB * group

    # [B, T, H, d] -> [B, kvh, nqb, QB*group, d] with row = (t%QB)*g + gi
    q5 = q.reshape(batch, nqb, _QB, num_kv_heads, group, head_dim)
    q5 = q5.transpose(0, 3, 1, 2, 4, 5).reshape(batch, num_kv_heads, nqb,
                                                rows, head_dim)
    k4 = k.transpose(0, 2, 1, 3)          # [B, kvh, T, d]
    v4 = v.transpose(0, 2, 1, 3)

    kernel = functools.partial(
        _flash_prefill_kernel,
        group=group,
        scale=scale,
        sliding_window=sliding_window,
        has_alibi=alibi_slopes is not None,
    )

    in_specs = [
        pl.BlockSpec((1, 1, 1, rows, head_dim),
                     lambda b, h, qi, ki, *_: (b, h, qi, 0, 0)),
        # Clamp to the causal diagonal: upper-triangle cells revisit the
        # previous K block (no DMA) instead of fetching unused data.
        pl.BlockSpec((1, 1, _KB, head_dim),
                     lambda b, h, qi, ki, *_: (b, h, jnp.minimum(ki, qi), 0)),
        pl.BlockSpec((1, 1, _KB, head_dim),
                     lambda b, h, qi, ki, *_: (b, h, jnp.minimum(ki, qi), 0)),
    ]
    inputs = [seq_lens.astype(jnp.int32), q5, k4, v4]
    if alibi_slopes is not None:
        # One slope per score row (row = t_local*group + g): tile the
        # per-(kvh, g) slopes QB times along the row dim.
        slopes_rows = jnp.tile(
            alibi_slopes.astype(jnp.float32).reshape(num_kv_heads, 1,
                                                     group), (1, _QB, 1))
        # [kvh, 1, rows] with a (1, 1, rows) block: the trailing two
        # block dims equal the array dims (Mosaic rejects 1-row partial
        # blocks on a multi-row axis).
        in_specs.append(
            pl.BlockSpec((1, 1, rows), lambda b, h, qi, ki, *_: (h, 0, 0)))
        inputs.append(slopes_rows.reshape(num_kv_heads, 1, rows))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(batch, num_kv_heads, nqb, nkb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, 1, rows, head_dim),
                lambda b, h, qi, ki, *_: (b, h, qi, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, nqb, rows, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"), ),
        interpret=interpret,
    )(*inputs)

    out = out.reshape(batch, num_kv_heads, nqb, _QB, group, head_dim)
    out = out.transpose(0, 2, 3, 1, 4, 5).reshape(batch, t_pad,
                                                  num_q_heads, head_dim)
    return out[:, :q_len]
