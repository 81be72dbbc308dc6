"""Pallas TPU paged-attention decode kernel (page-major KV layout).

TPU-native replacement for the reference's PagedAttention V1/V2 CUDA
kernels (csrc/attention/attention_kernels.cu:427-604).  Design notes:

* KV pages are PAGE-MAJOR with a HEAD-MAJOR interior:
  ``[num_pages, num_kv_heads, page_size, head_dim]`` (stacked models
  prepend a layer axis).  One page is one CONTIGUOUS block of
  kvh*page_size*hd elements, so the kernel issues ONE DMA per page
  covering every head (a fully head-major cache needed kvh separate 4 KB
  DMAs per page and ran 25x off the bandwidth roofline); the head-major
  interior lands in VMEM as [kvh, tokens, hd] directly, so the batched
  dot_generals need NO per-chunk relayout (a token-major page interior
  spent ~6 us/grid-cell relayouting 2 MB chunks — measured 40% slower).
* Grid is ``(batch, num_page_chunks)``; page indices, context lengths and
  the (optional) layer index are scalar-prefetched; chunks are
  double-buffered so page DMAs overlap compute.
* Online-softmax (flash) accumulation across chunks; all heads of a
  sequence are processed in one grid cell via a batched dot_general.
* GQA: q is viewed [batch, kvh, group, hd]; scores are [kvh, group,
  chunk_tokens] per cell.
* A stacked cache ``[L, P, KVH, PS, HD]`` with ``layer_index`` lets
  lax.scan models attend without slicing (= copying) a layer's cache.
* fp8/int8 KV caches dequantize in-kernel via ``kv_scale``.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# KV chunk VMEM slots: DMA lookahead depth is NUM_SLOTS - 1 (the global
# grid pipeline keeps that many chunk transfers in flight).  Tunable for
# A/B runs via VST_KV_SLOTS; deeper lookahead trades VMEM for issue-rate
# cover at small-chunk decode shapes.
import os as _os

NUM_SLOTS = int(_os.environ.get("VST_KV_SLOTS", "3"))

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _paged_attention_kernel(
    # scalar-prefetch
    block_tables_ref,  # [B * pages_per_seq] int32
    context_lens_ref,  # [B] int32
    layer_ref,         # [1] int32
    # inputs
    *rest,             # [slots (prefetch, write_kv)], q,
                       # k_pages_hbm, v_pages_hbm (or one fused kv_pages),
                       # [scales...], [slopes], [k_new, v_new],
                       # out_ref(s), scratch...
    pages_per_seq: int,
    pages_per_chunk: int,
    page_size: int,
    num_kv_heads: int,
    group: int,
    scale: float,
    kv_scale: float,
    has_alibi: bool = False,
    stacked: bool = False,
    int8_kv: bool = False,
    int4_kv: bool = False,
    fused_kv: bool = False,
    q_len: int = 1,
    write_kv: bool = False,
):
    if write_kv:
        # Fused write+attend (decode): the fresh token's K/V row merges
        # into the VMEM chunk before scoring and the touched page writes
        # back to the ALIASED cache output — replacing the separate
        # page read-modify-write kernels (their page re-read was ~6% of
        # a 7B decode step).
        slots_ref = rest[0]  # [B] int32 (scalar prefetch), -1 = pad row
        rest = rest[1:]
    else:
        slots_ref = None
    q_ref = rest[0]        # [1, kvh, group_padded, head_dim] VMEM block
    rest = rest[1:]
    if fused_kv:
        # Interleaved fused layout: ONE page array [(L,) 2P, KVH, PS, HD]
        # where logical block b stores its K half at page 2b and its V
        # half at page 2b+1 — one DMA per logical page moves both halves
        # (the split layout issues two).
        kv_pages_hbm = rest[0]
        k_pages_hbm = v_pages_hbm = None
        rest = rest[1:]
    else:
        k_pages_hbm, v_pages_hbm = rest[0], rest[1]
        rest = rest[2:]
    if int4_kv:
        # W8A4 path: token-pair nibble-packed pages ([kvh, ps/2, hd]
        # int8, token 2r in the low nibble).  Per-token scales arrive as
        # normal pipelined VMEM blocks ([1, 1, kvh, chunk_tokens],
        # already gathered + lane-permuted to [evens | odds] in XLA) —
        # no manual scale DMAs, no sub-128-lane HBM slices.
        ks_ref = rest[0]   # [1, 1, kvh, chunk_tokens] bf16 block
        vs_ref = rest[1]
        rest = rest[2:]
    else:
        ks_ref = vs_ref = None
    if int8_kv or int4_kv:
        # q arrives pre-quantized (int8) with per-(kvh, gp) scales
        # broadcast across the lane dim.
        qscale_ref = rest[0]   # [1, kvh, group_padded, 128] f32
        rest = rest[1:]
    else:
        qscale_ref = None
    if has_alibi:
        slopes_ref = rest[0]   # [kvh, group_padded] f32
        rest = rest[1:]
    else:
        slopes_ref = None
    k_new_ref = v_new_ref = None
    kv_out_hbm = k_out_hbm = v_out_hbm = wb_sems = None
    if write_kv:
        k_new_ref, v_new_ref = rest[0], rest[1]  # [1, kvh, hd] blocks
        rest = rest[2:]
    if fused_kv:
        if write_kv:
            (out_ref, kv_out_hbm, kv_vmem, sems, wb_sems, m_ref, l_ref,
             acc_ref) = rest
        else:
            (out_ref,      # [1, kvh, group_padded, head_dim]
             kv_vmem,      # [NS, 2, kvh, chunk_tokens(//2 int4), head_dim]
             sems,         # DMA sems [NS]
             m_ref,        # [kvh, group_padded, 128] f32
             l_ref,
             acc_ref) = rest
        k_vmem = v_vmem = None
    else:
        if write_kv:
            (out_ref, k_out_hbm, v_out_hbm, k_vmem, v_vmem, sems, wb_sems,
             m_ref, l_ref, acc_ref) = rest
        else:
            (out_ref,      # [1, kvh, group_padded, head_dim]
             k_vmem,       # [NS, kvh, chunk_tokens(//2 if int4), head_dim]
             v_vmem,
             sems,         # DMA sems [NS, 2]
             m_ref,        # [kvh, group_padded, 128] f32
             l_ref,
             acc_ref) = rest  # [kvh, group_padded, head_dim] f32
        kv_vmem = None
    layer = layer_ref[0]

    b = pl.program_id(0)
    i = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    chunk_tokens = pages_per_chunk * page_size
    ctx_len = context_lens_ref[b]
    group_padded = acc_ref.shape[1]

    def chunk_needed(chunk):
        return chunk * chunk_tokens < ctx_len

    def make_dmas(bb, chunk, slot):
        """ONE DMA per page: the contiguous [kvh, ps, hd] page lands in
        the [kvh, chunk_tokens, hd] VMEM buffer as a strided
        rectangular copy — no in-kernel relayout needed.

        Returns (needed, dma) pairs: pages past the sequence's context
        are SKIPPED entirely (their score lanes are masked anyway, so
        stale VMEM there is harmless).  The predicate depends only on
        context_lens, so the start and wait sides always agree.
        """
        dmas = []
        rows_per_page = page_size // 2 if int4_kv else page_size
        ctx_bb = context_lens_ref[bb]
        # Uninitialized VMEM behind a skipped FLOAT V page could hold
        # NaN/Inf, and 0 * NaN poisons the pv dot even at zero
        # probability; int caches are always finite, and garbage K is
        # neutralized by the score mask's where().
        v_needs_zero = (kv_vmem.dtype if fused_kv else
                        v_vmem.dtype) != jnp.int8
        for p in range(pages_per_chunk):  # static unroll
            logical = chunk * pages_per_chunk + p
            needed = logical * page_size < ctx_bb
            page_idx = block_tables_ref[bb * pages_per_seq + logical]
            dst = pl.ds(p * rows_per_page, rows_per_page)
            if fused_kv:
                # K half (page 2b) and V half (page 2b+1) in one copy.
                two = pl.ds(2 * page_idx, 2)
                src = (kv_pages_hbm.at[layer, two] if stacked
                       else kv_pages_hbm.at[two])
                zero = (slot, 1, slice(None), dst) if v_needs_zero \
                    else None
                dmas.append((needed, pltpu.make_async_copy(
                    src, kv_vmem.at[slot, :, :, dst], sems.at[slot]),
                    kv_vmem, zero))
                continue
            if stacked:
                k_src = k_pages_hbm.at[layer, page_idx]
                v_src = v_pages_hbm.at[layer, page_idx]
            else:
                k_src = k_pages_hbm.at[page_idx]
                v_src = v_pages_hbm.at[page_idx]
            dmas.append((needed, pltpu.make_async_copy(
                k_src, k_vmem.at[slot, :, dst], sems.at[slot, 0]),
                None, None))
            zero = (slot, slice(None), dst) if v_needs_zero else None
            dmas.append((needed, pltpu.make_async_copy(
                v_src, v_vmem.at[slot, :, dst], sems.at[slot, 1]),
                v_vmem, zero))
        return dmas

    def start_chunk(bb, chunk, slot):
        for needed, dma, _, _ in make_dmas(bb, chunk, slot):
            @pl.when(needed)
            def _():
                dma.start()

    def wait_chunk(bb, chunk, slot):
        for needed, dma, zref, zidx in make_dmas(bb, chunk, slot):
            @pl.when(needed)
            def _():
                dma.wait()
            if zidx is not None:
                @pl.when(jnp.logical_not(needed))
                def _():
                    zref[zidx] = jnp.zeros_like(zref[zidx])

    # GLOBAL pipeline over the whole (batch, chunks) grid: DMA lookahead
    # runs ACROSS sequence boundaries (the next sequence's first chunks
    # prefetch while this one finishes), killing the per-sequence
    # pipeline bubble the old per-row double buffer paid at every i==0.
    num_b = pl.num_programs(0)
    total = num_b * num_chunks
    g = b * num_chunks + i
    slot = jax.lax.rem(g, NUM_SLOTS)

    def start_at(gidx):
        bb = gidx // num_chunks
        cc = jax.lax.rem(gidx, num_chunks)
        @pl.when(cc * chunk_tokens < context_lens_ref[bb])
        def _():
            start_chunk(bb, cc, jax.lax.rem(gidx, NUM_SLOTS))

    @pl.when(g == 0)
    def _():
        for la in range(min(NUM_SLOTS - 1, total)):  # static unroll
            start_at(jnp.int32(la))

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(g + (NUM_SLOTS - 1) < total)
    def _():
        start_at(g + (NUM_SLOTS - 1))

    @pl.when(chunk_needed(i))
    def _():
        wait_chunk(b, i, slot)

        if write_kv:
            # Merge the fresh token's K/V row into this chunk's VMEM
            # copy (the HBM page is one step stale), then write the
            # touched page back to the aliased cache output.  Correct
            # because each decode sequence owns its pages exclusively
            # (block-manager invariant), so no other grid cell reads the
            # page being rewritten.  The new token always sits at
            # sequence position ctx-1 (decode semantics); slots_ref only
            # flags pad rows (-1 = skip).
            tok_slot = slots_ref[b]
            lpos = jnp.maximum(ctx_len - 1, 0)
            tok_page = lpos // page_size         # logical page in seq
            off = lpos - tok_page * page_size
            tok_chunk = tok_page // pages_per_chunk
            p_in_chunk = tok_page - tok_chunk * pages_per_chunk
            row = p_in_chunk * page_size + off

            is_merge = jnp.logical_and(tok_slot >= 0, i == tok_chunk)

            # Mosaic can't address a dynamic sublane offset (store or
            # DMA), so the page position unrolls statically (exactly one
            # branch fires): merge the fresh row into that page's VMEM
            # region via a row-iota select (a 128 KB rewrite), then DMA
            # the page back to the aliased cache output.
            for p in range(pages_per_chunk):
                @pl.when(jnp.logical_and(is_merge, p_in_chunk == p))
                def _(p=p):
                    page_idx = block_tables_ref[b * pages_per_seq +
                                                tok_page]
                    ps_ds = pl.ds(p * page_size, page_size)
                    page_row = row - p * page_size

                    def merge(buf_ref, new_ref):
                        cur = buf_ref[...]      # [kvh, page_size, hd]
                        rows = jax.lax.broadcasted_iota(
                            jnp.int32, cur.shape, 1)
                        buf_ref[...] = jnp.where(rows == page_row,
                                                 new_ref[0][:, None, :],
                                                 cur)

                    if fused_kv:
                        merge(kv_vmem.at[slot, 0, :, ps_ds, :], k_new_ref)
                        merge(kv_vmem.at[slot, 1, :, ps_ds, :], v_new_ref)
                    else:
                        merge(k_vmem.at[slot, :, ps_ds, :], k_new_ref)
                        merge(v_vmem.at[slot, :, ps_ds, :], v_new_ref)
                    if fused_kv:
                        dst = (kv_out_hbm.at[layer, pl.ds(2 * page_idx, 2)]
                               if stacked else
                               kv_out_hbm.at[pl.ds(2 * page_idx, 2)])
                        wb = pltpu.make_async_copy(
                            kv_vmem.at[slot, :, :, ps_ds, :], dst,
                            wb_sems.at[0])
                        wb.start()
                        wb.wait()
                    else:
                        kdst = (k_out_hbm.at[layer, page_idx] if stacked
                                else k_out_hbm.at[page_idx])
                        vdst = (v_out_hbm.at[layer, page_idx] if stacked
                                else v_out_hbm.at[page_idx])
                        wb_k = pltpu.make_async_copy(
                            k_vmem.at[slot, :, ps_ds, :], kdst,
                            wb_sems.at[0])
                        wb_v = pltpu.make_async_copy(
                            v_vmem.at[slot, :, ps_ds, :], vdst,
                            wb_sems.at[1])
                        wb_k.start()
                        wb_v.start()
                        wb_k.wait()
                        wb_v.wait()

        # Feed the MXU bf16 operands with f32 ACCUMULATION — explicit
        # f32 casts of the 2 MB K/V chunks are pure VPU overhead.
        q = q_ref[0]                          # [kvh, gp, hd] bf16/int8
        k = kv_vmem[slot, 0] if fused_kv else k_vmem[slot]
        #                                     # [kvh, tok(//2), hd]
        if int4_kv:
            # W8A4 without unpacking: the biased-low packing makes the
            # signed byte EXACTLY 16*x_odd + (x_even + 8), so two int8
            # MXU dots — raw bytes and (bytes & 0xF), the only int8
            # vector bit-op Mosaic legalizes — recover both token
            # nibbles algebraically.  Scores concatenate along the
            # (small) lane dim in [evens | odds] order, matching the
            # pre-permuted per-token scale blocks.
            bm = jnp.bitwise_and(k, jnp.int8(0xF))
            dn = (((2, ), (2, )), ((0, ), (0, )))
            a = jax.lax.dot_general(q, k, dimension_numbers=dn,
                                    preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
            bq = jax.lax.dot_general(q, bm, dimension_numbers=dn,
                                     preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
            qsum = jnp.sum(q.astype(jnp.int32), axis=-1, keepdims=True)
            s_even = bq - 8 * qsum            # [kvh, gp, tok/2]
            s_odd = jax.lax.shift_right_arithmetic(a - bq, 4)  # exact /16
            s_int = jnp.concatenate([s_even, s_odd], axis=-1)
            qs = qscale_ref[0, :, :, 0:1]     # [kvh, gp, 1]
            ks = ks_ref[0, 0].astype(jnp.float32)     # [kvh, tok]
            s = (s_int.astype(jnp.float32) * (qs * scale)) * ks[:, None, :]
        elif int8_kv:
            # int8 x int8 -> int32 on the MXU; the 2 MB K chunk never
            # touches the VPU.  s = (qq . k_int) * qs * kv_scale * scale.
            s_int = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2, ), (2, )), ((0, ), (0, ))),
                preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
            qs = qscale_ref[0, :, :, 0:1]     # [kvh, gp, 1]
            s = s_int.astype(jnp.float32) * (qs * (kv_scale * scale))
        else:
            if k.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
                k = (k.astype(jnp.float32) * kv_scale).astype(q.dtype)
            s = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((2, ), (2, )), ((0, ), (0, ))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale

        lane = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        if int4_kv:
            # Lane order is [even tokens | odd tokens] of the chunk.
            half = chunk_tokens // 2
            local = jnp.where(lane < half, 2 * lane,
                              2 * (lane - half) + 1)
        else:
            local = lane
        token_pos = i * chunk_tokens + local
        if q_len == 1:
            allowed = ctx_len
        else:
            # Multi-query (speculative verify): row r is query qi = r //
            # group of the window; it may attend tokens
            # 0 .. ctx_len - q_len + qi (causal within the window).
            row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            qi = jnp.minimum(row // group, q_len - 1)  # clip padded rows
            allowed = ctx_len - q_len + 1 + qi
        if slopes_ref is not None:
            dist = (token_pos - (allowed - 1)).astype(jnp.float32)
            s = s + slopes_ref[...][:, :, None] * dist
        s = jnp.where(token_pos < allowed, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, :, 0:1]            # [kvh, gp, 1]
        l_prev = l_ref[:, :, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)               # [kvh, gp, tok]
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        v = kv_vmem[slot, 1] if fused_kv else v_vmem[slot]
        #                                     # [kvh, tok(//2), hd]
        if int4_kv:
            # Fold per-token V scales into the probs (both already in
            # [evens | odds] lane order), re-quantize the small probs
            # tile to int8, then separate the token nibbles with the
            # same masked-dot identity: even tokens from the masked
            # bytes, odd tokens from (raw - masked) / 16.
            vs = vs_ref[0, 0].astype(jnp.float32)     # [kvh, tok]
            p_s = p * vs[:, None, :]
            m_p = jnp.maximum(jnp.max(p_s, axis=-1, keepdims=True),
                              1e-20)                  # [kvh, gp, 1]
            pq = jnp.round(p_s * (127.0 / m_p)).astype(jnp.int8)
            half = chunk_tokens // 2
            pe = pq[:, :, :half]
            po = pq[:, :, half:]
            bm = jnp.bitwise_and(v, jnp.int8(0xF))
            dn = (((2, ), (1, )), ((0, ), (0, )))
            b1 = jax.lax.dot_general(pe, bm, dimension_numbers=dn,
                                     preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
            a2 = jax.lax.dot_general(po, v, dimension_numbers=dn,
                                     preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
            b2 = jax.lax.dot_general(po, bm, dimension_numbers=dn,
                                     preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
            pesum = jnp.sum(pe.astype(jnp.int32), axis=-1, keepdims=True)
            pv_int = (b1 - 8 * pesum +
                      jax.lax.shift_right_arithmetic(a2 - b2, 4))
            pv = pv_int.astype(jnp.float32) * (m_p / 127.0)
        elif int8_kv:
            # p in (0, 1] (row max is exactly 1 after the online-softmax
            # shift), so a fixed 127 scale loses < 0.4% of the max prob;
            # int8 x int8 -> int32 keeps the V chunk off the VPU too.
            pq = jnp.round(p * 127.0).astype(jnp.int8)
            pv_int = jax.lax.dot_general(
                pq, v,
                dimension_numbers=(((2, ), (1, )), ((0, ), (0, ))),
                preferred_element_type=jnp.int32,
        precision=jax.lax.Precision.DEFAULT)
            pv = pv_int.astype(jnp.float32) * (kv_scale / 127.0)
        else:
            if v.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
                v = (v.astype(jnp.float32) * kv_scale).astype(q.dtype)
            # [kvh, gp, tok] x [kvh, tok, hd] -> [kvh, gp, hd]; cast the
            # SMALL probs tile to bf16 rather than the 2 MB V chunk to
            # f32.
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v,
                dimension_numbers=(((2, ), (1, )), ((0, ), (0, ))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )

        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == num_chunks - 1)
    def _():
        l = l_ref[:, :, 0:1]
        out = acc_ref[...] / jnp.maximum(l, 1e-20)
        out_ref[0] = out.astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.jit,
    static_argnames=("pages_per_chunk", "scale", "kv_scale", "interpret"))
def paged_attention(
    q: jax.Array,             # [B, num_q_heads, head_dim]
    k_pages: jax.Array,       # [(L,) num_pages, kvh, page_size, head_dim]
    v_pages: Optional[jax.Array],  # None => k_pages is a FUSED cache
    block_tables: jax.Array,  # [B, pages_per_seq] int32
    context_lens: jax.Array,  # [B] int32
    *,
    pages_per_chunk: int = 8,
    scale: Optional[float] = None,
    kv_scale: float = 1.0,
    alibi_slopes: Optional[jax.Array] = None,  # [num_q_heads] f32
    layer_index: Optional[jax.Array] = None,   # scalar i32 (stacked cache)
    new_kv=None,  # (k_new [B, kvh, hd], v_new, slot_mapping [B] i32)
    interpret: bool = False,
) -> jax.Array:
    """Flash-style decode attention over a page-major paged KV cache.

    FUSED WRITE+ATTEND: ``new_kv = (k_new, v_new, slot_mapping)`` (rows
    already quantized to the cache dtype; slot -1 = pad row) makes the
    kernel merge each sequence's fresh K/V row into its VMEM chunk
    before scoring and write the touched page back to the cache via
    input/output aliasing — replacing the separate page
    read-modify-write kernels.  Returns ``(out, new_cache)`` where
    new_cache is ``(k_pages, v_pages)`` (or ``(kv_pages, None)`` for the
    fused layout).  Decode-only (q_len == 1, not int4).

    Returns [B, num_q_heads, head_dim] in q's dtype.  ``block_tables``
    entries past a sequence's context length may be garbage but must be
    < num_pages (0-pad).  A stacked cache [L, P, PS, KVH, HD] with
    ``layer_index`` serves lax.scan models without slice copies.

    MULTI-QUERY (speculative-decode verify): a 4D ``q`` of shape
    [B, q_len, H, head_dim] scores q_len window tokens per sequence in
    one pass; ``context_lens`` must then INCLUDE the window (query qi
    attends tokens 0 .. ctx - q_len + qi, causal within the window) and
    the window tokens' K/V must already be written to the cache.
    Returns [B, q_len, H, head_dim].

    FUSED layout: ``v_pages=None`` means ``k_pages`` is an INTERLEAVED
    fused cache [(L,) 2*num_pages, kvh, ps, hd] where logical block b
    holds K at page 2b and V at page 2b+1; the kernel then issues one
    DMA per logical page instead of two (see worker/cache_engine.py).
    """
    from vllm_splitwise_tpu.ops.kv_cache import QuantPages
    fused_kv = v_pages is None
    int4_kv = isinstance(k_pages, QuantPages)
    multiquery = q.ndim == 4
    if multiquery:
        batch, q_len, num_q_heads, head_dim = q.shape
    else:
        batch, num_q_heads, head_dim = q.shape
        q_len = 1
    stacked = k_pages.ndim == 5
    k_data = k_pages.data if int4_kv else k_pages
    v_data = None if fused_kv else (v_pages.data if int4_kv else v_pages)
    if stacked:
        assert layer_index is not None
        _, num_pages, num_kv_heads, page_size, head_dim_k = k_data.shape
    else:
        num_pages, num_kv_heads, page_size, head_dim_k = k_data.shape
    if fused_kv:
        num_pages //= 2   # physical pages interleave K/V halves
    if int4_kv:
        page_size *= 2    # data rows pack token pairs
    assert head_dim == head_dim_k
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    pages_per_seq = block_tables.shape[1]

    if scale is None:
        scale = 1.0 / (head_dim**0.5)

    if pages_per_seq % pages_per_chunk != 0:
        pad = _round_up(pages_per_seq, pages_per_chunk) - pages_per_seq
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad)))
        pages_per_seq += pad
    num_chunks = pages_per_seq // pages_per_chunk

    # Rows of the score matrix = q_len window queries x GQA group, padded
    # to the f32 sublane tile.  Row order is (qi, g) so the kernel maps
    # row // group -> window query index.
    rows = q_len * group
    group_padded = max(_round_up(rows, 8), 8)
    if multiquery:
        q_view = q.reshape(batch, q_len, num_kv_heads, group, head_dim)
        q_view = q_view.transpose(0, 2, 1, 3, 4).reshape(
            batch, num_kv_heads, rows, head_dim)
    else:
        q_view = q.reshape(batch, num_kv_heads, rows, head_dim)
    if group_padded != rows:
        q_view = jnp.pad(q_view, ((0, 0), (0, 0),
                                  (0, group_padded - rows), (0, 0)))

    chunk_tokens = pages_per_chunk * page_size
    grid = (batch, num_chunks)

    # W8A8 attention for int8 KV caches: quantize q per (kvh, group) row
    # so both dots run native int8 on the MXU and the 2 MB K/V chunks
    # never pass through a VPU dequant (adds ~0.5% output error on top
    # of the cache quantization itself).  int4 (nibble-packed) caches
    # take the same quantized-q route.
    int8_kv = (not int4_kv) and k_data.dtype == jnp.int8
    if int8_kv or int4_kv:
        qf = q_view.astype(jnp.float32)
        qs = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0
        qs = jnp.maximum(qs, 1e-10)           # [B, kvh, gp, 1]
        q_view = jnp.clip(jnp.round(qf / qs), -127,
                          127).astype(jnp.int8)
        qscale_wide = jnp.broadcast_to(qs, (batch, num_kv_heads,
                                            group_padded, 128))

    write_kv = new_kv is not None
    if write_kv:
        assert q_len == 1 and not int4_kv, \
            "fused write+attend is decode-only and excludes int4 caches"
    has_alibi = alibi_slopes is not None
    kernel = functools.partial(
        _paged_attention_kernel,
        pages_per_seq=pages_per_seq,
        pages_per_chunk=pages_per_chunk,
        page_size=page_size,
        num_kv_heads=num_kv_heads,
        group=group,
        scale=scale,
        kv_scale=kv_scale,
        has_alibi=has_alibi,
        stacked=stacked,
        int8_kv=int8_kv,
        int4_kv=int4_kv,
        fused_kv=fused_kv,
        q_len=q_len,
        write_kv=write_kv,
    )

    in_specs = [
        pl.BlockSpec(
            (1, num_kv_heads, group_padded, head_dim),
            lambda b, i, *_: (b, 0, 0, 0),
        ),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
    ]
    if not fused_kv:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY))
    layer_arr = (jnp.asarray([layer_index], dtype=jnp.int32).reshape(1)
                 if stacked else jnp.zeros((1, ), dtype=jnp.int32))
    num_scalar_prefetch = 3
    prefix = [block_tables.reshape(-1), context_lens, layer_arr]
    if write_kv:
        num_scalar_prefetch = 4
        prefix.append(new_kv[2].astype(jnp.int32))
    inputs = prefix + [q_view, k_data] + ([] if fused_kv else [v_data])
    if int4_kv:
        # Gather the per-token scales for every scheduled page into dense
        # [B, kvh, tokens] arrays (one fused XLA gather — ~1.5% of the
        # page-data bytes) and permute each chunk's lanes to
        # [evens | odds] so they line up with the kernel's concatenated
        # half-dots.  They then flow in as ordinary pipelined blocks.
        # One-hot MXU gather: jnp.take with thousands of page indices
        # lowers to a pathological serial gather on TPU (measured ~21
        # ms/step at b32 and >10 min compiles); a [rows, P] one-hot
        # matmul fetches the same scale rows at MXU speed.
        idx = block_tables.reshape(-1)                   # [B * pps]
        onehot = (idx[:, None] == jnp.arange(
            num_pages, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)

        def dot_scales(scale_pages, width_mult):
            # One [rows, P] x [P, width] dot over LOGICAL pages; the
            # fused layout's physical pages 2b/2b+1 are adjacent, so its
            # scale array reshapes to width 2*kvh*ps and K+V rows come
            # out of the SAME dot (split-path cost, not double).
            sl = scale_pages
            if stacked:
                sl = jax.lax.dynamic_index_in_dim(
                    sl, jnp.asarray(layer_index, jnp.int32), keepdims=False)
            flat = sl.reshape(num_pages,
                              width_mult * num_kv_heads * page_size)
            return jax.lax.dot(onehot, flat.astype(jnp.bfloat16),
                               precision=jax.lax.Precision.DEFAULT)

        def lane_permute(g):
            # [B, pps, kvh, ps] -> [B, C, kvh, chunk_tokens] in per-chunk
            # [evens | odds] lane order (lines up with the kernel's
            # concatenated half-dots).  Chunk-major layout so the block's
            # trailing (kvh, chunk_tokens) dims equal the array dims —
            # Mosaic rejects sub-(8,128) partial blocks otherwise.
            g = g.transpose(0, 2, 1, 3).reshape(batch, num_kv_heads, -1)
            g = g.reshape(batch, num_kv_heads, num_chunks,
                          chunk_tokens // 2, 2)
            g = g.transpose(0, 2, 1, 4, 3)
            return g.reshape(batch, num_chunks, num_kv_heads, chunk_tokens)

        in_specs += [
            pl.BlockSpec((1, 1, num_kv_heads, chunk_tokens),
                         lambda b, i, *_: (b, i, 0, 0)),
            pl.BlockSpec((1, 1, num_kv_heads, chunk_tokens),
                         lambda b, i, *_: (b, i, 0, 0)),
        ]
        if fused_kv:
            g = dot_scales(k_pages.scale, 2).reshape(
                batch, pages_per_seq, 2, num_kv_heads, page_size)
            inputs += [lane_permute(g[:, :, 0]), lane_permute(g[:, :, 1])]
        else:
            inputs += [
                lane_permute(dot_scales(k_pages.scale, 1).reshape(
                    batch, pages_per_seq, num_kv_heads, page_size)),
                lane_permute(dot_scales(v_pages.scale, 1).reshape(
                    batch, pages_per_seq, num_kv_heads, page_size)),
            ]
    if int8_kv or int4_kv:
        in_specs.append(
            pl.BlockSpec((1, num_kv_heads, group_padded, 128),
                         lambda b, i, *_: (b, 0, 0, 0)))
        inputs.append(qscale_wide)
    if has_alibi:
        slopes2d = jnp.zeros((num_kv_heads, group_padded),
                             dtype=jnp.float32)
        tiled = jnp.tile(
            alibi_slopes.astype(jnp.float32).reshape(num_kv_heads, group),
            (1, q_len))
        slopes2d = slopes2d.at[:, :rows].set(tiled)
        in_specs.append(
            pl.BlockSpec((num_kv_heads, group_padded),
                         lambda b, i, *_: (0, 0)))
        inputs.append(slopes2d)

    out_shapes = [jax.ShapeDtypeStruct(
        (batch, num_kv_heads, group_padded, head_dim), q.dtype)]
    input_output_aliases = {}
    if write_kv:
        # Fresh rows as per-sequence VMEM blocks; the cache arrays
        # double as ALIASED outputs the kernel writes touched pages to.
        k_new, v_new = new_kv[0], new_kv[1]
        in_specs += [
            pl.BlockSpec((1, num_kv_heads, head_dim),
                         lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, num_kv_heads, head_dim),
                         lambda b, i, *_: (b, 0, 0)),
        ]
        inputs += [k_new.astype(k_data.dtype), v_new.astype(k_data.dtype)]
        k_in_idx = len(prefix) + 1
        out_shapes.append(
            jax.ShapeDtypeStruct(k_data.shape, k_data.dtype))
        input_output_aliases[k_in_idx] = 1
        if not fused_kv:
            out_shapes.append(
                jax.ShapeDtypeStruct(v_data.shape, v_data.dtype))
            input_output_aliases[k_in_idx + 1] = 2
        out_specs = [pl.BlockSpec(
            (1, num_kv_heads, group_padded, head_dim),
            lambda b, i, *_: (b, 0, 0, 0),
        )] + [pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)] * (
            len(out_shapes) - 1)
        wb_scratch = [pltpu.SemaphoreType.DMA((2, ))]
    else:
        out_specs = pl.BlockSpec(
            (1, num_kv_heads, group_padded, head_dim),
            lambda b, i, *_: (b, 0, 0, 0),
        )
        out_shapes = out_shapes[0]
        wb_scratch = []

    result = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=num_scalar_prefetch,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=([
                pltpu.VMEM((NUM_SLOTS, 2, num_kv_heads,
                            chunk_tokens // 2 if int4_kv else chunk_tokens,
                            head_dim), k_data.dtype),
                pltpu.SemaphoreType.DMA((NUM_SLOTS, )),
            ] if fused_kv else [
                pltpu.VMEM((NUM_SLOTS, num_kv_heads,
                            chunk_tokens // 2 if int4_kv else chunk_tokens,
                            head_dim), k_data.dtype),
                pltpu.VMEM((NUM_SLOTS, num_kv_heads,
                            chunk_tokens // 2 if int4_kv else chunk_tokens,
                            head_dim), v_data.dtype),
                pltpu.SemaphoreType.DMA((NUM_SLOTS, 2)),
            ]) + wb_scratch + [
                pltpu.VMEM((num_kv_heads, group_padded, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, group_padded, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, group_padded, head_dim),
                           jnp.float32),
            ],
        ),
        out_shape=out_shapes,
        input_output_aliases=input_output_aliases,
        compiler_params=pltpu.CompilerParams(
            # Sequential b traversal: the global DMA pipeline prefetches
            # the NEXT sequence's chunks, so b may not be reordered.
            dimension_semantics=("arbitrary", "arbitrary"), ),
        interpret=interpret,
    )(*inputs)

    if write_kv:
        out = result[0]
        new_cache = (result[1], None) if fused_kv else (result[1],
                                                        result[2])
    else:
        out = result
        new_cache = None

    out = out[:, :, :rows, :]
    if multiquery:
        out = out.reshape(batch, num_kv_heads, q_len, group, head_dim)
        out = out.transpose(0, 2, 1, 3, 4)
        return out.reshape(batch, q_len, num_q_heads, head_dim)
    out = out.reshape(batch, num_q_heads, head_dim)
    return (out, new_cache) if write_kv else out


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
    layer_index: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain-XLA oracle (and CPU fallback) for :func:`paged_attention`.

    Gathers every sequence's pages into a dense [B, T, ...] view — memory
    hungry but simple; used for correctness tests and non-TPU backends.
    ``v_pages=None`` deinterleaves a fused cache (see paged_attention).
    """
    from vllm_splitwise_tpu.ops.kv_cache import QuantPages, dequantize_int4
    if v_pages is None:
        def split(a):  # [(L,) 2P, ...] -> ([(L,) P, ...] K, V)
            pax = a.ndim - 4
            s = a.reshape(a.shape[:pax] + (a.shape[pax] // 2, 2) +
                          a.shape[pax + 1:])
            return (jnp.take(s, 0, axis=pax + 1),
                    jnp.take(s, 1, axis=pax + 1))
        if isinstance(k_pages, QuantPages):
            kd, vd = split(k_pages.data)
            pax = k_pages.scale.ndim - 3
            ss = k_pages.scale.reshape(
                k_pages.scale.shape[:pax] +
                (k_pages.scale.shape[pax] // 2, 2) +
                k_pages.scale.shape[pax + 1:])
            ks, vs = (jnp.take(ss, 0, axis=pax + 1),
                      jnp.take(ss, 1, axis=pax + 1))
            k_pages = QuantPages(kd, ks)
            v_pages = QuantPages(vd, vs)
        else:
            k_pages, v_pages = split(k_pages)
    if isinstance(k_pages, QuantPages):
        if k_pages.ndim == 5:
            k_pages = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, layer_index, keepdims=False), k_pages)
            v_pages = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, layer_index, keepdims=False), v_pages)
            layer_index = None
        k_pages = dequantize_int4(k_pages)
        v_pages = dequantize_int4(v_pages)
        kv_scale = 1.0
    if k_pages.ndim == 5:
        assert layer_index is not None
        k_pages = jax.lax.dynamic_index_in_dim(k_pages, layer_index,
                                               keepdims=False)
        v_pages = jax.lax.dynamic_index_in_dim(v_pages, layer_index,
                                               keepdims=False)
    if q.ndim == 4:
        # Multi-query verify: one single-query call per window position
        # with the causal context for that position.
        batch, q_len, num_q_heads, head_dim = q.shape
        outs = [
            paged_attention_reference(
                q[:, qi], k_pages, v_pages, block_tables,
                context_lens - (q_len - 1 - qi), scale=scale,
                kv_scale=kv_scale, alibi_slopes=alibi_slopes)
            for qi in range(q_len)
        ]
        return jnp.stack(outs, axis=1)
    batch, num_q_heads, head_dim = q.shape
    num_pages, num_kv_heads, page_size, _ = k_pages.shape
    group = num_q_heads // num_kv_heads
    pages_per_seq = block_tables.shape[1]
    max_len = pages_per_seq * page_size
    if scale is None:
        scale = 1.0 / (head_dim**0.5)

    # [B*pages, kvh, ps, hd] -> [B, pages, kvh, ps, hd] -> [B, kvh, T, hd]
    k = jnp.take(k_pages, block_tables.reshape(-1), axis=0, mode="clip")
    k = k.reshape(batch, pages_per_seq, num_kv_heads, page_size,
                  head_dim).transpose(0, 2, 1, 3, 4).reshape(
                      batch, num_kv_heads, max_len, head_dim)
    v = jnp.take(v_pages, block_tables.reshape(-1), axis=0, mode="clip")
    v = v.reshape(batch, pages_per_seq, num_kv_heads, page_size,
                  head_dim).transpose(0, 2, 1, 3, 4).reshape(
                      batch, num_kv_heads, max_len, head_dim)
    if k.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2, jnp.int8):
        k = k.astype(jnp.float32) * kv_scale
        v = v.astype(jnp.float32) * kv_scale

    qv = q.reshape(batch, num_kv_heads, group, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", qv, k.astype(jnp.float32)) * scale
    if alibi_slopes is not None:
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
