"""Attention facade: routes prefill/decode to the right kernel and writes
KV to the paged cache.

Role-parity with the reference's Attention facade + backends
(vllm/model_executor/layers/attention/attention.py:15, backends/
flash_attn.py): prefill -> dense causal attention (+ cache write);
decode -> Pallas paged attention (XLA-reference fallback off-TPU).

Splitwise's per-layer KV put() (the reference hooks it right here,
flash_attn.py:82-86) lives OUTSIDE this module in the TPU design: the
model runner dispatches the prefill as layer-group segments and streams
each group's freshly written pages between dispatches
(model_runner._execute_prefill_segmented, worker/kv_migration.py) —
a device-side callback inside jit would force a host sync per layer.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vllm_splitwise_tpu.models.input_metadata import (DecodeMetadata,
                                                      PrefillMetadata)
from vllm_splitwise_tpu.ops.kv_cache import (QuantPages, dequantize_int4,
                                             write_prefill_rows,
                                             write_prefill_rows_fused,
                                             write_to_kv_cache,
                                             write_to_kv_cache_stacked,
                                             write_to_kv_cache_stacked_fused)
from vllm_splitwise_tpu.ops.paged_attention import (paged_attention,
                                                    paged_attention_reference)
from vllm_splitwise_tpu.ops.prefill_attention import prefill_attention

KVCache = Tuple[jax.Array, jax.Array]


def _expand0(pages):
    """Add a leading (layer) axis to every leaf of a page pytree."""
    return jax.tree.map(lambda a: a[None], pages)


def _squeeze0(pages):
    return jax.tree.map(lambda a: a[0], pages)


def _pages_per_chunk(kv_pages=None) -> int:
    """Decode-kernel DMA batch: pages per double-buffered chunk.  Bigger
    chunks amortize per-grid-step overhead against VMEM (slots x 2
    arrays x kvh x chunk_tokens x head_dim must stay well under the
    ~16 MB scoped budget), so 1-byte KV caches (int8/fp8/int4) take 16
    pages per chunk (measured +2.8% decode tok/s at 7B b23 vs 8) while
    2-byte caches stay at 8.  Tunable for A/B runs via
    VST_PAGES_PER_CHUNK."""
    import os
    env = os.environ.get("VST_PAGES_PER_CHUNK")
    if env is not None:
        return int(env)
    if kv_pages is not None:
        leaf = kv_pages.data if isinstance(kv_pages, QuantPages) \
            else kv_pages
        if leaf.dtype.itemsize == 1:
            return 16
    return 8


def _use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def get_alibi_slopes(total_num_heads: int):
    """Standard ALiBi slope schedule (geometric in 2^(-8/n); non-power-of-
    two head counts interleave the next power's odd steps).  Matches the
    reference's _get_alibi_slopes (models/bloom.py)."""
    import math
    closest = 2**math.floor(math.log2(total_num_heads))
    base = 2**(-(2**-(math.log2(closest) - 3)))
    powers = range(1, 1 + closest)
    slopes = [base**p for p in powers]
    if closest != total_num_heads:
        extra_base = 2**(-(2**-(math.log2(2 * closest) - 3)))
        num_remaining = min(closest, total_num_heads - closest)
        extra = [extra_base**(2 * p + 1) for p in range(num_remaining)]
        slopes.extend(extra)
    import numpy as np
    return np.asarray(slopes, dtype=np.float32)


class Attention:
    """One attention layer's compute over the paged KV cache."""

    def __init__(
        self,
        num_heads: int,
        head_dim: int,
        scale: float,
        num_kv_heads: Optional[int] = None,
        sliding_window: Optional[int] = None,
        kv_scale: float = 1.0,
        alibi_slopes=None,
    ) -> None:
        self.num_heads = num_heads
        self.head_dim = head_dim
        self.scale = scale
        self.num_kv_heads = num_kv_heads or num_heads
        self.sliding_window = sliding_window
        self.kv_scale = kv_scale
        self.alibi_slopes = None if alibi_slopes is None else \
            jnp.asarray(alibi_slopes, dtype=jnp.float32)

    def __call__(
        self,
        q: jax.Array,  # prefill: [B, T, H*d]; decode: [B, 1, H*d]
        k: jax.Array,  # [..., KVH*d]
        v: jax.Array,
        kv_cache: KVCache,
        metadata,
        layer_index=None,  # traced scalar when kv_cache is stacked 5D
    ) -> Tuple[jax.Array, KVCache]:
        k_pages, v_pages = kv_cache
        if isinstance(metadata, PrefillMetadata):
            return self._prefill(q, k, v, k_pages, v_pages, metadata,
                                 layer_index)
        return self._decode(q, k, v, k_pages, v_pages, metadata,
                            layer_index)

    def _pad_heads(self, x: jax.Array, cache_heads: int) -> jax.Array:
        """Pad [tokens, layer_kv_heads, hd] to the cache's head count
        (variable-GQA models — DeciLM — allocate the cache at the max)."""
        if x.shape[1] == cache_heads:
            return x
        return jnp.pad(x, ((0, 0), (0, cache_heads - x.shape[1]), (0, 0)))

    @staticmethod
    def _cache_heads(pages: jax.Array) -> int:
        # Head-major page interior: [(L,) P, KVH, PS, HD].
        return pages.shape[-3]

    def _prefill(self, q, k, v, k_pages, v_pages,
                 md: PrefillMetadata,
                 layer_index=None) -> Tuple[jax.Array, KVCache]:
        batch, seq_len, _ = q.shape
        fused = v_pages is None  # interleaved fused layout (K@2b, V@2b+1)
        stacked = k_pages.ndim == 5
        cache_heads = self._cache_heads(k_pages)
        q = q.reshape(batch, seq_len, self.num_heads, self.head_dim)
        k = k.reshape(batch, seq_len, self.num_kv_heads, self.head_dim)
        v = v.reshape(batch, seq_len, self.num_kv_heads, self.head_dim)

        k_flat = self._pad_heads(
            k.reshape(batch * seq_len, self.num_kv_heads, self.head_dim),
            cache_heads)
        v_flat = self._pad_heads(
            v.reshape(batch * seq_len, self.num_kv_heads, self.head_dim),
            cache_heads)
        if fused:
            if stacked:
                k_pages = write_prefill_rows_fused(
                    k_flat, v_flat, k_pages, md.slot_mapping, layer_index,
                    kv_scale=self.kv_scale)
            else:
                k_pages = _squeeze0(write_prefill_rows_fused(
                    k_flat, v_flat, _expand0(k_pages), md.slot_mapping,
                    jnp.int32(0), kv_scale=self.kv_scale))
        elif stacked:
            k_pages, v_pages = write_prefill_rows(
                k_flat, v_flat, k_pages, v_pages, md.slot_mapping,
                layer_index, kv_scale=self.kv_scale)
        else:
            # Non-stacked models: route through the same page-tile
            # writer via a single-layer view.
            k5, v5 = write_prefill_rows(
                k_flat, v_flat, _expand0(k_pages), _expand0(v_pages),
                md.slot_mapping, jnp.int32(0), kv_scale=self.kv_scale)
            k_pages, v_pages = _squeeze0(k5), _squeeze0(v5)

        group = self.num_heads // self.num_kv_heads
        # VMEM bound: the multi-query kernel's q/m/l/acc buffers are each
        # ~[kvh, seq_len*group, 128] f32 — cap their combined footprint.
        mq_vmem = self.num_kv_heads * seq_len * group * max(
            self.head_dim, 128) * 4 * 4
        if (md.block_tables is not None and _use_pallas()
                and self.head_dim % 128 == 0
                and self.sliding_window is None
                and cache_heads == self.num_kv_heads
                and mq_vmem <= 8 * 2**20):
            # Prefix-cached prefill via the multi-query paged kernel
            # (the reference's prefix-prefill Triton kernel role): the
            # suffix K/V was just written to its pages, the full block
            # table covers prefix + suffix, and the per-row causal bound
            # prefix + qi + 1 is exactly ctx - q_len + 1 + qi with
            # ctx = prefix + padded-suffix (rows past a ragged suffix are
            # garbage and discarded).  Avoids the dense path's O(prefix)
            # page gather per layer.
            ctx = md.prefix_lens + seq_len
            out = paged_attention(q, k_pages, v_pages, md.block_tables,
                                  ctx, scale=self.scale,
                                  kv_scale=self.kv_scale,
                                  alibi_slopes=self.alibi_slopes,
                                  layer_index=layer_index,
                                  pages_per_chunk=_pages_per_chunk(k_pages))
            return out.reshape(batch, seq_len, -1), (k_pages, v_pages)

        prefix_kv = None
        if md.block_tables is not None:
            # Prefix caching: suffix queries must also attend over the
            # cached prefix pages (the reference's prefix-prefill Triton
            # kernel role, layers/attention/ops/prefix_prefill.py).
            pages_k = k_pages
            pages_v = v_pages
            if stacked:
                pages_k = jax.tree.map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, layer_index, keepdims=False), pages_k)
                if not fused:
                    pages_v = jax.tree.map(
                        lambda a: jax.lax.dynamic_index_in_dim(
                            a, layer_index, keepdims=False), pages_v)
            bsz, max_pages = md.block_tables.shape
            page_size = pages_k.shape[-2] * (
                2 if isinstance(pages_k, QuantPages) else 1)
            flat_bt = md.block_tables.reshape(-1)

            def to_tokens(pages, page_idx=flat_bt):
                g = jax.tree.map(
                    lambda a: jnp.take(a, page_idx, axis=0, mode="clip"),
                    pages)
                if isinstance(g, QuantPages):
                    g = dequantize_int4(g).astype(q.dtype)
                elif g.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2,
                                 jnp.int8):
                    g = (g.astype(jnp.float32) *
                         self.kv_scale).astype(q.dtype)
                g = g.reshape(bsz, max_pages, cache_heads, page_size,
                              self.head_dim)
                # [b, pages, kvh, ps, hd] -> [b, T, kvh, hd]
                g = g.transpose(0, 1, 3, 2, 4).reshape(
                    bsz, max_pages * page_size, cache_heads,
                    self.head_dim)
                return g[:, :, :self.num_kv_heads]

            if fused:
                prefix_kv = (to_tokens(pages_k, 2 * flat_bt),
                             to_tokens(pages_k, 2 * flat_bt + 1),
                             md.prefix_lens)
            else:
                prefix_kv = (to_tokens(pages_k), to_tokens(pages_v),
                             md.prefix_lens)

        if prefix_kv is None and _use_pallas() and self.head_dim % 128 == 0:
            # Flash kernel: O(T) memory instead of the dense path's
            # O(T^2) score tensor (start offsets cancel when q and k are
            # the same chunk, and non-prefix prompts start at 0 anyway).
            from vllm_splitwise_tpu.ops.flash_prefill import \
                flash_prefill_attention
            out = flash_prefill_attention(
                q, k, v, md.seq_lens,
                scale=self.scale,
                sliding_window=self.sliding_window,
                alibi_slopes=self.alibi_slopes,
            )
        else:
            out = prefill_attention(
                q, k, v, md.seq_lens,
                scale=self.scale,
                sliding_window=self.sliding_window,
                start_positions=md.start_positions,
                alibi_slopes=self.alibi_slopes,
                prefix_kv=prefix_kv,
            )
        return out.reshape(batch, seq_len, -1), (k_pages, v_pages)

    def _decode(self, q, k, v, k_pages, v_pages,
                md: DecodeMetadata,
                layer_index=None) -> Tuple[jax.Array, KVCache]:
        # q_len > 1 is the speculative-verify window: the q_len tokens'
        # K/V are written first, then every window query attends the
        # paged cache causally in one multi-query kernel pass.
        batch, q_len, _ = q.shape
        fused = v_pages is None  # interleaved fused layout (K@2b, V@2b+1)
        stacked = k_pages.ndim == 5
        cache_heads = self._cache_heads(k_pages)
        q = q.reshape(batch, q_len, self.num_heads, self.head_dim)
        k = k.reshape(batch * q_len, self.num_kv_heads, self.head_dim)
        v = v.reshape(batch * q_len, self.num_kv_heads, self.head_dim)

        import os
        # Sliding-window models are excluded: _prepare_decode clamps
        # context_lens to the window and trims block_tables while
        # slot_mapping stays absolute, and the fused kernel derives the
        # fresh token's page/offset from context_lens-1 — past the
        # window that would scatter the new K/V row to the wrong page
        # offset and permanently corrupt the cache.  The split path
        # below writes via slot_mapping and stays correct.
        if (q_len == 1 and _use_pallas() and self.head_dim % 128 == 0
                and not isinstance(k_pages, QuantPages)
                and cache_heads == self.num_kv_heads
                and self.sliding_window is None
                and os.environ.get("VST_FUSED_WRITE", "1") == "1"):
            # FUSED WRITE+ATTEND: the kernel merges the fresh K/V row
            # into the chunk in VMEM and writes the touched page back to
            # the aliased cache — no separate page read-modify-write
            # kernels on the decode hot path.
            from vllm_splitwise_tpu.ops.kv_cache import quantize_for_cache
            dt = k_pages.dtype
            k_q = quantize_for_cache(k, dt, self.kv_scale)
            v_q = quantize_for_cache(v, dt, self.kv_scale)
            out, (k_pages, v_pages) = paged_attention(
                q[:, 0], k_pages, v_pages, md.block_tables,
                md.context_lens, scale=self.scale, kv_scale=self.kv_scale,
                alibi_slopes=self.alibi_slopes, layer_index=layer_index,
                new_kv=(k_q, v_q, md.slot_mapping),
                pages_per_chunk=_pages_per_chunk(k_pages))
            return out.reshape(batch, q_len, -1), (k_pages, v_pages)

        if fused:
            assert cache_heads == self.num_kv_heads, (
                "fused KV caches require homogeneous KV heads")
            if q_len > 1:
                rows = md.slot_mapping.reshape(batch, q_len)
                if stacked:
                    k_pages = write_prefill_rows_fused(
                        k, v, k_pages, rows, layer_index,
                        kv_scale=self.kv_scale)
                else:
                    k_pages = _squeeze0(write_prefill_rows_fused(
                        k, v, _expand0(k_pages), rows, jnp.int32(0),
                        kv_scale=self.kv_scale))
            elif stacked:
                k_pages = write_to_kv_cache_stacked_fused(
                    k, v, k_pages, md.slot_mapping, layer_index,
                    kv_scale=self.kv_scale)
            else:
                k_pages = _squeeze0(write_to_kv_cache_stacked_fused(
                    k, v, _expand0(k_pages), md.slot_mapping,
                    jnp.int32(0), kv_scale=self.kv_scale))
            k_view, v_view = k_pages, None
        elif q_len > 1:
            # Window tokens occupy CONSECUTIVE positions per sequence:
            # the page-tile prefill writer handles many tokens per page
            # (the single-token decode RMW would drop collisions).
            if stacked or isinstance(k_pages, QuantPages):
                # Same homogeneity requirements as the single-token
                # paths (padded-head caches are only sliceable for plain
                # non-stacked pages below).
                assert cache_heads == self.num_kv_heads, (
                    "multi-query decode over stacked/int4 caches "
                    "requires homogeneous KV heads")
            rows = md.slot_mapping.reshape(batch, q_len)
            if stacked:
                k_pages, v_pages = write_prefill_rows(
                    self._pad_heads(k, cache_heads),
                    self._pad_heads(v, cache_heads), k_pages, v_pages,
                    rows, layer_index, kv_scale=self.kv_scale)
            else:
                k5, v5 = write_prefill_rows(
                    self._pad_heads(k, cache_heads),
                    self._pad_heads(v, cache_heads), _expand0(k_pages),
                    _expand0(v_pages), rows, jnp.int32(0),
                    kv_scale=self.kv_scale)
                k_pages, v_pages = _squeeze0(k5), _squeeze0(v5)
            k_view, v_view = k_pages, v_pages
            if not stacked and cache_heads != self.num_kv_heads and \
                    not isinstance(k_pages, QuantPages):
                k_view = k_pages[..., :self.num_kv_heads, :, :]
                v_view = v_pages[..., :self.num_kv_heads, :, :]
        elif stacked:
            k_pages, v_pages = write_to_kv_cache_stacked(
                self._pad_heads(k, cache_heads),
                self._pad_heads(v, cache_heads), k_pages, v_pages,
                md.slot_mapping, layer_index, kv_scale=self.kv_scale)
            k_view, v_view = k_pages, v_pages
            assert cache_heads == self.num_kv_heads, (
                "stacked caches require homogeneous KV heads")
        elif isinstance(k_pages, QuantPages):
            assert cache_heads == self.num_kv_heads, (
                "int4 caches require homogeneous KV heads")
            k5, v5 = write_to_kv_cache_stacked(
                self._pad_heads(k, cache_heads),
                self._pad_heads(v, cache_heads), _expand0(k_pages),
                _expand0(v_pages), md.slot_mapping, jnp.int32(0))
            k_pages, v_pages = _squeeze0(k5), _squeeze0(v5)
            k_view, v_view = k_pages, v_pages
        else:
            k_pages, v_pages = write_to_kv_cache(
                self._pad_heads(k, cache_heads),
                self._pad_heads(v, cache_heads), k_pages, v_pages,
                md.slot_mapping, kv_scale=self.kv_scale)
            k_view = k_pages[..., :self.num_kv_heads, :, :] \
                if cache_heads != self.num_kv_heads else k_pages
            v_view = v_pages[..., :self.num_kv_heads, :, :] \
                if cache_heads != self.num_kv_heads else v_pages

        # Sliding-window contexts are capped by the runner via
        # context_lens/block_tables, so the kernel needs no window logic.
        # The Pallas kernel requires a lane-aligned head_dim; odd head
        # sizes (tiny test models) take the XLA path.
        q_arg = q if q_len > 1 else q[:, 0]
        if _use_pallas() and self.head_dim % 128 == 0:
            out = paged_attention(q_arg, k_view, v_view, md.block_tables,
                                  md.context_lens, scale=self.scale,
                                  kv_scale=self.kv_scale,
                                  alibi_slopes=self.alibi_slopes,
                                  layer_index=layer_index,
                                  pages_per_chunk=_pages_per_chunk(k_pages))
        else:
            out = paged_attention_reference(q_arg, k_view, v_view,
                                            md.block_tables, md.context_lens,
                                            scale=self.scale,
                                            kv_scale=self.kv_scale,
                                            alibi_slopes=self.alibi_slopes,
                                            layer_index=layer_index)
        return out.reshape(batch, q_len, -1), (k_pages, v_pages)
