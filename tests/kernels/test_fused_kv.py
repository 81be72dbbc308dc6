"""Fused (interleaved) KV cache layout: logical block b stores K at
physical page 2b and V at 2b+1 so decode attention issues ONE DMA per
logical page instead of two (the split layout's per-page K+V copies are
DMA-issue-bound at decode batch sizes).

Checks: the fused write produces exactly the interleaving of the split
writes, and the fused attention kernel matches both the deinterleaving
oracle and the split kernel bit-for-bit-close."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.kv_cache import (QuantPages,
                                             quantize_int4_pages,
                                             write_to_kv_cache_stacked,
                                             write_to_kv_cache_stacked_fused)
from vllm_splitwise_tpu.ops.paged_attention import (paged_attention,
                                                    paged_attention_reference)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def interleave(k_pages, v_pages):
    """[(L,) P, ...] split K/V -> [(L,) 2P, ...] fused (K at 2b, V at
    2b+1)."""
    def ravel(k, v, page_axis):
        s = jnp.stack([k, v], axis=page_axis + 1)
        return s.reshape(s.shape[:page_axis] + (s.shape[page_axis] * 2, ) +
                         s.shape[page_axis + 2:])
    if isinstance(k_pages, QuantPages):
        return QuantPages(
            ravel(k_pages.data, v_pages.data, k_pages.data.ndim - 4),
            ravel(k_pages.scale, v_pages.scale, k_pages.scale.ndim - 3))
    return ravel(k_pages, v_pages, k_pages.ndim - 4)


def make_split(seed, num_layers, num_pages, kvh, page_size, head_dim,
               dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    shape = (num_layers, num_pages, kvh, page_size, head_dim)
    k = jnp.asarray(rng.randn(*shape), dtype=dtype)
    v = jnp.asarray(rng.randn(*shape), dtype=dtype)
    return k, v


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_fused_write_matches_split(dtype):
    L, P, kvh, ps, hd = 3, 8, 2, 16, 128
    k_all, v_all = make_split(0, L, P, kvh, ps, hd, dtype)
    kv_all = interleave(k_all, v_all)
    rng = np.random.RandomState(1)
    T = 5
    k = jnp.asarray(rng.randn(T, kvh, hd), dtype=dtype)
    v = jnp.asarray(rng.randn(T, kvh, hd), dtype=dtype)
    # One token per page (decode invariant), with one -1 pad slot.
    slots = jnp.asarray([3, 17, 35, -1, 100], dtype=jnp.int32)
    layer = jnp.int32(2)

    k_new, v_new = write_to_kv_cache_stacked(k, v, k_all, v_all, slots,
                                             layer)
    fused_new = write_to_kv_cache_stacked_fused(k, v, kv_all, slots, layer)
    np.testing.assert_array_equal(np.asarray(fused_new),
                                  np.asarray(interleave(k_new, v_new)))


def test_fused_write_matches_split_int4():
    L, P, kvh, ps, hd = 2, 8, 2, 16, 128
    kf, vf = make_split(2, L, P, kvh, ps, hd)
    k_all, v_all = quantize_int4_pages(kf), quantize_int4_pages(vf)
    kv_all = interleave(k_all, v_all)
    rng = np.random.RandomState(3)
    T = 4
    k = jnp.asarray(rng.randn(T, kvh, hd), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(T, kvh, hd), dtype=jnp.float32)
    slots = jnp.asarray([0, 21, 46, -1], dtype=jnp.int32)
    layer = jnp.int32(1)

    k_new, v_new = write_to_kv_cache_stacked(k, v, k_all, v_all, slots,
                                             layer)
    fused_new = write_to_kv_cache_stacked_fused(k, v, kv_all, slots, layer)
    want = interleave(k_new, v_new)
    np.testing.assert_array_equal(np.asarray(fused_new.data),
                                  np.asarray(want.data))
    np.testing.assert_array_equal(np.asarray(fused_new.scale),
                                  np.asarray(want.scale))


def make_attn_inputs(seed, batch, num_q_heads, kvh, head_dim, page_size,
                     num_pages, pages_per_seq, dtype):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(batch, num_q_heads, head_dim), dtype=dtype)
    kp = jnp.asarray(rng.randn(num_pages, kvh, page_size, head_dim),
                     dtype=dtype)
    vp = jnp.asarray(rng.randn(num_pages, kvh, page_size, head_dim),
                     dtype=dtype)
    perm = rng.permutation(num_pages)[:batch * pages_per_seq]
    bt = jnp.asarray(perm.reshape(batch, pages_per_seq), dtype=jnp.int32)
    cl = jnp.asarray(rng.randint(1, pages_per_seq * page_size + 1,
                                 size=(batch, )), dtype=jnp.int32)
    return q, kp, vp, bt, cl


@pytest.mark.parametrize("num_q_heads,kvh", [(8, 8), (8, 2)])
def test_fused_attention_matches_split_kernel(num_q_heads, kvh):
    batch, head_dim, page_size = 4, 128, 16
    q, kp, vp, bt, cl = make_attn_inputs(4, batch, num_q_heads, kvh,
                                         head_dim, page_size, 32, 4,
                                         jnp.float32)
    fused = interleave(kp, vp)
    ref = paged_attention_reference(q, fused, None, bt, cl)
    split_out = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=2,
                                interpret=not _on_tpu())
    fused_out = paged_attention(q, fused, None, bt, cl, pages_per_chunk=2,
                                interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(fused_out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(fused_out),
                               np.asarray(split_out), atol=1e-5, rtol=1e-5)


def test_fused_attention_stacked_multiquery():
    """Stacked (layered) fused cache through the 4D-q multi-query path."""
    batch, head_dim, page_size = 2, 128, 16
    kvh, q_heads, q_len = 2, 4, 3
    L, num_pages, pps = 2, 32, 4
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(batch, q_len, q_heads, head_dim),
                    dtype=jnp.float32)
    kp, vp = make_split(6, L, num_pages, kvh, page_size, head_dim)
    fused = interleave(kp, vp)
    perm = rng.permutation(num_pages)[:batch * pps]
    bt = jnp.asarray(perm.reshape(batch, pps), dtype=jnp.int32)
    cl = jnp.asarray([q_len + 5, pps * page_size], dtype=jnp.int32)
    for layer in range(L):
        ref = paged_attention_reference(q, kp[layer], vp[layer], bt, cl)
        out = paged_attention(q, fused, None, bt, cl, layer_index=layer,
                              pages_per_chunk=2, interpret=not _on_tpu())
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-2, rtol=2e-2)


def test_fused_attention_int4():
    """Fused interleaved int4 QuantPages through the W8A4 kernel path."""
    batch, head_dim, page_size = 4, 128, 16
    kvh, q_heads = 2, 8
    num_pages, pps = 32, 4
    q, kpf, vpf, bt, cl = make_attn_inputs(7, batch, q_heads, kvh, head_dim,
                                           page_size, num_pages, pps,
                                           jnp.float32)
    kp, vp = quantize_int4_pages(kpf), quantize_int4_pages(vpf)
    fused = interleave(kp, vp)
    ref = paged_attention_reference(q, fused, None, bt, cl)
    out = paged_attention(q, fused, None, bt, cl, pages_per_chunk=2,
                          interpret=not _on_tpu())
    split_out = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=2,
                                interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-2, rtol=6e-2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(split_out),
                               atol=1e-5, rtol=1e-5)
