"""Paged-attention kernel vs naive oracle (reference test pattern:
tests/kernels/test_attention.py — seeded, parametrized over heads/dtypes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.paged_attention import (paged_attention,
                                                    paged_attention_reference)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def make_inputs(seed, batch, num_q_heads, num_kv_heads, head_dim, page_size,
                num_pages, pages_per_seq, dtype):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(batch, num_q_heads, head_dim), dtype=dtype)
    k_pages = jnp.asarray(
        rng.randn(num_pages, num_kv_heads, page_size, head_dim), dtype=dtype)
    v_pages = jnp.asarray(
        rng.randn(num_pages, num_kv_heads, page_size, head_dim), dtype=dtype)
    # Unique random page assignment per sequence.
    perm = rng.permutation(num_pages)[:batch * pages_per_seq]
    block_tables = jnp.asarray(perm.reshape(batch, pages_per_seq),
                               dtype=jnp.int32)
    max_len = pages_per_seq * page_size
    context_lens = jnp.asarray(rng.randint(1, max_len + 1, size=(batch, )),
                               dtype=jnp.int32)
    return q, k_pages, v_pages, block_tables, context_lens


@pytest.mark.parametrize("num_q_heads,num_kv_heads", [(8, 8), (8, 2), (4, 1)])
@pytest.mark.parametrize("page_size", [16])
@pytest.mark.parametrize("pages_per_chunk", [2, 4])
def test_paged_attention_matches_reference(num_q_heads, num_kv_heads,
                                           page_size, pages_per_chunk):
    batch, head_dim = 4, 128
    pages_per_seq = 8
    num_pages = 64
    q, kp, vp, bt, cl = make_inputs(0, batch, num_q_heads, num_kv_heads,
                                    head_dim, page_size, num_pages,
                                    pages_per_seq, jnp.float32)
    ref = paged_attention_reference(q, kp, vp, bt, cl)
    out = paged_attention(q, kp, vp, bt, cl,
                          pages_per_chunk=pages_per_chunk,
                          interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_paged_attention_short_context():
    """Context shorter than one chunk: only masked portion contributes."""
    batch, head_dim = 2, 128
    q, kp, vp, bt, cl = make_inputs(1, batch, 4, 4, head_dim, 16, 32, 4,
                                    jnp.float32)
    cl = jnp.asarray([1, 3], dtype=jnp.int32)
    ref = paged_attention_reference(q, kp, vp, bt, cl)
    out = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=2,
                          interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_paged_attention_nondivisible_pages():
    """pages_per_seq not divisible by pages_per_chunk gets padded."""
    batch, head_dim = 2, 128
    q, kp, vp, bt, cl = make_inputs(2, batch, 4, 2, head_dim, 16, 32, 5,
                                    jnp.float32)
    ref = paged_attention_reference(q, kp, vp, bt, cl)
    out = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=4,
                          interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("num_q_heads,num_kv_heads", [(8, 8), (8, 2)])
def test_paged_attention_int8_kv_w8a8(num_q_heads, num_kv_heads):
    """int8 KV pages take the W8A8 kernel path (int8 q and probs through
    the MXU); output must track the dequantizing reference within
    combined quantization error."""
    batch, head_dim, page_size = 4, 128, 16
    pages_per_seq, num_pages = 8, 64
    rng = np.random.RandomState(7)
    kv_scale = 1.0 / 16.0
    q = jnp.asarray(rng.randn(batch, num_q_heads, head_dim),
                    dtype=jnp.float32)
    kf = rng.randn(num_pages, num_kv_heads, page_size, head_dim)
    vf = rng.randn(num_pages, num_kv_heads, page_size, head_dim)
    kp = jnp.asarray(np.clip(np.round(kf / kv_scale), -127, 127),
                     dtype=jnp.int8)
    vp = jnp.asarray(np.clip(np.round(vf / kv_scale), -127, 127),
                     dtype=jnp.int8)
    perm = rng.permutation(num_pages)[:batch * pages_per_seq]
    bt = jnp.asarray(perm.reshape(batch, pages_per_seq), dtype=jnp.int32)
    cl = jnp.asarray(rng.randint(1, pages_per_seq * page_size + 1,
                                 size=(batch, )), dtype=jnp.int32)

    ref = paged_attention_reference(q, kp, vp, bt, cl, kv_scale=kv_scale)
    out = paged_attention(q, kp, vp, bt, cl, kv_scale=kv_scale,
                          pages_per_chunk=2, interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=4e-2, rtol=4e-2)


def test_paged_attention_bf16():
    batch, head_dim = 2, 128
    q, kp, vp, bt, cl = make_inputs(3, batch, 8, 2, head_dim, 16, 32, 4,
                                    jnp.bfloat16)
    ref = paged_attention_reference(q, kp, vp, bt, cl)
    out = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=2,
                          interpret=not _on_tpu())
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(ref, dtype=np.float32), atol=6e-2, rtol=6e-2)
