"""Multi-query paged attention (speculative-decode verify): q_len window
tokens per sequence score over the paged cache in one kernel pass, causal
within the window.  Oracle: per-position single-query reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.kv_cache import quantize_int4_pages
from vllm_splitwise_tpu.ops.paged_attention import (paged_attention,
                                                    paged_attention_reference)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def make_case(seed, batch, q_len, num_q_heads, num_kv_heads, head_dim,
              page_size, pages_per_seq, num_pages):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(batch, q_len, num_q_heads, head_dim),
                    dtype=jnp.float32)
    kp = jnp.asarray(
        rng.randn(num_pages, num_kv_heads, page_size, head_dim),
        dtype=jnp.float32)
    vp = jnp.asarray(
        rng.randn(num_pages, num_kv_heads, page_size, head_dim),
        dtype=jnp.float32)
    perm = rng.permutation(num_pages)[:batch * pages_per_seq]
    bt = jnp.asarray(perm.reshape(batch, pages_per_seq), dtype=jnp.int32)
    # context INCLUDES the q_len window tokens
    cl = jnp.asarray(
        rng.randint(q_len, pages_per_seq * page_size + 1, size=(batch, )),
        dtype=jnp.int32)
    return q, kp, vp, bt, cl


@pytest.mark.parametrize("num_q_heads,num_kv_heads", [(8, 8), (8, 2)])
@pytest.mark.parametrize("q_len", [2, 5])
def test_multiquery_matches_reference(num_q_heads, num_kv_heads, q_len):
    q, kp, vp, bt, cl = make_case(0, 4, q_len, num_q_heads, num_kv_heads,
                                  128, 16, 8, 64)
    ref = paged_attention_reference(q, kp, vp, bt, cl)
    out = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=2,
                          interpret=not _on_tpu())
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)


def test_multiquery_qlen1_equals_single():
    q, kp, vp, bt, cl = make_case(1, 3, 1, 4, 4, 128, 16, 4, 32)
    out4 = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=2,
                           interpret=not _on_tpu())
    out3 = paged_attention(q[:, 0], kp, vp, bt, cl, pages_per_chunk=2,
                           interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out4[:, 0]), np.asarray(out3),
                               atol=1e-5)


def test_multiquery_int8_cache():
    q, kp, vp, bt, cl = make_case(2, 2, 3, 4, 4, 128, 16, 4, 32)
    scale = 0.05
    kq = jnp.clip(jnp.round(kp / scale), -127, 127).astype(jnp.int8)
    vq = jnp.clip(jnp.round(vp / scale), -127, 127).astype(jnp.int8)
    ref = paged_attention_reference(q, kq, vq, bt, cl, kv_scale=scale)
    out = paged_attention(q, kq, vq, bt, cl, pages_per_chunk=2,
                          kv_scale=scale, interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.05,
                               rtol=0.05)


def test_multiquery_int4_cache():
    q, kp, vp, bt, cl = make_case(3, 2, 3, 4, 4, 128, 16, 4, 32)
    kq = quantize_int4_pages(kp)
    vq = quantize_int4_pages(vp)
    ref = paged_attention_reference(q, kq, vq, bt, cl)
    out = paged_attention(q, kq, vq, bt, cl, pages_per_chunk=2,
                          interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.06,
                               rtol=0.06)


def test_multiquery_alibi():
    rng = np.random.RandomState(4)
    q, kp, vp, bt, cl = make_case(4, 2, 3, 4, 4, 128, 16, 4, 32)
    slopes = jnp.asarray(rng.rand(4).astype(np.float32))
    ref = paged_attention_reference(q, kp, vp, bt, cl, alibi_slopes=slopes)
    out = paged_attention(q, kp, vp, bt, cl, pages_per_chunk=2,
                          alibi_slopes=slopes, interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2,
                               rtol=2e-2)
