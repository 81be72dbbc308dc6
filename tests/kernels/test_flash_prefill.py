"""Flash prefill kernel vs the dense XLA oracle (reference role:
flash_attn_func prefill; the dense path materializes O(T^2) scores, the
kernel streams K/V blocks with online softmax)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.flash_prefill import flash_prefill_attention
from vllm_splitwise_tpu.ops.prefill_attention import prefill_attention


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def make(seed, batch, t, num_q_heads, num_kv_heads, head_dim):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(batch, t, num_q_heads, head_dim),
                    jnp.float32)
    k = jnp.asarray(rng.randn(batch, t, num_kv_heads, head_dim),
                    jnp.float32)
    v = jnp.asarray(rng.randn(batch, t, num_kv_heads, head_dim),
                    jnp.float32)
    lens = jnp.asarray(rng.randint(1, t + 1, size=(batch, )), jnp.int32)
    return q, k, v, lens


@pytest.mark.parametrize("num_q_heads,num_kv_heads", [(4, 4), (8, 2)])
@pytest.mark.parametrize("t", [128, 384])
def test_flash_prefill_matches_dense(num_q_heads, num_kv_heads, t):
    q, k, v, lens = make(0, 2, t, num_q_heads, num_kv_heads, 128)
    ref = prefill_attention(q, k, v, lens)
    out = flash_prefill_attention(q, k, v, lens,
                                  interpret=not _on_tpu())
    # Compare only valid rows (padding rows are garbage in both).
    for b in range(q.shape[0]):
        n = int(lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :n]),
                                   np.asarray(ref[b, :n]), atol=2e-2,
                                   rtol=2e-2)


def test_flash_prefill_unpadded_length():
    """T not a multiple of the block size exercises the padding path."""
    q, k, v, _ = make(1, 2, 200, 4, 4, 128)
    lens = jnp.asarray([200, 130], jnp.int32)
    ref = prefill_attention(q, k, v, lens)
    out = flash_prefill_attention(q, k, v, lens,
                                  interpret=not _on_tpu())
    for b in range(2):
        n = int(lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :n]),
                                   np.asarray(ref[b, :n]), atol=2e-2,
                                   rtol=2e-2)


def test_flash_prefill_sliding_window():
    q, k, v, lens = make(2, 2, 256, 4, 4, 128)
    ref = prefill_attention(q, k, v, lens, sliding_window=64)
    out = flash_prefill_attention(q, k, v, lens, sliding_window=64,
                                  interpret=not _on_tpu())
    for b in range(2):
        n = int(lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :n]),
                                   np.asarray(ref[b, :n]), atol=2e-2,
                                   rtol=2e-2)


def test_flash_prefill_alibi():
    rng = np.random.RandomState(3)
    q, k, v, lens = make(3, 2, 256, 8, 2, 128)
    slopes = jnp.asarray(rng.rand(8).astype(np.float32) * 0.5)
    ref = prefill_attention(q, k, v, lens, alibi_slopes=slopes)
    out = flash_prefill_attention(q, k, v, lens, alibi_slopes=slopes,
                                  interpret=not _on_tpu())
    for b in range(2):
        n = int(lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :n]),
                                   np.asarray(ref[b, :n]), atol=2e-2,
                                   rtol=2e-2)
