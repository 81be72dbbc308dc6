"""Small-op oracle tests (reference pattern: tests/kernels/
test_layernorm.py, test_activation.py, test_pos_encoding.py — ours are
XLA composites, so the oracles are torch/numpy references)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vllm_splitwise_tpu.layers.activation import (gelu_and_mul, gelu_fast,
                                                  gelu_new, silu_and_mul)
from vllm_splitwise_tpu.layers.layernorm import rms_norm
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope


@pytest.mark.parametrize("shape", [(7, 64), (3, 5, 128)])
def test_rms_norm_matches_reference(shape):
    rng = np.random.RandomState(0)
    x = rng.standard_normal(shape).astype(np.float32)
    w = rng.standard_normal(shape[-1]).astype(np.float32)
    out = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    ref = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_silu_and_mul_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.standard_normal((5, 2 * 32)).astype(np.float32)
    out = np.asarray(silu_and_mul(jnp.asarray(x)))
    t = torch.tensor(x)
    ref = (F.silu(t[:, :32]) * t[:, 32:]).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_gelu_variants_match_torch():
    rng = np.random.RandomState(2)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    t = torch.tensor(x)
    np.testing.assert_allclose(
        np.asarray(gelu_new(jnp.asarray(x))),
        F.gelu(t, approximate="tanh").numpy(), rtol=2e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(gelu_fast(jnp.asarray(x))),
        F.gelu(t, approximate="tanh").numpy(), rtol=1e-2, atol=1e-3)
    half = np.concatenate([x, x], axis=-1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gelu_and_mul(jnp.asarray(half))),
        (F.gelu(t) * t).numpy(), rtol=2e-3, atol=5e-5)


@pytest.mark.parametrize("is_neox", [True, False])
def test_rope_rotation_properties(is_neox):
    """RoPE must preserve norms and make scores depend only on relative
    position: <R(p)q, R(p+d)k> equal for all p at fixed d."""
    head_dim = 64
    rope = get_rope(head_dim, rotary_dim=head_dim, max_position=128,
                    base=10000.0, is_neox_style=is_neox)
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.standard_normal((1, 1, head_dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, head_dim)), jnp.float32)

    def score(p, d):
        pos = jnp.asarray([[p]], dtype=jnp.int32)
        pos2 = jnp.asarray([[p + d]], dtype=jnp.int32)
        q_r, _ = rope(pos, q, q)
        _, k_r = rope(pos2, k, k)
        return float(jnp.sum(q_r * k_r))

    # Norm preservation.
    pos = jnp.asarray([[17]], dtype=jnp.int32)
    q_r, _ = rope(pos, q, q)
    np.testing.assert_allclose(float(jnp.linalg.norm(q_r)),
                               float(jnp.linalg.norm(q)), rtol=1e-5)
    # Relative-position invariance.
    np.testing.assert_allclose(score(3, 5), score(40, 5), rtol=1e-4,
                               atol=1e-5)
    assert abs(score(3, 5) - score(3, 9)) > 1e-6
