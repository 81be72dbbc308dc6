"""Rejection-sampler tests (reference pattern:
tests/samplers/test_rejection_sampler.py statistical distribution
checks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.layers.rejection_sampler import rejection_sample


def _dists(rng, b, k, v):
    d = rng.dirichlet(np.ones(v) * 0.5, size=(b, k)).astype(np.float32)
    t = rng.dirichlet(np.ones(v) * 0.5, size=(b, k + 1)).astype(np.float32)
    return d, t


def test_identical_dists_accept_everything():
    rng = np.random.RandomState(0)
    b, k, v = 16, 4, 32
    d, t = _dists(rng, b, k, v)
    t[:, :k] = d  # target == draft at speculative positions
    draft_ids = np.stack([rng.choice(v, size=k, p=d[i, 0] * 0 + d[i, j])
                          for i in range(b)
                          for j in [0]]).reshape(b, k) if False else \
        np.stack([[rng.choice(v, p=d[i, j]) for j in range(k)]
                  for i in range(b)]).astype(np.int32)
    bonus = rng.randint(0, v, size=b).astype(np.int32)
    out = rejection_sample(jax.random.PRNGKey(1), jnp.asarray(draft_ids),
                           jnp.asarray(d), jnp.asarray(t),
                           jnp.asarray(bonus))
    np.testing.assert_array_equal(np.asarray(out.num_accepted),
                                  np.full(b, k))
    got = np.asarray(out.output_token_ids)
    np.testing.assert_array_equal(got[:, :k], draft_ids)
    np.testing.assert_array_equal(got[:, k], bonus)


def test_disjoint_dists_reject_first():
    # Draft puts all mass on token 0; target on token 1: always reject at
    # position 0 and recover token 1.
    b, k, v = 8, 3, 4
    d = np.zeros((b, k, v), dtype=np.float32)
    d[:, :, 0] = 1.0
    t = np.zeros((b, k + 1, v), dtype=np.float32)
    t[:, :, 1] = 1.0
    draft_ids = np.zeros((b, k), dtype=np.int32)
    bonus = np.full(b, 3, dtype=np.int32)
    out = rejection_sample(jax.random.PRNGKey(2), jnp.asarray(draft_ids),
                           jnp.asarray(d), jnp.asarray(t),
                           jnp.asarray(bonus))
    np.testing.assert_array_equal(np.asarray(out.num_accepted),
                                  np.zeros(b))
    got = np.asarray(out.output_token_ids)
    np.testing.assert_array_equal(got[:, 0], np.full(b, 1))
    assert (got[:, 1:] == -1).all()


def test_output_distribution_matches_target():
    """The emitted first-token distribution must equal the target's
    (speculative decoding's lossless property), regardless of the
    draft."""
    rng = np.random.RandomState(3)
    v, n = 8, 30000
    d_row = rng.dirichlet(np.ones(v)).astype(np.float32)
    t_row = rng.dirichlet(np.ones(v)).astype(np.float32)
    d = np.broadcast_to(d_row, (n, 1, v)).copy()
    t = np.broadcast_to(t_row, (n, 2, v)).copy()
    draft_ids = rng.choice(v, size=(n, 1), p=d_row).astype(np.int32)
    bonus = np.zeros(n, dtype=np.int32)
    out = rejection_sample(jax.random.PRNGKey(4), jnp.asarray(draft_ids),
                           jnp.asarray(d), jnp.asarray(t),
                           jnp.asarray(bonus))
    first = np.asarray(out.output_token_ids)[:, 0]
    emp = np.bincount(first, minlength=v) / n
    np.testing.assert_allclose(emp, t_row, atol=0.015)


