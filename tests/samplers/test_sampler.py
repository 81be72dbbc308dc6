"""On-device sampler unit tests (reference pattern:
tests/samplers/test_sampler.py with fake logits)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.layers.sampler import (SamplingTensors, sample)


def make_tensors(batch, vocab, **over):
    base = dict(
        temperature=jnp.ones((batch, ), jnp.float32),
        top_p=jnp.ones((batch, ), jnp.float32),
        top_k=jnp.full((batch, ), vocab, jnp.int32),
        min_p=jnp.zeros((batch, ), jnp.float32),
        greedy_mask=jnp.zeros((batch, ), bool),
        presence_penalty=jnp.zeros((batch, ), jnp.float32),
        frequency_penalty=jnp.zeros((batch, ), jnp.float32),
        repetition_penalty=jnp.ones((batch, ), jnp.float32),
        prompt_tokens=jnp.zeros((batch, 0), jnp.int32),
        output_tokens=jnp.zeros((batch, 0), jnp.int32),
    )
    base.update(over)
    return SamplingTensors(**base)


def test_greedy_picks_argmax():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 32), dtype=jnp.float32)
    t = make_tensors(4, 32, greedy_mask=jnp.ones((4, ), bool))
    out = sample(logits, t, jnp.zeros((4, ), jnp.uint32),
                 needs_filtering=False)
    np.testing.assert_array_equal(np.asarray(out.sampled_tokens),
                                  np.argmax(np.asarray(logits), axis=-1))


def test_top_k_restricts_support():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(64, 32), dtype=jnp.float32)
    t = make_tensors(64, 32, top_k=jnp.full((64, ), 3, jnp.int32))
    out = sample(logits, t, jnp.arange(64, dtype=jnp.uint32),
                 needs_filtering=True)
    top3 = np.argsort(-np.asarray(logits), axis=-1)[:, :3]
    for i, tok in enumerate(np.asarray(out.sampled_tokens)):
        assert tok in top3[i]


def test_top_p_keeps_top1_always():
    # Extremely peaked distribution + tiny top_p: only token 7 possible.
    logits = np.full((8, 16), -10.0, dtype=np.float32)
    logits[:, 7] = 10.0
    t = make_tensors(8, 16, top_p=jnp.full((8, ), 0.01, jnp.float32))
    out = sample(jnp.asarray(logits), t, jnp.arange(8, dtype=jnp.uint32),
                 needs_filtering=True)
    assert (np.asarray(out.sampled_tokens) == 7).all()


def test_repetition_penalty_discourages_seen_tokens():
    logits = np.zeros((1, 8), dtype=np.float32)
    logits[0, 3] = 2.0   # would win greedily
    logits[0, 5] = 1.9
    t = make_tensors(
        1, 8,
        greedy_mask=jnp.ones((1, ), bool),
        repetition_penalty=jnp.full((1, ), 2.0, jnp.float32),
        output_tokens=jnp.asarray([[3]], dtype=jnp.int32),
    )
    out = sample(jnp.asarray(logits), t, jnp.zeros((1, ), jnp.uint32),
                 needs_filtering=False)
    # 3 was penalized 2.0/2 = 1.0 < 1.9 -> 5 wins.
    assert int(out.sampled_tokens[0]) == 5


def test_frequency_and_presence_penalties():
    logits = np.zeros((1, 8), dtype=np.float32)
    logits[0, 2] = 1.0
    logits[0, 6] = 0.8
    t = make_tensors(
        1, 8,
        greedy_mask=jnp.ones((1, ), bool),
        presence_penalty=jnp.full((1, ), 0.5, jnp.float32),
        frequency_penalty=jnp.full((1, ), 0.5, jnp.float32),
        output_tokens=jnp.asarray([[2, 2, -1]], dtype=jnp.int32),
    )
    out = sample(jnp.asarray(logits), t, jnp.zeros((1, ), jnp.uint32),
                 needs_filtering=False)
    # token 2: 1.0 - 0.5*2 (freq) - 0.5 (presence) = -0.5 < 0.8.
    assert int(out.sampled_tokens[0]) == 6


def test_same_seed_same_sample():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(4, 64), dtype=jnp.float32)
    t = make_tensors(4, 64)
    seeds = jnp.asarray([7, 7, 9, 9], dtype=jnp.uint32)
    out = sample(logits, t, seeds, needs_filtering=False)
    o = np.asarray(out.sampled_tokens)
    # Rows with the same seed and same logits sample identically.
    logits2 = jnp.asarray(np.tile(np.asarray(logits)[0:1], (4, 1)))
    out2 = sample(logits2, t, jnp.asarray([5, 5, 5, 5], jnp.uint32),
                  needs_filtering=False)
    o2 = np.asarray(out2.sampled_tokens)
    assert (o2 == o2[0]).all()


def test_logprobs_outputs():
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(2, 32), dtype=jnp.float32)
    t = make_tensors(2, 32, greedy_mask=jnp.ones((2, ), bool))
    out = sample(logits, t, jnp.zeros((2, ), jnp.uint32),
                 max_logprobs=8, needs_filtering=False)
    assert out.topk_logprobs.shape == (2, 8)
    ref_lp = jax.nn.log_softmax(logits, axis=-1)
    np.testing.assert_allclose(
        np.asarray(out.sampled_logprobs),
        np.asarray(ref_lp)[np.arange(2),
                           np.asarray(out.sampled_tokens)], atol=1e-5)


def test_filter_matches_direct_sort_mask_unsort():
    """The threshold-based top-k/top-p/min-p filter must equal the
    direct sort->mask->unsort construction (ties aside, which random
    f32 logits do not produce)."""
    from vllm_splitwise_tpu.layers.sampler import (_NEG_INF,
                                                   _apply_top_k_top_p_min_p)

    def direct(logits, t):
        sorted_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
        ranks = jax.lax.broadcasted_iota(jnp.int32, sorted_logits.shape, 1)
        k_mask = ranks >= t.top_k[:, None]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        p_mask = (cum - probs) >= t.top_p[:, None]
        mp_mask = probs < t.min_p[:, None] * probs[:, 0:1]
        masked = jnp.where(k_mask | p_mask | mp_mask, _NEG_INF,
                           sorted_logits)
        inv = jnp.argsort(sorted_idx, axis=-1)
        return jnp.take_along_axis(masked, inv, axis=-1)

    rng = np.random.RandomState(7)
    batch, vocab = 6, 128
    logits = jnp.asarray(rng.randn(batch, vocab), dtype=jnp.float32)
    t = make_tensors(
        batch, vocab,
        top_k=jnp.asarray([1, 5, vocab, 17, 2, vocab], jnp.int32),
        top_p=jnp.asarray([1.0, 0.9, 0.5, 1.0, 0.2, 0.95], jnp.float32),
        min_p=jnp.asarray([0.0, 0.0, 0.05, 0.1, 0.0, 0.02], jnp.float32),
    )
    got = _apply_top_k_top_p_min_p(logits, t)
    want = direct(logits, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
