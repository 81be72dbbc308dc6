"""Token sampling.

Role-parity with the reference's ``vllm/model_executor/layers/sampler.py``
(penalties -> temperature -> top-k/top-p/min-p -> greedy/random/beam ->
logprobs), re-designed for TPU: the whole pipeline is a pure function of
``(logits, SamplingTensors, seeds)`` that runs INSIDE the jitted model
step, so sampled token ids — not 32k-wide logits — cross the device->host
boundary.  Per-sequence determinism uses per-row PRNG seeds built on the
host (replacing the reference's per-request torch.Generator state).

Batch-varying features are padded to the batch bucket.  Penalty token
histories are passed as padded [B, L] id arrays (L=0 compiles the
penalty-free fast path).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


class SamplingTensors(NamedTuple):
    """Per-row sampling parameters, padded to the batch bucket."""
    temperature: jax.Array    # [B] f32 (>= 1e-5; greedy rows use greedy_mask)
    top_p: jax.Array          # [B] f32 in (0, 1]
    top_k: jax.Array          # [B] i32 (vocab_size = disabled)
    min_p: jax.Array          # [B] f32
    greedy_mask: jax.Array    # [B] bool
    presence_penalty: jax.Array   # [B] f32
    frequency_penalty: jax.Array  # [B] f32
    repetition_penalty: jax.Array # [B] f32
    # Padded token histories for penalties; pad value < 0 (dropped).
    prompt_tokens: jax.Array  # [B, Lp] i32 (Lp may be 0)
    output_tokens: jax.Array  # [B, Lo] i32 (Lo may be 0)


class SamplerOutputArrays(NamedTuple):
    """Raw device output; host post-processing builds SequenceOutputs."""
    sampled_tokens: jax.Array   # [B] i32
    sampled_logprobs: jax.Array # [B] f32 — logprob of the sampled token
    topk_logprobs: jax.Array    # [B, K] f32
    topk_token_ids: jax.Array   # [B, K] i32


def _token_counts(token_ids: jax.Array, vocab_size: int) -> jax.Array:
    """[B, L] padded ids -> [B, vocab] f32 occurrence counts."""
    batch = token_ids.shape[0]
    if token_ids.shape[1] == 0:
        return jnp.zeros((batch, vocab_size), dtype=jnp.float32)
    ids = jnp.where(token_ids < 0, vocab_size, token_ids)
    counts = jnp.zeros((batch, vocab_size), dtype=jnp.float32)
    ones = jnp.ones(token_ids.shape, dtype=jnp.float32)
    return counts.at[jnp.arange(batch)[:, None], ids].add(ones, mode="drop")


def _apply_penalties(logits: jax.Array, t: SamplingTensors,
                     vocab_size: int) -> jax.Array:
    if t.prompt_tokens.shape[1] == 0 and t.output_tokens.shape[1] == 0:
        return logits
    prompt_counts = _token_counts(t.prompt_tokens, vocab_size)
    output_counts = _token_counts(t.output_tokens, vocab_size)
    appeared = ((prompt_counts + output_counts) > 0)
    # Repetition penalty: divide positive logits / multiply negative ones
    # for any token that appeared in prompt or output.
    rep = t.repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rep, logits * rep)
    logits = jnp.where(appeared, penalized, logits)
    # Frequency/presence act on generated tokens only.
    logits = logits - t.frequency_penalty[:, None] * output_counts
    logits = logits - t.presence_penalty[:, None] * (output_counts > 0)
    return logits


def _apply_top_k_top_p_min_p(logits: jax.Array,
                             t: SamplingTensors) -> jax.Array:
    # Each of the three masks is a SUFFIX of the descending sort (top-k
    # by rank, top-p by nondecreasing cumsum, min-p by nonincreasing
    # probs), so the kept set is a prefix and a single per-row threshold
    # (the smallest kept logit) reproduces it in the ORIGINAL order.
    # That removes the argsort + inverse-argsort + two gathers of the
    # direct form: one values-only sort, then an elementwise compare.
    # (Sole deviation: original-order tokens exactly EQUAL to the
    # threshold are also kept; ties at f32 after temperature scaling
    # are measure-zero.)
    sorted_logits = -jnp.sort(-logits, axis=-1)     # descending values

    ranks = jax.lax.broadcasted_iota(jnp.int32, sorted_logits.shape, 1)
    k_mask = ranks >= t.top_k[:, None]

    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Keep a token if the cumulative prob BEFORE it is < top_p (always
    # keep the top-1 token).
    p_mask = (cum - probs) >= t.top_p[:, None]

    mp_mask = probs < t.min_p[:, None] * probs[:, 0:1]

    mask = k_mask | p_mask | mp_mask
    # First masked rank == number of kept tokens (>= 1: no mask hits
    # rank 0).  Threshold = smallest kept logit.
    n_keep = jnp.sum(~mask, axis=-1, keepdims=True)
    thr = jnp.take_along_axis(sorted_logits, n_keep - 1, axis=-1)
    return jnp.where(logits >= thr, logits, _NEG_INF)


def sample(
    logits: jax.Array,        # [B, vocab] (any float dtype)
    tensors: SamplingTensors,
    seeds: jax.Array,         # [B] uint32 per-row PRNG seeds
    *,
    max_logprobs: int = 8,
    needs_filtering: bool = True,
) -> SamplerOutputArrays:
    """The full sampling pipeline on device.

    ``needs_filtering=False`` compiles out the vocab sort when every row is
    greedy or unfiltered random (the common case).
    """
    batch, vocab_size = logits.shape
    logits = logits.astype(jnp.float32)

    logits = _apply_penalties(logits, tensors, vocab_size)
    greedy_tokens = jnp.argmax(logits, axis=-1)

    logits = logits / tensors.temperature[:, None]
    if needs_filtering:
        logits = _apply_top_k_top_p_min_p(logits, tensors)

    logprobs = jax.nn.log_softmax(logits, axis=-1)

    def sample_row(seed, row_logits):
        key = jax.random.PRNGKey(seed)
        return jax.random.categorical(key, row_logits)

    random_tokens = jax.vmap(sample_row)(seeds, logits)
    sampled = jnp.where(tensors.greedy_mask, greedy_tokens,
                        random_tokens).astype(jnp.int32)

    sampled_lp = jnp.take_along_axis(logprobs, sampled[:, None],
                                     axis=-1)[:, 0]
    topk_lp, topk_ids = jax.lax.top_k(logprobs, max_logprobs)
    return SamplerOutputArrays(sampled, sampled_lp, topk_lp,
                               topk_ids.astype(jnp.int32))


def compute_logits(hidden: jax.Array, lm_head: jax.Array,
                   vocab_size: Optional[int] = None) -> jax.Array:
    """hidden [B, H] @ lm_head [H, V_padded] -> [B, V] (padding stripped)."""
    logits = jnp.dot(hidden, lm_head, preferred_element_type=jnp.float32)
    if vocab_size is not None and logits.shape[-1] != vocab_size:
        logits = logits[..., :vocab_size]
    return logits
