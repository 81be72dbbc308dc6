"""Modified rejection sampling for speculative decoding (reference role:
vllm/model_executor/layers/rejection_sampler.py, 398 LoC).

Batched, jit-friendly: given draft token ids + draft/target
distributions for k speculative positions, accept each token with
probability min(1, p_target/p_draft); at the first rejection, resample
from the normalized residual distribution max(p_target - p_draft, 0);
if every draft token is accepted, emit the bonus token sampled from the
target model's k+1-th distribution.  Output token ids use -1 padding
after the stopping position.  The emitted distribution provably equals
the target model's (speculative decoding's lossless property).
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RejectionSamplerOutput(NamedTuple):
    # [B, k+1] int32; -1 marks positions after the first rejection.
    output_token_ids: jax.Array
    # [B] int32 — number of emitted tokens per row (1..k+1).
    num_emitted: jax.Array
    # [B] int32 — number of draft tokens accepted (0..k).
    num_accepted: jax.Array


def rejection_sample(
    key: jax.Array,
    draft_token_ids: jax.Array,   # [B, k] int32
    draft_probs: jax.Array,       # [B, k, V] f32
    target_probs: jax.Array,      # [B, k+1, V] f32
    bonus_token_ids: jax.Array,   # [B] int32 (greedy/sampled from pos k)
) -> RejectionSamplerOutput:
    b, k, v = draft_probs.shape

    p_draft = jnp.take_along_axis(draft_probs, draft_token_ids[..., None],
                                  axis=-1)[..., 0]            # [B, k]
    p_target = jnp.take_along_axis(target_probs[:, :k],
                                   draft_token_ids[..., None],
                                   axis=-1)[..., 0]           # [B, k]

    key_u, key_r = jax.random.split(key)
    u = jax.random.uniform(key_u, (b, k))
    accept = u < jnp.minimum(1.0, p_target / jnp.maximum(p_draft, 1e-20))

    # First rejected position per row (k if none).
    rejected = jnp.logical_not(accept)
    first_reject = jnp.where(rejected.any(axis=-1),
                             jnp.argmax(rejected, axis=-1), k)  # [B]

    # Residual distribution at the first rejected position.
    tgt_at = jnp.take_along_axis(
        target_probs, jnp.minimum(first_reject, k)[:, None, None],
        axis=1)[:, 0]                                          # [B, V]
    drf_at = jnp.take_along_axis(
        draft_probs, jnp.minimum(first_reject, k - 1)[:, None, None],
        axis=1)[:, 0]
    residual = jnp.maximum(tgt_at - drf_at, 0.0)
    residual_sum = residual.sum(axis=-1, keepdims=True)
    # Degenerate residual (identical dists): fall back to the target.
    residual = jnp.where(residual_sum > 1e-9, residual, tgt_at)
    residual = residual / residual.sum(axis=-1, keepdims=True)
    recovered = jax.random.categorical(key_r, jnp.log(residual + 1e-30),
                                       axis=-1).astype(jnp.int32)  # [B]

    pos = jnp.arange(k + 1)[None, :]                           # [1, k+1]
    fr = first_reject[:, None]
    draft_padded = jnp.concatenate(
        [draft_token_ids,
         jnp.zeros((b, 1), dtype=draft_token_ids.dtype)], axis=1)
    out = jnp.where(pos < fr, draft_padded, -1)
    # At the stopping position: recovered token (rejection) or bonus
    # token (all accepted).
    all_accepted = first_reject == k
    stop_token = jnp.where(all_accepted, bonus_token_ids, recovered)
    out = jnp.where(pos == fr, stop_token[:, None], out)

    num_accepted = first_reject
    num_emitted = first_reject + 1
    return RejectionSamplerOutput(out.astype(jnp.int32),
                                  num_emitted.astype(jnp.int32),
                                  num_accepted.astype(jnp.int32))


def rejection_sample_onehot_draft(
    seeds: jax.Array,             # [B] uint32 per-row PRNG seeds
    draft_token_ids: jax.Array,   # [B, k] int32 (greedy/top-1 draft)
    target_probs: jax.Array,      # [B, k+1, V] f32 (REAL softmax probs)
    greedy_mask: jax.Array,       # [B] bool — greedy target rows
    greedy_tokens: jax.Array,     # [B, k+1] int32 target argmax per pos
    bonus_token_ids: jax.Array,   # [B] int32 (sampled from pos k)
) -> RejectionSamplerOutput:
    """Specialization of :func:`rejection_sample` for ONE-HOT draft
    distributions (top-1 proposers) with per-row keys.

    Avoids materializing the [B, k, V] draft one-hot (and, for greedy
    rows, the target one-hot): with p_draft = 1 the acceptance test is
    ``u < p_target(draft_id)`` — for greedy targets exactly
    ``draft_id == argmax`` — and the residual is the target row with the
    draft id zeroed out.  Per-row keys keep seeded requests reproducible
    regardless of batch composition (one shared batch key would couple
    co-batched requests' draws).
    """
    b, k = draft_token_ids.shape

    def one_row(seed, d_ids, probs, greedy, gm, bonus):
        key = jax.random.PRNGKey(seed)
        key_u, key_r = jax.random.split(key)
        p_t = jnp.take_along_axis(probs[:k], d_ids[:, None],
                                  axis=-1)[:, 0]              # [k]
        p_t = jnp.where(greedy, (d_ids == gm[:k]).astype(jnp.float32),
                        p_t)
        u = jax.random.uniform(key_u, (k, ))
        rejected = u >= p_t
        fr = jnp.where(rejected.any(), jnp.argmax(rejected), k)

        # Residual at the first rejected position: target row with the
        # draft token's mass removed (p_draft is a one-hot there).
        at = jnp.minimum(fr, k - 1)
        row = probs[at]
        row = row.at[d_ids[at]].set(0.0)
        rsum = row.sum()
        row = jnp.where(rsum > 1e-9, row / jnp.maximum(rsum, 1e-30),
                        probs[at])
        rec_rand = jax.random.categorical(
            key_r, jnp.log(row + 1e-30)).astype(jnp.int32)
        recovered = jnp.where(greedy, gm[at], rec_rand)

        pos = jnp.arange(k + 1)
        stop_tok = jnp.where(fr == k, bonus, recovered)
        out = jnp.where(pos < fr,
                        jnp.concatenate([d_ids, jnp.zeros((1, ),
                                                          jnp.int32)]),
                        -1)
        out = jnp.where(pos == fr, stop_tok, out)
        return out.astype(jnp.int32), (fr + 1).astype(jnp.int32), \
            fr.astype(jnp.int32)

    out, emitted, accepted = jax.vmap(one_row)(
        seeds, draft_token_ids, target_probs, greedy_mask, greedy_tokens,
        bonus_token_ids)
    return RejectionSamplerOutput(out, emitted, accepted)
