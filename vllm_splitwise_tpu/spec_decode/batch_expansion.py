"""Target-model scorer via batch expansion (reference role:
vllm/spec_decode/batch_expansion.py BatchExpansionTop1Scorer): append the
k proposed tokens to each sequence and run ONE target-model prefill over
the expanded suffix, yielding the target distribution at every
speculative position."""
from __future__ import annotations

import copy
from typing import List

import numpy as np

from vllm_splitwise_tpu.spec_decode.interfaces import (SpeculativeProposals,
                                                       SpeculativeScorer,
                                                       SpeculativeScores)
from vllm_splitwise_tpu.sequence import SequenceGroupMetadata


class BatchExpansionTop1Scorer(SpeculativeScorer):

    def __init__(self, target_worker) -> None:
        self.worker = target_worker
        self._score_fn = None

    def _build_score_fn(self, model, vocab):
        import jax
        import jax.numpy as jnp

        def score(params, input_ids, positions, kv_caches, metadata):
            hidden, new_caches = model(params, input_ids, positions,
                                       kv_caches, metadata)
            logits = model.compute_logits(params, hidden)[..., :vocab]
            return jax.nn.softmax(logits.astype(jnp.float32),
                                  axis=-1), new_caches

        return jax.jit(score)

    def score_proposals(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        proposals: SpeculativeProposals,
        greedy: bool = True,
    ) -> SpeculativeScores:
        """greedy=True replaces the target distribution with the one-hot
        of its argmax — temperature-0 speculative decoding accepts a
        draft token iff it equals the target's greedy choice."""
        import jax.numpy as jnp

        runner = self.worker.model_runner
        model = runner.model
        vocab = runner.model_config.get_vocab_size()
        k = proposals.proposal_token_ids.shape[1]
        batch = len(seq_group_metadata_list)

        metas = copy.deepcopy(seq_group_metadata_list)
        for i, md in enumerate(metas):
            seq_id = next(iter(md.seq_data))
            for t in proposals.proposal_token_ids[i]:
                md.seq_data[seq_id].append_token(int(t), 0.0)
            md.is_prompt = True  # re-run the suffix as a (full) prefill

        input_ids, positions, metadata, seq_lens = runner._prepare_prompt(
            metas)
        if self._score_fn is None:
            self._score_fn = self._build_score_fn(model, vocab)
        probs, new_caches = self._score_fn(runner.params,
                                           jnp.asarray(input_ids),
                                           jnp.asarray(positions),
                                           self.worker.kv_caches, metadata)
        self.worker.kv_caches = new_caches
        probs_np = np.asarray(probs)  # [B, T, V]

        scores = np.zeros((batch, k + 1, vocab), dtype=np.float32)
        token_ids = np.zeros((batch, k + 1), dtype=np.int32)
        for i, total_len in enumerate(seq_lens):
            # Positions total_len-1-k .. total_len-1 score the k proposals
            # and the bonus position.
            start = total_len - 1 - k
            scores[i] = probs_np[i, start:start + k + 1, :vocab]
            token_ids[i] = np.argmax(scores[i], axis=-1)
        if greedy:
            scores = np.zeros_like(scores)
            np.put_along_axis(scores, token_ids[..., None], 1.0, axis=-1)
        return SpeculativeScores(probs=scores, token_ids=token_ids)
