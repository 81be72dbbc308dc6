"""Speculative-decoding orchestrator (reference role:
vllm/spec_decode/spec_decode_worker.py:20-351 — present and tested but,
as in the reference, not yet constructed by any engine flag).

One verify step: draft k tokens (MultiStepWorker) -> score with the
target model in one expanded prefill (BatchExpansionTop1Scorer) ->
rejection-sample (layers/rejection_sampler) -> emit 1..k+1 tokens per
sequence.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

import jax
import numpy as np

from vllm_splitwise_tpu.layers.rejection_sampler import rejection_sample
from vllm_splitwise_tpu.spec_decode.batch_expansion import (
    BatchExpansionTop1Scorer)
from vllm_splitwise_tpu.spec_decode.multi_step_worker import MultiStepWorker
from vllm_splitwise_tpu.sequence import SequenceGroupMetadata


@dataclass
class SpecDecodeStats:
    """Acceptance metrics (reference vllm/spec_decode/metrics.py role)."""
    num_spec_tokens: int = 0
    num_accepted: int = 0
    num_emitted: int = 0
    num_steps: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.num_accepted / max(self.num_spec_tokens, 1)

    @property
    def mean_tokens_per_step(self) -> float:
        return self.num_emitted / max(self.num_steps, 1)


class SpecDecodeWorker:

    def __init__(self, draft_worker, target_worker, num_spec_tokens: int,
                 seed: int = 0) -> None:
        from vllm_splitwise_tpu.spec_decode.metrics import \
            AsyncMetricsCollector
        self.proposer = MultiStepWorker(draft_worker)
        self.scorer = BatchExpansionTop1Scorer(target_worker)
        self.k = num_spec_tokens
        self.stats = SpecDecodeStats()
        # Non-blocking aggregate metrics (reference AsyncMetricsCollector
        # role); poll maybe_collect_rejsample_metrics(k) for snapshots.
        self.metrics_collector = AsyncMetricsCollector()
        self.metrics_collector.init_tensors(rank=0)
        self._key = jax.random.PRNGKey(seed)

    def maybe_collect_rejsample_metrics(self):
        return self.metrics_collector.maybe_collect_rejsample_metrics(
            self.k)

    def step(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
    ) -> np.ndarray:
        """Returns [B, k+1] token ids with -1 padding after each row's
        stopping position."""
        proposals = self.proposer.get_proposals(seq_group_metadata_list,
                                                self.k)
        scores = self.scorer.score_proposals(seq_group_metadata_list,
                                             proposals)
        self._key, sub = jax.random.split(self._key)
        bonus = scores.token_ids[:, self.k]
        out = rejection_sample(
            sub,
            jax.numpy.asarray(proposals.proposal_token_ids),
            jax.numpy.asarray(proposals.proposal_probs),
            jax.numpy.asarray(scores.probs),
            jax.numpy.asarray(bonus),
        )
        b = len(seq_group_metadata_list)
        self.stats.num_steps += b
        self.stats.num_spec_tokens += b * self.k
        self.stats.num_accepted += int(np.asarray(out.num_accepted).sum())
        self.stats.num_emitted += int(np.asarray(out.num_emitted).sum())
        self.metrics_collector.observe(out.num_accepted, out.num_emitted,
                                       num_draft_tokens=b * self.k)
        return np.asarray(out.output_token_ids)
