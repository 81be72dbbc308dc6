"""Draft-model proposer (reference role:
vllm/spec_decode/multi_step_worker.py MultiStepWorker +
DraftModelTop1Proposer): run the small model k greedy/sampled steps
ahead, collecting per-step probability distributions."""
from __future__ import annotations

import copy
from typing import List

import numpy as np

from vllm_splitwise_tpu.spec_decode.interfaces import (SpeculativeProposals,
                                                       SpeculativeProposer)
from vllm_splitwise_tpu.sequence import SequenceGroupMetadata


class MultiStepWorker(SpeculativeProposer):
    """Wraps a draft Worker; steps it k times without committing state to
    the scheduler (KV writes land in the draft worker's own cache)."""

    def __init__(self, draft_worker) -> None:
        self.worker = draft_worker

    def get_proposals(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        max_proposal_len: int,
    ) -> SpeculativeProposals:
        # Deep-copy metadata so appended draft tokens never leak into the
        # engine's sequences (reference multi_step_worker.py's copy).
        metas = copy.deepcopy(seq_group_metadata_list)
        batch = len(metas)
        vocab = self.worker.model_runner.model_config.get_vocab_size() \
            if hasattr(self.worker.model_runner, "model_config") else None

        token_cols: List[np.ndarray] = []
        prob_cols: List[np.ndarray] = []
        for _ in range(max_proposal_len):
            out = self.worker.execute_model(metas)
            step_tokens = np.zeros((batch, ), dtype=np.int32)
            step_probs = []
            for i, (md, group_out) in enumerate(zip(metas, out)):
                sample = group_out.samples[0]
                step_tokens[i] = sample.output_token
                # Draft probs: one-hot of the sampled token is a valid
                # draft distribution for greedy drafting (reference
                # Top1Proposer emits top-1 proposals).
                lp = sample.logprobs
                if vocab is None:
                    vocab = max(lp) + 1
                row = np.zeros((vocab, ), dtype=np.float32)
                row[sample.output_token] = 1.0
                step_probs.append(row)
                seq_id = next(iter(md.seq_data))
                md.seq_data[seq_id].append_token(sample.output_token,
                                                    0.0)
                md.is_prompt = False
            token_cols.append(step_tokens)
            prob_cols.append(np.stack(step_probs))
        return SpeculativeProposals(
            proposal_token_ids=np.stack(token_cols, axis=1),
            proposal_probs=np.stack(prob_cols, axis=1),
            proposal_lens=np.full((batch, ), max_proposal_len,
                                  dtype=np.int32),
        )
