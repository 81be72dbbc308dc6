"""Speculative-decoding interfaces (reference role:
vllm/spec_decode/interfaces.py:11-68)."""
from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass
from typing import List, Optional

import jax
import numpy as np

from vllm_splitwise_tpu.sequence import SequenceGroupMetadata


@dataclass
class SpeculativeProposals:
    """Draft-model proposals for one step."""
    proposal_token_ids: np.ndarray   # [B, k] int32
    proposal_probs: np.ndarray       # [B, k, V] f32
    proposal_lens: np.ndarray        # [B] int32 (0 = no proposal)


@dataclass
class SpeculativeScores:
    """Target-model evaluation of proposals."""
    probs: np.ndarray                # [B, k+1, V] f32
    token_ids: np.ndarray            # [B, k+1] int32 (target-sampled)


class SpeculativeProposer(ABC):

    @abstractmethod
    def get_proposals(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        max_proposal_len: int,
    ) -> SpeculativeProposals:
        ...


class SpeculativeScorer(ABC):

    @abstractmethod
    def score_proposals(
        self,
        seq_group_metadata_list: List[SequenceGroupMetadata],
        proposals: SpeculativeProposals,
    ) -> SpeculativeScores:
        ...
