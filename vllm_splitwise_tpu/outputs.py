"""User-facing request outputs (reference role: vllm/outputs.py)."""
from __future__ import annotations

import dataclasses
from typing import List, Optional

from vllm_splitwise_tpu.sequence import (PromptLogprobs, SampleLogprobs,
                                         SequenceGroup, SequenceStatus)


@dataclasses.dataclass
class CompletionOutput:
    """One generated completion of a request."""

    index: int
    text: str
    token_ids: List[int]
    cumulative_logprob: float
    logprobs: Optional[SampleLogprobs]
    finish_reason: Optional[str] = None

    def finished(self) -> bool:
        return self.finish_reason is not None

    def __repr__(self) -> str:
        shown = ("index", "text", "token_ids", "cumulative_logprob",
                 "finish_reason")
        inner = ", ".join(f"{k}={getattr(self, k)!r}" for k in shown)
        return f"CompletionOutput({inner})"


@dataclasses.dataclass
class RequestOutput:
    """Everything generated for one request so far."""

    request_id: str
    prompt: str
    prompt_token_ids: List[int]
    prompt_logprobs: Optional[PromptLogprobs]
    outputs: List[CompletionOutput]
    finished: bool
    metrics: object = None

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        sp = seq_group.sampling_params
        # Rank candidates: beam score under beam search, cumulative
        # logprob otherwise; surface the top n.
        if sp.use_beam_search:
            def rank(seq):
                return seq.beam_score(sp.length_penalty)
        else:
            def rank(seq):
                return seq.cumulative_logprob
        best = sorted(seq_group.get_seqs(), key=rank, reverse=True)[:sp.n]

        with_lp = sp.logprobs is not None
        completions = []
        for i, seq in enumerate(best):
            completions.append(CompletionOutput(
                i, seq.output_text, seq.output_token_ids,
                seq.cumulative_logprob,
                seq.output_logprobs if with_lp else None,
                SequenceStatus.get_finished_reason(seq.status)))

        return cls(seq_group.request_id, seq_group.prompt,
                   seq_group.prompt_token_ids, seq_group.prompt_logprobs,
                   completions, seq_group.is_finished(),
                   seq_group.metrics)

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id}, "
                f"prompt={self.prompt!r}, outputs={self.outputs}, "
                f"finished={self.finished})")
