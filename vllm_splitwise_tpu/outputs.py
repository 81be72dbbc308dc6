"""User-facing request outputs (reference role: vllm/outputs.py)."""
from __future__ import annotations

from typing import List, Optional

from vllm_splitwise_tpu.sequence import (PromptLogprobs, SampleLogprobs,
                                         SequenceGroup, SequenceStatus)


class CompletionOutput:
    """One generated completion of a request."""

    def __init__(
        self,
        index: int,
        text: str,
        token_ids: List[int],
        cumulative_logprob: float,
        logprobs: Optional[SampleLogprobs],
        finish_reason: Optional[str] = None,
    ) -> None:
        self.index = index
        self.text = text
        self.token_ids = token_ids
        self.cumulative_logprob = cumulative_logprob
        self.logprobs = logprobs
        self.finish_reason = finish_reason

    def finished(self) -> bool:
        return self.finish_reason is not None

    def __repr__(self) -> str:
        return (f"CompletionOutput(index={self.index}, "
                f"text={self.text!r}, "
                f"token_ids={self.token_ids}, "
                f"cumulative_logprob={self.cumulative_logprob}, "
                f"finish_reason={self.finish_reason})")


class RequestOutput:
    """Everything generated for one request so far."""

    def __init__(
        self,
        request_id: str,
        prompt: str,
        prompt_token_ids: List[int],
        prompt_logprobs: Optional[PromptLogprobs],
        outputs: List[CompletionOutput],
        finished: bool,
        metrics=None,
    ) -> None:
        self.request_id = request_id
        self.prompt = prompt
        self.prompt_token_ids = prompt_token_ids
        self.prompt_logprobs = prompt_logprobs
        self.outputs = outputs
        self.finished = finished
        self.metrics = metrics

    @classmethod
    def from_seq_group(cls, seq_group: SequenceGroup) -> "RequestOutput":
        # Pick the n best sequences (by beam score under beam search,
        # by cumulative logprob otherwise).
        seqs = seq_group.get_seqs()
        n = seq_group.sampling_params.n
        if seq_group.sampling_params.use_beam_search:
            sorting_key = lambda seq: seq.beam_score(
                seq_group.sampling_params.length_penalty)
        else:
            sorting_key = lambda seq: seq.cumulative_logprob
        sorted_seqs = sorted(seqs, key=sorting_key, reverse=True)
        top_n_seqs = sorted_seqs[:n]

        include_logprobs = seq_group.sampling_params.logprobs is not None
        outputs = [
            CompletionOutput(
                index=top_n_seqs.index(seq),
                text=seq.output_text,
                token_ids=seq.output_token_ids,
                cumulative_logprob=seq.cumulative_logprob,
                logprobs=seq.output_logprobs if include_logprobs else None,
                finish_reason=SequenceStatus.get_finished_reason(seq.status),
            ) for seq in top_n_seqs
        ]

        return cls(
            request_id=seq_group.request_id,
            prompt=seq_group.prompt,
            prompt_token_ids=seq_group.prompt_token_ids,
            prompt_logprobs=seq_group.prompt_logprobs,
            outputs=outputs,
            finished=seq_group.is_finished(),
            metrics=seq_group.metrics,
        )

    def __repr__(self) -> str:
        return (f"RequestOutput(request_id={self.request_id}, "
                f"prompt={self.prompt!r}, "
                f"outputs={self.outputs}, "
                f"finished={self.finished})")
