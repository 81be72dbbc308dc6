"""Request/sequence data model (host side).

Role parity with the reference's ``vllm/sequence.py``: one request becomes
a :class:`SequenceGroup` of candidate :class:`Sequence` s (n>1 sampling /
beam search), each carrying its token history, a lifecycle status, and
enough bookkeeping for the paged-KV allocator.  Everything here is plain
Python on the host — device arrays never appear in this module.

Design notes (deliberate departures from the reference):

* Tokens live in ONE contiguous list per sequence with a ``prompt_len``
  watermark, instead of separate prompt/output lists.  Every accessor is a
  slice off that buffer, and the hot ``append`` is a single ``list.append``.
* Logical KV blocks are never materialized.  A sequence's block demand is
  arithmetic over its length (``num_logical_blocks``), which removes the
  per-token block-object churn the reference pays in ``Sequence``.
* Accessors are properties (``seq.num_tokens``, ``seq.last_token``), not
  ``get_*`` methods.
* ``fork`` copies exactly the mutable state a beam child needs rather than
  deep-copying the whole object graph.
"""
from __future__ import annotations

import enum
from dataclasses import InitVar, dataclass
from typing import Dict, Iterator, List, Optional

from vllm_splitwise_tpu.sampling_params import SamplingParams


class SequenceStatus(enum.IntEnum):
    """Lifecycle state machine.  Values >= FINISHED_STOPPED are terminal."""

    WAITING = 1
    RUNNING = 2
    SWAPPED = 3
    FINISHED_STOPPED = 10
    FINISHED_LENGTH_CAPPED = 11
    FINISHED_ABORTED = 12
    FINISHED_IGNORED = 13

    @staticmethod
    def is_finished(status: "SequenceStatus") -> bool:
        return status >= SequenceStatus.FINISHED_STOPPED

    @staticmethod
    def get_finished_reason(status: "SequenceStatus") -> Optional[str]:
        # FINISHED_IGNORED reports "length": the prompt exceeded the model
        # context, which the OpenAI API surfaces the same way as a cap.
        return _FINISH_REASONS.get(status)


_FINISH_REASONS = {
    SequenceStatus.FINISHED_STOPPED: "stop",
    SequenceStatus.FINISHED_LENGTH_CAPPED: "length",
    SequenceStatus.FINISHED_ABORTED: "abort",
    SequenceStatus.FINISHED_IGNORED: "length",
}


@dataclass
class RequestMetrics:
    """Wall-clock lifecycle points of one request (ref vllm/sequence.py:65),
    extended with the Splitwise migration window."""

    arrival_time: float
    last_token_time: float
    first_scheduled_time: Optional[float] = None
    first_token_time: Optional[float] = None
    time_in_queue: Optional[float] = None
    finished_time: Optional[float] = None
    migration_begin_time: Optional[float] = None
    migration_end_time: Optional[float] = None


@dataclass
class Logprob:
    logprob: float
    decoded_token: Optional[str] = None


# Position -> {token_id: Logprob} maps, one entry per token.
PromptLogprobs = List[Optional[Dict[int, Logprob]]]
SampleLogprobs = List[Dict[int, Logprob]]


class SequenceData:
    """Token history of one sequence: a single buffer + prompt watermark."""

    __slots__ = ("_tokens", "_prompt_len", "cumulative_logprob")

    def __init__(self, prompt_token_ids: List[int]) -> None:
        self._tokens: List[int] = list(prompt_token_ids)
        self._prompt_len = len(self._tokens)
        self.cumulative_logprob = 0.0

    def append_token(self, token_id: int, logprob: float) -> None:
        self._tokens.append(token_id)
        self.cumulative_logprob += logprob

    # The prompt/output views are slices; callers treat them as read-only
    # snapshots.
    @property
    def prompt_token_ids(self) -> List[int]:
        return self._tokens[:self._prompt_len]

    @property
    def output_token_ids(self) -> List[int]:
        return self._tokens[self._prompt_len:]

    @property
    def token_ids(self) -> List[int]:
        return list(self._tokens)

    @property
    def num_tokens(self) -> int:
        return len(self._tokens)

    @property
    def prompt_len(self) -> int:
        return self._prompt_len

    @property
    def output_len(self) -> int:
        return len(self._tokens) - self._prompt_len

    @property
    def last_token(self) -> int:
        return self._tokens[-1]

    def clone(self) -> "SequenceData":
        dup = SequenceData.__new__(SequenceData)
        dup._tokens = list(self._tokens)
        dup._prompt_len = self._prompt_len
        dup.cumulative_logprob = self.cumulative_logprob
        return dup

    def __repr__(self) -> str:
        return (f"SequenceData(len={len(self._tokens)}, "
                f"prompt_len={self._prompt_len}, "
                f"cumulative_logprob={self.cumulative_logprob:.4f})")


@dataclass(repr=False, eq=False)
class Sequence:
    """One decoding candidate.

    KV-page demand is derived arithmetically from the token count; no
    logical-block records exist (the reference keeps a LogicalTokenBlock
    list per sequence).
    """

    seq_id: int
    prompt: str
    prompt_token_ids: InitVar[List[int]]
    block_size: int
    eos_token_id: Optional[int] = None

    def __post_init__(self, prompt_token_ids: List[int]) -> None:
        self.status = SequenceStatus.WAITING
        self.data = SequenceData(prompt_token_ids)
        self.output_logprobs: SampleLogprobs = []
        self.output_text = ""
        # Incremental-detokenizer cursor (transformers_utils.tokenizer).
        self.prefix_offset = 0
        self.read_offset = 0
        self.tokens: Optional[List[str]] = None

    # ---- paged-KV geometry -------------------------------------------

    def num_logical_blocks(self) -> int:
        """Pages needed to hold every token currently in the sequence."""
        return -(-self.data.num_tokens // self.block_size)

    def last_block_num_tokens(self) -> int:
        """Occupancy of the trailing (possibly partial) page."""
        rem = self.data.num_tokens % self.block_size
        return rem if rem else self.block_size

    def hash_of_block(self, logical_idx: int) -> int:
        """Prefix-cache key: content hash of tokens [0, end-of-block]."""
        end = self.num_hashed_tokens_of_block(logical_idx)
        return hash(tuple(self.data.token_ids[:end]))

    def num_hashed_tokens_of_block(self, logical_idx: int) -> int:
        return (logical_idx + 1) * self.block_size

    # ---- token accessors (delegate to the buffer) --------------------

    @property
    def num_tokens(self) -> int:
        return self.data.num_tokens

    @property
    def prompt_len(self) -> int:
        return self.data.prompt_len

    @property
    def output_len(self) -> int:
        return self.data.output_len

    @property
    def token_ids(self) -> List[int]:
        return self.data.token_ids

    @property
    def output_token_ids(self) -> List[int]:
        return self.data.output_token_ids

    @property
    def last_token(self) -> int:
        return self.data.last_token

    @property
    def cumulative_logprob(self) -> float:
        return self.data.cumulative_logprob

    def append_token(self, token_id: int,
                     logprobs: Dict[int, Logprob]) -> None:
        self.output_logprobs.append(logprobs)
        self.data.append_token(token_id, logprobs[token_id].logprob)

    def pop_tokens(self, k: int) -> None:
        """Remove the last ``k`` appended tokens — exact inverse of ``k``
        append_token calls.  Used by the pipelined engine step, which
        appends PLACEHOLDER tokens for an in-flight decode window (so
        the next window schedules against the advanced lengths) and pops
        them when the window's real tokens arrive."""
        for _ in range(k):
            lps = self.output_logprobs.pop()
            tok = self.data._tokens.pop()
            lp = lps.get(tok)
            if lp is not None:
                self.data.cumulative_logprob -= lp.logprob

    # ---- scoring / lifecycle ------------------------------------------

    def beam_score(self,
                   length_penalty: float = 1.0,
                   seq_len: Optional[int] = None,
                   eos_token_id: Optional[int] = None) -> float:
        """HF GenerationMixin-compatible score: cum_logprob / len**penalty.
        An EOS tail token is excluded from the length, as HF does."""
        if seq_len is None:
            seq_len = self.num_tokens
            if (eos_token_id is not None
                    and self.last_token == eos_token_id):
                seq_len -= 1
        return self.cumulative_logprob / (seq_len**length_penalty)

    def is_finished(self) -> bool:
        return self.status >= SequenceStatus.FINISHED_STOPPED

    def fork(self, new_seq_id: int) -> "Sequence":
        """Beam/n>1 child: clone exactly the mutable per-candidate state."""
        child = Sequence.__new__(Sequence)
        child.seq_id = new_seq_id
        child.prompt = self.prompt
        child.block_size = self.block_size
        child.eos_token_id = self.eos_token_id
        child.status = self.status
        child.data = self.data.clone()
        child.output_logprobs = list(self.output_logprobs)
        child.output_text = self.output_text
        child.prefix_offset = self.prefix_offset
        child.read_offset = self.read_offset
        child.tokens = list(self.tokens) if self.tokens is not None else None
        return child

    def __repr__(self) -> str:
        return (f"Sequence(seq_id={self.seq_id}, status={self.status.name}, "
                f"len={self.num_tokens}, blocks={self.num_logical_blocks()})")


@dataclass(repr=False, eq=False)
class SequenceGroup:
    """The candidate set spawned from one request."""

    request_id: str
    seqs: InitVar[List[Sequence]]
    sampling_params: SamplingParams
    arrival_time: InitVar[float]
    prefix_pos: Optional[int] = None
    lora_request: Optional[object] = None

    def __post_init__(self, seqs: List[Sequence],
                      arrival_time: float) -> None:
        self.seqs_dict: Dict[int, Sequence] = {s.seq_id: s for s in seqs}
        self.prompt_logprobs: Optional[PromptLogprobs] = None
        self.metrics = RequestMetrics(arrival_time=arrival_time,
                                      last_token_time=arrival_time)

    # All membership queries funnel through one iterator.
    def _iter(self,
              status: Optional[SequenceStatus] = None) -> Iterator[Sequence]:
        if status is None:
            return iter(self.seqs_dict.values())
        return (s for s in self.seqs_dict.values() if s.status == status)

    def _any_seq(self) -> Sequence:
        return next(iter(self.seqs_dict.values()))

    @property
    def lora_int_id(self) -> int:
        return self.lora_request.lora_int_id if self.lora_request else 0

    @property
    def prompt(self) -> str:
        return self._any_seq().prompt

    @property
    def prompt_token_ids(self) -> List[int]:
        return self._any_seq().data.prompt_token_ids

    @property
    def max_parallel_seqs(self) -> int:
        """Worst-case parallel candidates this group can still occupy."""
        params = self.sampling_params
        if params.use_beam_search or params.best_of > self.num_seqs():
            # Beam width is constant; pre-fork groups will widen to best_of.
            return params.best_of
        return self.num_unfinished

    def get_seqs(self,
                 status: Optional[SequenceStatus] = None) -> List[Sequence]:
        return list(self._iter(status))

    def unfinished_seqs(self) -> List[Sequence]:
        return [s for s in self._iter() if not s.is_finished()]

    def finished_seqs(self) -> List[Sequence]:
        return [s for s in self._iter() if s.is_finished()]

    def num_seqs(self, status: Optional[SequenceStatus] = None) -> int:
        if status is None:
            return len(self.seqs_dict)
        return sum(1 for _ in self._iter(status))

    @property
    def num_unfinished(self) -> int:
        return sum(1 for s in self._iter() if not s.is_finished())

    def find(self, seq_id: int) -> Sequence:
        try:
            return self.seqs_dict[seq_id]
        except KeyError:
            raise ValueError(
                f"Sequence {seq_id} not in group {self.request_id}.") from None

    def add(self, seq: Sequence) -> None:
        if seq.seq_id in self.seqs_dict:
            raise ValueError(f"Sequence {seq.seq_id} already in group.")
        self.seqs_dict[seq.seq_id] = seq

    def remove(self, seq_id: int) -> None:
        self.find(seq_id)
        del self.seqs_dict[seq_id]

    def is_finished(self) -> bool:
        return all(s.is_finished() for s in self.seqs_dict.values())

    # ---- metric stamps -------------------------------------------------

    def maybe_set_first_token_time(self, now: float) -> None:
        if self.metrics.first_token_time is None:
            self.metrics.first_token_time = now

    def maybe_set_first_scheduled_time(self, now: float) -> None:
        m = self.metrics
        if m.first_scheduled_time is None:
            m.first_scheduled_time = now
            m.time_in_queue = now - m.arrival_time

    def set_finished_time(self, now: Optional[float]) -> None:
        self.metrics.finished_time = now

    def get_last_latency(self, now: float) -> float:
        elapsed = now - self.metrics.last_token_time
        self.metrics.last_token_time = now
        return elapsed

    def __repr__(self) -> str:
        return (f"SequenceGroup(request_id={self.request_id}, "
                f"seqs={sorted(self.seqs_dict)}, "
                f"sampling_params={self.sampling_params})")


@dataclass
class SequenceGroupMetadata:
    """Scheduler -> model-runner handoff for one group in one step.

    Information parity with the reference's SequenceGroupMetadata
    (vllm/sequence.py:429).  ``prefix_len`` counts leading prompt tokens
    whose KV already sits in the cache (prefix caching); the runner only
    computes the remainder.
    """

    request_id: str
    is_prompt: bool
    seq_data: Dict[int, SequenceData]
    sampling_params: SamplingParams
    block_tables: Dict[int, List[int]]
    prefix_len: int = 0
    lora_request: Optional[object] = None
    # Chunked prefill (TPU extension): compute only prompt positions
    # [prefix_len, prefill_end).  None = through the end of the prompt.
    # Non-final chunks produce no sampled token (the engine discards).
    prefill_end: Optional[int] = None


@dataclass(eq=True)
class SequenceOutput:
    """One sampled token attributed to its parent sequence."""

    parent_seq_id: int
    output_token: int
    logprobs: Dict[int, Logprob]


@dataclass(eq=True)
class SequenceGroupOutput:
    """Sampler result for one group in one step."""

    samples: List[SequenceOutput]
    prompt_logprobs: Optional[PromptLogprobs]


# One SequenceGroupOutput per scheduled group, in schedule order.
SamplerOutput = List[SequenceGroupOutput]
