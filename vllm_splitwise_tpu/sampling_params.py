"""User-facing sampling parameters.

Feature-parity surface with the reference's ``vllm/sampling_params.py:25``
(n/best_of, penalties, temperature, top-p/k, min-p, seed, beam search,
stop strings, logprobs, logits processors), independently implemented as
a dataclass whose numeric constraints live in one declarative rule table.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable, List, Optional, Union

_SAMPLING_EPS = 1e-5

LogitsProcessor = Callable[[List[int], Any], Any]
"""Callable (generated_token_ids, logits) -> logits, applied on host."""


class SamplingType(enum.IntEnum):
    GREEDY = 0
    RANDOM = 1
    RANDOM_SEED = 2
    BEAM = 3


# Numeric-range rules: field -> (low, high, low_open, high_open).
# None disables that bound.  Checked for every request in _validate().
_RANGES = {
    "presence_penalty": (-2.0, 2.0, False, False),
    "frequency_penalty": (-2.0, 2.0, False, False),
    "repetition_penalty": (0.0, 2.0, True, False),
    "temperature": (0.0, None, False, False),
    "top_p": (0.0, 1.0, True, False),
    "min_p": (0.0, 1.0, False, False),
    "n": (1, None, False, False),
}
# Optional[int] fields whose value, when present, has a floor.
_OPTIONAL_MINS = {"max_tokens": 1, "logprobs": 0, "prompt_logprobs": 0}


@dataclasses.dataclass
class SamplingParams:
    """Sampling parameters for one request (OpenAI-compatible semantics).

    ``max_tokens=None`` generates until a stop condition; ``top_k=-1``
    disables top-k; ``seed`` pins the per-request random stream.
    """

    n: int = 1
    best_of: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    min_p: float = 0.0
    seed: Optional[int] = None
    use_beam_search: bool = False
    length_penalty: float = 1.0
    early_stopping: Union[bool, str] = False
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    include_stop_str_in_output: bool = False
    ignore_eos: bool = False
    max_tokens: Optional[int] = 16
    logprobs: Optional[int] = None
    prompt_logprobs: Optional[int] = None
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    logits_processors: Optional[List[LogitsProcessor]] = None

    def __post_init__(self) -> None:
        if self.best_of is None:
            self.best_of = self.n
        self.stop = ([self.stop] if isinstance(self.stop, str)
                     else list(self.stop or []))
        self.stop_token_ids = list(self.stop_token_ids or [])
        self.logits_processors = self.logits_processors or []
        self._validate()
        if not self.use_beam_search and self.temperature < _SAMPLING_EPS:
            # Zero temperature = deterministic: filtering is meaningless,
            # so normalize it away (one canonical greedy program shape).
            self.top_p, self.top_k, self.min_p = 1.0, -1, 0.0

    # ---- validation ----

    def _fail(self, why: str) -> None:
        raise ValueError(f"invalid SamplingParams: {why}")

    def _validate(self) -> None:
        for name, (lo, hi, lo_open, hi_open) in _RANGES.items():
            v = getattr(self, name)
            if lo is not None and (v < lo or (lo_open and v == lo)):
                self._fail(f"{name}={v} below {'(' if lo_open else '['}{lo}")
            if hi is not None and (v > hi or (hi_open and v == hi)):
                self._fail(f"{name}={v} above {hi}{')' if hi_open else ']'}")
        for name, floor in _OPTIONAL_MINS.items():
            v = getattr(self, name)
            if v is not None and v < floor:
                self._fail(f"{name}={v} must be >= {floor}")
        if self.best_of < self.n:
            self._fail(f"best_of={self.best_of} < n={self.n}")
        if self.top_k == 0 or self.top_k < -1:
            self._fail(f"top_k={self.top_k} (use -1 to disable, else >= 1)")
        (self._validate_beam if self.use_beam_search
         else self._validate_non_beam)()

    def _validate_beam(self) -> None:
        checks = [
            (self.best_of > 1, "beam search needs best_of > 1"),
            (self.temperature <= _SAMPLING_EPS,
             "beam search needs temperature 0"),
            (self.top_p >= 1.0 - _SAMPLING_EPS, "beam search needs top_p 1"),
            (self.top_k == -1, "beam search needs top_k -1"),
            (self.early_stopping in (True, False, "never"),
             f"early_stopping={self.early_stopping!r} not in "
             "(True, False, 'never')"),
        ]
        for ok, why in checks:
            if not ok:
                self._fail(why)

    def _validate_non_beam(self) -> None:
        if self.early_stopping is not False:
            self._fail("early_stopping applies only to beam search")
        if abs(self.length_penalty - 1.0) > _SAMPLING_EPS:
            self._fail("length_penalty applies only to beam search")
        if self.temperature < _SAMPLING_EPS and self.best_of > 1:
            self._fail(f"greedy sampling needs best_of 1, "
                       f"got {self.best_of}")

    # ---- derived ----

    @property
    def sampling_type(self) -> SamplingType:
        if self.use_beam_search:
            return SamplingType.BEAM
        if self.temperature < _SAMPLING_EPS:
            return SamplingType.GREEDY
        return (SamplingType.RANDOM_SEED if self.seed is not None
                else SamplingType.RANDOM)

    def __repr__(self) -> str:
        shown = ("n", "best_of", "presence_penalty", "frequency_penalty",
                 "repetition_penalty", "temperature", "top_p", "top_k",
                 "min_p", "seed", "use_beam_search", "stop", "ignore_eos",
                 "max_tokens", "logprobs")
        inner = ", ".join(f"{k}={getattr(self, k)!r}" for k in shown)
        return f"SamplingParams({inner})"
