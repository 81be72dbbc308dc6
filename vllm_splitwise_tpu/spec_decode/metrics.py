"""Speculative-decoding acceptance metrics (reference role:
vllm/spec_decode/metrics.py — SpecDecodeWorkerMetrics +
AsyncMetricsCollector).

TPU-native design: the reference copies mutable rejection-sampler GPU
counters to pinned host memory on a side CUDA stream and synchronizes an
event one step later.  Here the rejection sampler is functional
(layers/rejection_sampler.py returns per-call ``num_emitted`` /
``num_accepted`` device scalars), so the collector simply accumulates
those device arrays lazily — JAX dispatch is already async — and defers
the blocking host read with the same two-phase protocol: one
``maybe_collect`` call stages the device->host transfer, the next call
realizes it.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional

import jax
import numpy as np

Timer = Callable[[], float]


@dataclass
class SpecDecodeWorkerMetrics:
    """Metrics emitted from the spec-decode worker (field semantics match
    the reference dataclass, spec_decode/metrics.py:10-41)."""

    # Empirical per-token acceptance rate of the proposal method.
    draft_acceptance_rate: float

    # Tokens emitted / tokens emittable if every proposal were accepted.
    system_efficiency: float

    # Speculative tokens produced by the proposal method.
    draft_tokens: int

    # Tokens emitted by the entire system (accepted + bonus/recovered).
    emitted_tokens: int

    # Tokens accepted by the verification routine, prefix-agnostic.
    accepted_tokens: int

    # Speculative tokens proposed per sequence per step.
    num_spec_tokens: int


class AsyncMetricsCollector:
    """Aggregates rejection-sampler outcomes without blocking the decode
    loop (reference role: AsyncMetricsCollector, spec_decode/metrics.py:47).
    """

    def __init__(self, timer: Optional[Timer] = None,
                 collect_interval_s: float = 5.0):
        self._timer = time.time if timer is None else timer
        self._rank: Optional[int] = None
        # Device scalars accumulated per observe(); summed lazily.
        self._pending_accepted: List[jax.Array] = []
        self._pending_emitted: List[jax.Array] = []
        self._num_draft_tokens = 0
        # Host-side aggregates.
        self._agg_accepted = 0
        self._agg_emitted = 0
        self._agg_draft = 0
        # Two-phase collection: staged (dispatched, not yet read) arrays.
        self._in_flight: Optional[tuple] = None
        self._collect_interval_s = collect_interval_s
        self._last_collect_time = self._timer()

    def init_tensors(self, rank: int) -> None:
        """Reference parity with init_gpu_tensors: records which rank
        reports (only rank 0 collects)."""
        self._rank = rank

    def observe(self, num_accepted: jax.Array, num_emitted: jax.Array,
                num_draft_tokens: int) -> None:
        """Record one rejection-sampling call's outcome.  ``num_accepted``
        / ``num_emitted`` are per-sequence device arrays (or scalars) from
        RejectionSamplerOutput; ``num_draft_tokens`` is host-side."""
        self._pending_accepted.append(num_accepted)
        self._pending_emitted.append(num_emitted)
        self._num_draft_tokens += int(num_draft_tokens)

    def maybe_collect_rejsample_metrics(
            self, k: int) -> Optional[SpecDecodeWorkerMetrics]:
        # Phase 2: a transfer staged last call is ready — realize it.
        if self._in_flight is not None:
            staged_acc, staged_emit, staged_draft = self._in_flight
            self._in_flight = None
            return self._collect(k, staged_acc, staged_emit, staged_draft)

        # Phase 1: time to stage a new device->host transfer?
        if self._should_collect(self._timer()):
            self._in_flight = self._stage_transfer()
        return None

    def _should_collect(self, now: float) -> bool:
        if self._rank not in (None, 0):
            return False
        if now - self._last_collect_time < self._collect_interval_s:
            return False
        return True

    def _stage_transfer(self):
        """Sum pending device scalars and start the async host copy.

        jnp sums dispatch without blocking; the np.asarray in _collect
        (next call) is the only synchronization point."""
        import jax.numpy as jnp
        staged_acc = jnp.sum(jnp.asarray(
            [jnp.sum(x) for x in self._pending_accepted])) \
            if self._pending_accepted else None
        staged_emit = jnp.sum(jnp.asarray(
            [jnp.sum(x) for x in self._pending_emitted])) \
            if self._pending_emitted else None
        staged_draft = self._num_draft_tokens
        self._pending_accepted = []
        self._pending_emitted = []
        self._num_draft_tokens = 0
        return staged_acc, staged_emit, staged_draft

    def _collect(self, k: int, staged_acc, staged_emit,
                 staged_draft: int) -> SpecDecodeWorkerMetrics:
        self._last_collect_time = self._timer()
        if staged_acc is not None:
            self._agg_accepted += int(np.asarray(staged_acc))
        if staged_emit is not None:
            self._agg_emitted += int(np.asarray(staged_emit))
        self._agg_draft += staged_draft

        accepted = self._agg_accepted
        emitted = self._agg_emitted
        draft = self._agg_draft
        possible = self.get_max_num_accepted_tokens(draft, k)
        rate = accepted / draft if draft > 0 else float("nan")
        eff = emitted / possible if possible > 0 else float("nan")
        return SpecDecodeWorkerMetrics(
            num_spec_tokens=k,
            draft_acceptance_rate=rate,
            system_efficiency=eff,
            accepted_tokens=accepted,
            draft_tokens=draft,
            emitted_tokens=emitted,
        )

    @staticmethod
    def get_max_num_accepted_tokens(draft_tokens: int, k: int) -> int:
        """Upper bound on emittable tokens: each spec sequence can emit at
        most k accepted + 1 bonus tokens (reference role,
        spec_decode/metrics.py:169-173; the reference divides where the
        bound requires multiplying — corrected here so
        system_efficiency stays in [0, 1])."""
        total_num_spec_seqs = draft_tokens / k if k > 0 else 0
        num_accepted_per_seq_if_all_accepted = k + 1
        return int(total_num_spec_seqs *
                   num_accepted_per_seq_if_all_accepted)
