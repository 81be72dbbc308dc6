"""Spec-decode metrics collector unit tests (reference pattern:
tests/spec_decode/test_metrics.py — fake timer, two-phase collection)."""
import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.spec_decode.metrics import (AsyncMetricsCollector,
                                                    SpecDecodeWorkerMetrics)


class FakeTimer:
    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


def test_initial_call_returns_none():
    timer = FakeTimer()
    col = AsyncMetricsCollector(timer=timer, collect_interval_s=5.0)
    col.init_tensors(rank=0)
    assert col.maybe_collect_rejsample_metrics(k=4) is None


def test_two_phase_collection_after_interval():
    timer = FakeTimer()
    col = AsyncMetricsCollector(timer=timer, collect_interval_s=5.0)
    col.init_tensors(rank=0)

    # 2 sequences: one accepted 3/4 drafts, one accepted 1/4.
    col.observe(num_accepted=jnp.asarray([3, 1]),
                num_emitted=jnp.asarray([4, 2]), num_draft_tokens=8)

    timer.now = 6.0
    # Phase 1 stages the transfer, returns None.
    assert col.maybe_collect_rejsample_metrics(k=4) is None
    # Phase 2 realizes it.
    m = col.maybe_collect_rejsample_metrics(k=4)
    assert isinstance(m, SpecDecodeWorkerMetrics)
    assert m.accepted_tokens == 4
    assert m.emitted_tokens == 6
    assert m.draft_tokens == 8
    assert m.num_spec_tokens == 4
    np.testing.assert_allclose(m.draft_acceptance_rate, 4 / 8)
    # 8 drafts at k=4 => 2 spec seqs => 2 * (4+1) = 10 emittable.
    np.testing.assert_allclose(m.system_efficiency, 6 / 10)


def test_no_collect_before_interval_or_on_nonzero_rank():
    timer = FakeTimer()
    col = AsyncMetricsCollector(timer=timer, collect_interval_s=5.0)
    col.init_tensors(rank=0)
    col.observe(jnp.asarray([1]), jnp.asarray([2]), num_draft_tokens=4)
    timer.now = 4.9
    assert col.maybe_collect_rejsample_metrics(k=4) is None
    assert col.maybe_collect_rejsample_metrics(k=4) is None

    col2 = AsyncMetricsCollector(timer=timer, collect_interval_s=5.0)
    col2.init_tensors(rank=1)
    col2.observe(jnp.asarray([1]), jnp.asarray([2]), num_draft_tokens=4)
    timer.now = 100.0
    assert col2.maybe_collect_rejsample_metrics(k=4) is None


def test_aggregates_accumulate_across_collections():
    timer = FakeTimer()
    col = AsyncMetricsCollector(timer=timer, collect_interval_s=1.0)
    col.init_tensors(rank=0)
    col.observe(jnp.asarray([2]), jnp.asarray([3]), num_draft_tokens=4)
    timer.now = 2.0
    col.maybe_collect_rejsample_metrics(k=4)
    m1 = col.maybe_collect_rejsample_metrics(k=4)
    assert m1.accepted_tokens == 2

    col.observe(jnp.asarray([4]), jnp.asarray([5]), num_draft_tokens=4)
    timer.now = 4.0
    col.maybe_collect_rejsample_metrics(k=4)
    m2 = col.maybe_collect_rejsample_metrics(k=4)
    assert m2.accepted_tokens == 6
    assert m2.emitted_tokens == 8
    assert m2.draft_tokens == 8


def test_nan_when_no_drafts():
    timer = FakeTimer()
    col = AsyncMetricsCollector(timer=timer, collect_interval_s=0.0)
    col.init_tensors(rank=0)
    timer.now = 1.0
    col.maybe_collect_rejsample_metrics(k=4)
    m = col.maybe_collect_rejsample_metrics(k=4)
    assert np.isnan(m.draft_acceptance_rate)
    assert np.isnan(m.system_efficiency)
