"""Engine stats + periodic logging (+ optional Prometheus export).

Role-parity with the reference's ``vllm/engine/metrics.py`` (Metrics :19,
Stats :101, StatLogger :121): gauges for scheduler occupancy and KV usage,
counters for prompt/generation tokens, histograms for TTFT / per-token
latency / e2e latency, and a 5-second stdout summary.  Prometheus export
is optional — enabled when prometheus_client is importable.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

from vllm_splitwise_tpu.logger import init_logger

logger = init_logger(__name__)

_LOCAL_LOGGING_INTERVAL_SEC = 5.0

try:
    from prometheus_client import Counter, Gauge, Histogram
    _PROMETHEUS = True
except ImportError:  # pragma: no cover - optional dependency
    _PROMETHEUS = False


class Metrics:
    """Prometheus metric family (no-op when the client is absent)."""

    def __init__(self, labelnames: List[str]):
        if not _PROMETHEUS:
            return
        self.gauge_scheduler_running = Gauge(
            "vllm:num_requests_running",
            "Number of requests currently running on TPU.",
            labelnames=labelnames)
        self.gauge_scheduler_swapped = Gauge(
            "vllm:num_requests_swapped",
            "Number of requests swapped to host memory.",
            labelnames=labelnames)
        self.gauge_scheduler_waiting = Gauge(
            "vllm:num_requests_waiting",
            "Number of requests waiting to be processed.",
            labelnames=labelnames)
        self.gauge_kv_cache_usage = Gauge(
            "vllm:kv_cache_usage_perc",
            "Device KV-cache usage. 1 means 100 percent usage.",
            labelnames=labelnames)
        self.counter_prompt_tokens = Counter(
            "vllm:prompt_tokens_total", "Number of prefill tokens processed.",
            labelnames=labelnames)
        self.counter_generation_tokens = Counter(
            "vllm:generation_tokens_total",
            "Number of generation tokens processed.", labelnames=labelnames)
        self.histogram_time_to_first_token = Histogram(
            "vllm:time_to_first_token_seconds",
            "Histogram of time to first token in seconds.",
            labelnames=labelnames,
            buckets=[0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25,
                     0.5, 0.75, 1.0, 2.5, 5.0, 7.5, 10.0])
        self.histogram_time_per_output_token = Histogram(
            "vllm:time_per_output_token_seconds",
            "Histogram of time per output token in seconds.",
            labelnames=labelnames,
            buckets=[0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4,
                     0.5, 0.75, 1.0, 2.5])
        self.histogram_e2e_request_latency = Histogram(
            "vllm:e2e_request_latency_seconds",
            "Histogram of end to end request latency in seconds.",
            labelnames=labelnames,
            buckets=[1.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0, 50.0,
                     60.0])
        self.histogram_kv_migration = Histogram(
            "vllm:kv_migration_seconds",
            "Histogram of splitwise prefill->decode KV migration time.",
            labelnames=labelnames,
            buckets=[0.0005, 0.001, 0.0025, 0.005, 0.01, 0.025, 0.05,
                     0.1, 0.25, 0.5, 1.0])
        # Compile-stall observability (TPU): a first-seen program shape
        # dispatched mid-traffic blocks the engine loop while it
        # compiles; warmup coverage should keep both counters at zero.
        self.counter_compile_stalls = Counter(
            "vllm:compile_stalls_total",
            "Program shapes that compiled mid-traffic.",
            labelnames=labelnames)
        self.counter_compile_stall_seconds = Counter(
            "vllm:compile_stall_seconds_total",
            "Engine-loop seconds lost to mid-traffic compiles.",
            labelnames=labelnames)


@dataclass
class Stats:
    """Snapshot of engine state for one logging tick."""
    now: float
    num_running: int
    num_waiting: int
    num_swapped: int
    kv_cache_usage: float
    num_prompt_tokens: int
    num_generation_tokens: int
    time_to_first_tokens: List[float]
    time_per_output_tokens: List[float]
    time_e2e_requests: List[float]
    time_kv_migrations: List[float]
    # Speculative decoding (None when disabled): cumulative acceptance
    # rate and mean emitted tokens per spec step (reference
    # SpecDecodeWorkerMetrics role).
    spec_acceptance_rate: "Optional[float]" = None
    spec_tokens_per_step: "Optional[float]" = None
    # Mid-traffic compile stalls SINCE THE LAST SNAPSHOT (deltas).
    compile_stalls: int = 0
    compile_stall_seconds: float = 0.0
    # Pipelined serving (--pipeline-decode): cumulative chained vs
    # unchained window dispatches (chained = the window consumed the
    # previous window's device-side token carry, fully overlapping
    # host/transport time).
    chained_windows: int = 0
    unchained_windows: int = 0


class StatLogger:
    """Aggregates per-step Stats and logs throughput every few seconds."""

    def __init__(self, local_interval: float = _LOCAL_LOGGING_INTERVAL_SEC,
                 labels: Optional[Dict[str, str]] = None) -> None:
        self.last_local_log = time.monotonic()
        self.local_interval = local_interval
        self.num_prompt_tokens: List[int] = []
        self.num_generation_tokens: List[int] = []
        self.labels = labels or {}
        self.metrics = Metrics(labelnames=list(self.labels.keys()))

    def _throughput(self, tracked: List[int], now: float) -> float:
        return float(sum(tracked) / (now - self.last_local_log))

    def _should_log(self, now: float) -> bool:
        return now - self.last_local_log >= self.local_interval

    def log(self, stats: Stats) -> None:
        self.num_prompt_tokens.append(stats.num_prompt_tokens)
        self.num_generation_tokens.append(stats.num_generation_tokens)

        if _PROMETHEUS:
            m = self.metrics
            m.gauge_scheduler_running.labels(**self.labels).set(
                stats.num_running)
            m.gauge_scheduler_swapped.labels(**self.labels).set(
                stats.num_swapped)
            m.gauge_scheduler_waiting.labels(**self.labels).set(
                stats.num_waiting)
            m.gauge_kv_cache_usage.labels(**self.labels).set(
                stats.kv_cache_usage)
            m.counter_prompt_tokens.labels(**self.labels).inc(
                stats.num_prompt_tokens)
            m.counter_generation_tokens.labels(**self.labels).inc(
                stats.num_generation_tokens)
            for ttft in stats.time_to_first_tokens:
                m.histogram_time_to_first_token.labels(**self.labels).observe(
                    ttft)
            for tpot in stats.time_per_output_tokens:
                m.histogram_time_per_output_token.labels(
                    **self.labels).observe(tpot)
            for e2e in stats.time_e2e_requests:
                m.histogram_e2e_request_latency.labels(
                    **self.labels).observe(e2e)
            for mig in stats.time_kv_migrations:
                m.histogram_kv_migration.labels(**self.labels).observe(mig)
            if stats.compile_stalls:
                m.counter_compile_stalls.labels(**self.labels).inc(
                    stats.compile_stalls)
                m.counter_compile_stall_seconds.labels(**self.labels).inc(
                    stats.compile_stall_seconds)

        now = time.monotonic()
        if self._should_log(now):
            prompt_tput = self._throughput(self.num_prompt_tokens, now)
            gen_tput = self._throughput(self.num_generation_tokens, now)
            spec = ""
            if stats.spec_acceptance_rate is not None:
                spec = (f", Spec acceptance: "
                        f"{stats.spec_acceptance_rate * 100:.1f}%"
                        f" ({stats.spec_tokens_per_step:.2f} tok/step)")
            total_w = stats.chained_windows + stats.unchained_windows
            if total_w:
                spec += (f", Chained windows: {stats.chained_windows}"
                         f"/{total_w}")
            logger.info(
                "Avg prompt throughput: %.1f tokens/s, "
                "Avg generation throughput: %.1f tokens/s, "
                "Running: %d reqs, Swapped: %d reqs, Pending: %d reqs, "
                "KV cache usage: %.1f%%%s", prompt_tput, gen_tput,
                stats.num_running, stats.num_swapped, stats.num_waiting,
                stats.kv_cache_usage * 100, spec)
            self.num_prompt_tokens = []
            self.num_generation_tokens = []
            self.last_local_log = now
