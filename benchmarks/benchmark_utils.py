"""Shared benchmark instrumentation (reference role:
benchmarks/benchmark_utils.py:10-172): request-lifetime events, per-token
timestamps, TTFT/TPOT metrics, SLO attainment, .exp result dumps."""
from __future__ import annotations

import enum
import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


class LifetimeEvent(enum.IntEnum):
    """Request lifecycle points (reference benchmark_utils.py:10-75; the
    fork's Splitwise instrumentation)."""
    Issued = 0
    ContextBegin = 1
    ContextEnd = 2
    MigrationBegin = 3
    MigrationEnd = 4
    DecodingBegin = 5
    DecodingEnd = 6


@dataclass
class RequestResult:
    """One request's measured lifetime (schema parity with the
    reference's .exp records, benchmark_utils.py:118-145)."""
    prompt_len: int
    output_len: int
    start_time: float
    end_time: float
    token_timestamps: List[float] = field(default_factory=list)
    lifetime_events: Dict[int, float] = field(default_factory=dict)

    @property
    def latency(self) -> float:
        return self.end_time - self.start_time

    @property
    def ftl(self) -> Optional[float]:
        """Time to first token (reference :140)."""
        if not self.token_timestamps:
            return None
        return self.token_timestamps[0] - self.start_time

    @property
    def tpot(self) -> Optional[float]:
        """Time per output token after the first (reference :141).

        The reference streams one token per SSE event, so events == tokens
        there; this server coalesces a multi-step decode window into one
        event, so the denominator is the request's known output length
        (``output_len``) rather than the event count."""
        if len(self.token_timestamps) < 2:
            return None
        num_tokens = max(self.output_len, len(self.token_timestamps))
        return ((self.token_timestamps[-1] - self.token_timestamps[0]) /
                (num_tokens - 1))

    def record_event(self, event: LifetimeEvent,
                     ts: Optional[float] = None) -> None:
        self.lifetime_events[int(event)] = ts if ts is not None else \
            time.time()

    def to_dict(self) -> dict:
        return {
            "prompt_len": self.prompt_len,
            "output_len": self.output_len,
            "start_time": self.start_time,
            "end_time": self.end_time,
            "latency": self.latency,
            "ftl": self.ftl,
            "tpot": self.tpot,
            "token_timestamps": self.token_timestamps,
            "lifetime_events": self.lifetime_events,
        }


def dump_results(results: List[RequestResult], path: str) -> None:
    """Write a .exp JSON dump (reference benchmark_serving_distserve.py
    naming <prefix>-<num_prompts>-<rate>.exp)."""
    with open(path, "w") as f:
        json.dump([r.to_dict() for r in results], f)


def percentile(values: List[float], p: float) -> float:
    if not values:
        return float("nan")
    values = sorted(values)
    idx = min(int(len(values) * p / 100.0), len(values) - 1)
    return values[idx]


def slo_attainment(results: List[RequestResult], ttft_slo: float,
                   tpot_slo: float) -> float:
    """Fraction of requests meeting BOTH latency SLOs (reference
    benchmark_utils.py:158-172)."""
    ok = 0
    n = 0
    for r in results:
        if r.ftl is None:
            continue
        n += 1
        tpot = r.tpot if r.tpot is not None else 0.0
        if r.ftl <= ttft_slo and tpot <= tpot_slo:
            ok += 1
    return ok / max(n, 1)


def summarize(results: List[RequestResult]) -> dict:
    lat = [r.latency for r in results]
    ftl = [r.ftl for r in results if r.ftl is not None]
    tpot = [r.tpot for r in results if r.tpot is not None]
    total_output = sum(r.output_len for r in results)
    total_input = sum(r.prompt_len for r in results)
    duration = (max(r.end_time for r in results) -
                min(r.start_time for r in results)) if results else 0.0
    return {
        "num_requests": len(results),
        "duration_s": duration,
        "request_throughput": len(results) / duration if duration else 0,
        "input_token_throughput": total_input / duration if duration else 0,
        "output_token_throughput": (total_output / duration
                                    if duration else 0),
        "mean_latency": sum(lat) / max(len(lat), 1),
        "p50_latency": percentile(lat, 50),
        "p99_latency": percentile(lat, 99),
        "mean_ttft": sum(ftl) / max(len(ftl), 1),
        "p50_ttft": percentile(ftl, 50),
        "p99_ttft": percentile(ftl, 99),
        "mean_tpot": sum(tpot) / max(len(tpot), 1),
        "p50_tpot": percentile(tpot, 50),
        "p99_tpot": percentile(tpot, 99),
    }


def sample_arrivals(num: int, rate: float, distribution: str = "poisson",
                    seed: int = 0, cv: float = 1.0) -> List[float]:
    """Arrival offsets in seconds (reference distserve harness: poisson /
    gamma / uniform / burst arrivals, benchmark_serving_distserve.py)."""
    import numpy as np
    rng = np.random.RandomState(seed)
    if rate <= 0 or distribution == "burst":
        return [0.0] * num
    if distribution == "poisson":
        gaps = rng.exponential(1.0 / rate, size=num)
    elif distribution == "gamma":
        shape = 1.0 / (cv * cv)
        gaps = rng.gamma(shape, cv * cv / rate, size=num)
    elif distribution == "uniform":
        gaps = np.full(num, 1.0 / rate)
    else:
        raise ValueError(f"Unknown arrival distribution {distribution}")
    return np.cumsum(gaps).tolist()
