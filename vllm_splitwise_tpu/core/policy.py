"""Scheduling priority policies (reference role: vllm/core/policy.py).

A policy is just a priority function ``(now, seq_group) -> float``; the
class wrapper exists for API parity and for stateful policies later.
"""
from __future__ import annotations

from collections import deque
from typing import Callable, Deque, Dict

from vllm_splitwise_tpu.sequence import SequenceGroup

PriorityFn = Callable[[float, SequenceGroup], float]


def _fcfs_priority(now: float, seq_group: SequenceGroup) -> float:
    # Oldest arrival wins: priority grows with time spent waiting.
    return now - seq_group.metrics.arrival_time


_PRIORITY_FNS: Dict[str, PriorityFn] = {"fcfs": _fcfs_priority}


class Policy:

    priority_fn: PriorityFn = None

    def get_priority(self, now: float, seq_group: SequenceGroup) -> float:
        if self.priority_fn is None:
            raise NotImplementedError
        return type(self).priority_fn(now, seq_group)

    def sort_by_priority(self, now: float,
                         seq_groups: Deque[SequenceGroup]
                         ) -> Deque[SequenceGroup]:
        ranked = sorted(seq_groups, reverse=True,
                        key=lambda sg: self.get_priority(now, sg))
        return deque(ranked)


class FCFS(Policy):
    priority_fn = staticmethod(_fcfs_priority)


class PolicyFactory:

    _POLICY_REGISTRY = {"fcfs": FCFS}

    @classmethod
    def get_policy(cls, policy_name: str, **kwargs) -> Policy:
        return cls._POLICY_REGISTRY[policy_name](**kwargs)
