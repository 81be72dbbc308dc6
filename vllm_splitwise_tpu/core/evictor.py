"""Eviction policies for cached (prefix-reusable) KV blocks.

Role-parity with reference ``vllm/core/evictor.py``: an Evictor holds
zero-ref-count blocks that may be resurrected by content hash; LRU evicts
the oldest ``last_accessed`` (ties broken by preferring the block caching
the most tokens), Random evicts arbitrarily.
"""
from __future__ import annotations

import enum
from abc import ABC, abstractmethod
from typing import Dict

from vllm_splitwise_tpu.block import PhysicalTokenBlock


class EvictionPolicy(enum.Enum):
    LRU = enum.auto()
    RANDOM = enum.auto()


class Evictor(ABC):

    @abstractmethod
    def __contains__(self, block_hash: int) -> bool:
        ...

    @abstractmethod
    def evict(self) -> PhysicalTokenBlock:
        """Remove and return the next victim block."""
        ...

    @abstractmethod
    def add(self, block: PhysicalTokenBlock) -> None:
        ...

    @abstractmethod
    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        """Resurrect a cached block by hash (cache hit on a free block)."""
        ...

    @property
    @abstractmethod
    def num_blocks(self) -> int:
        ...


class LRUEvictor(Evictor):
    """Evict the least-recently-accessed block; among equally old blocks,
    prefer evicting the one with the most hashed tokens (longest prefix —
    least likely to be a common prefix shared by future requests)."""

    def __init__(self) -> None:
        self.free_table: Dict[int, PhysicalTokenBlock] = {}

    def __contains__(self, block_hash: int) -> bool:
        return block_hash in self.free_table

    def evict(self) -> PhysicalTokenBlock:
        if not self.free_table:
            raise ValueError("No usable cache memory left")
        evicted = next(iter(self.free_table.values()))
        for block in self.free_table.values():
            if evicted.last_accessed < block.last_accessed:
                continue
            if (evicted.last_accessed > block.last_accessed
                    or evicted.num_hashed_tokens < block.num_hashed_tokens):
                evicted = block
        del self.free_table[evicted.block_hash]
        evicted.computed = False
        return evicted

    def add(self, block: PhysicalTokenBlock) -> None:
        self.free_table[block.block_hash] = block

    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        if block_hash not in self.free_table:
            raise ValueError("Attempting to remove block that's not in the evictor")
        block = self.free_table.pop(block_hash)
        return block

    @property
    def num_blocks(self) -> int:
        return len(self.free_table)


class RandomEvictor(Evictor):

    def __init__(self) -> None:
        self.free_table: Dict[int, PhysicalTokenBlock] = {}

    def __contains__(self, block_hash: int) -> bool:
        return block_hash in self.free_table

    def evict(self) -> PhysicalTokenBlock:
        if not self.free_table:
            raise ValueError("No usable cache memory left")
        block = next(iter(self.free_table.values()))
        block.computed = False
        del self.free_table[block.block_hash]
        return block

    def add(self, block: PhysicalTokenBlock) -> None:
        self.free_table[block.block_hash] = block

    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        if block_hash not in self.free_table:
            raise ValueError("Attempting to remove block that's not in the evictor")
        return self.free_table.pop(block_hash)

    @property
    def num_blocks(self) -> int:
        return len(self.free_table)


def make_evictor(policy: EvictionPolicy) -> Evictor:
    if policy == EvictionPolicy.LRU:
        return LRUEvictor()
    if policy == EvictionPolicy.RANDOM:
        return RandomEvictor()
    raise ValueError(f"Unknown cache eviction policy: {policy}")
