"""Logical and physical KV-cache block records.

Role-parity with the reference's ``vllm/block.py``: a logical block maps a
slice of a sequence's tokens; a physical block is one page of the paged KV
cache on a device, with ref-counting for copy-on-write and a content hash
for prefix caching.
"""
from __future__ import annotations

from typing import List

from vllm_splitwise_tpu.utils import Device

_BLANK_TOKEN_ID = -1
DEFAULT_LAST_ACCESSED_TIME = -1.0


class LogicalTokenBlock:
    """A block-size-sized window of a sequence's token ids."""

    def __init__(self, block_number: int, block_size: int) -> None:
        self.block_number = block_number
        self.block_size = block_size
        self.token_ids: List[int] = [_BLANK_TOKEN_ID] * block_size
        self.num_tokens = 0

    def is_empty(self) -> bool:
        return self.num_tokens == 0

    def get_num_empty_slots(self) -> int:
        return self.block_size - self.num_tokens

    def is_full(self) -> bool:
        return self.num_tokens == self.block_size

    def append_tokens(self, token_ids: List[int]) -> None:
        assert len(token_ids) <= self.get_num_empty_slots()
        self.token_ids[self.num_tokens:self.num_tokens + len(token_ids)] = token_ids
        self.num_tokens += len(token_ids)

    def get_token_ids(self) -> List[int]:
        return self.token_ids[:self.num_tokens]

    def get_last_token_id(self) -> int:
        assert self.num_tokens > 0
        return self.token_ids[self.num_tokens - 1]


class PhysicalTokenBlock:
    """One page of the paged KV cache on a device."""

    def __init__(
        self,
        device: Device,
        block_number: int,
        block_size: int,
        block_hash: int = -1,
        num_hashed_tokens: int = 0,
    ) -> None:
        self.device = device
        self.block_number = block_number
        self.block_size = block_size
        # Content hash for prefix caching; -1 means "not a full/hashable
        # prefix block".
        self.block_hash = block_hash
        self.num_hashed_tokens = num_hashed_tokens
        self.ref_count = 0
        self.last_accessed = DEFAULT_LAST_ACCESSED_TIME
        self.computed = False

    def __repr__(self) -> str:
        return (f"PhysicalTokenBlock(device={self.device}, "
                f"block_number={self.block_number}, "
                f"ref_count={self.ref_count}, hash={self.block_hash}, "
                f"computed={self.computed})")


# A block table: logical block number -> physical block.
BlockTable = List[PhysicalTokenBlock]
