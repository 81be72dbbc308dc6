"""Shared-prompt-prefix pool (reference role: vllm/prefix.py).

API-parity module: callers can mark the leading tokens of a prompt as a
shared prefix (a long system prompt, say) and the pool dedups them by
content hash so their KV blocks can be reused across requests.  The
engine's automatic prefix reuse lives in the block manager's
computed-block hashing (``--enable-prefix-caching``); this explicit pool
mirrors the reference's opt-in surface.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple


@dataclasses.dataclass
class Prefix:
    """One shared prefix: token ids (a whole number of KV pages) plus the
    physical block table once its KV exists."""

    token_ids: Tuple[int, ...]
    block_size: int
    block_table: Optional[List] = None
    computed: bool = False

    def __post_init__(self) -> None:
        self.token_ids = tuple(self.token_ids)
        if len(self.token_ids) % self.block_size:
            raise ValueError("prefix length must be a page multiple")

    # -- identity is token content --
    def __hash__(self) -> int:
        return hash(self.token_ids)

    # -- geometry --
    @property
    def length(self) -> int:
        return len(self.token_ids)

    def get_length(self) -> int:
        return self.length

    def get_num_blocks(self) -> int:
        return self.length // self.block_size

    # -- physical placement --
    @property
    def allocated(self) -> bool:
        return self.block_table is not None

    def set_block_table(self, block_table: List) -> None:
        self.block_table = list(block_table)

    def get_block_numbers(self) -> List[int]:
        if self.block_table is None:
            raise ValueError("prefix has no block table yet")
        return [block.block_number for block in self.block_table]


class PrefixPool:
    """Dedup table of shared prefixes keyed by token-content hash."""

    def __init__(self, block_size: int) -> None:
        self.block_size = block_size
        self.prefixes: Dict[int, Prefix] = {}

    def add_or_get_prefix(self,
                          token_ids: Sequence[int]) -> Optional[Prefix]:
        # Only whole pages are shareable; drop the page-tail remainder.
        usable = len(token_ids) // self.block_size * self.block_size
        if not usable:
            return None
        candidate = Prefix(tuple(token_ids[:usable]), self.block_size)
        return self.prefixes.setdefault(hash(candidate), candidate)
