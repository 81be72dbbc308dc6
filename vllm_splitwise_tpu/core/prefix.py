"""Shared-prompt-prefix pool (reference role: vllm/prefix.py).

Lets callers mark the first ``prefix_pos`` tokens of a prompt as a shared
prefix (e.g. a long system prompt); the pool dedups by token-hash so the
scheduler/model runner can reuse the prefix's KV blocks across requests.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


class Prefix:
    """One shared prefix: token ids (truncated to a block multiple) plus
    the physical block table once its KV has been computed."""

    def __init__(self, token_ids: Sequence[int], block_size: int) -> None:
        self.token_ids = tuple(token_ids)
        self.block_size = block_size
        self.length = len(token_ids)
        self.hash = hash(self.token_ids)
        assert self.length % block_size == 0
        self.block_table: Optional[List] = None
        self.computed = False

    @property
    def allocated(self) -> bool:
        return self.block_table is not None

    def get_num_blocks(self) -> int:
        return self.length // self.block_size

    def get_block_numbers(self) -> List[int]:
        assert self.block_table is not None
        return [block.block_number for block in self.block_table]

    def get_length(self) -> int:
        return self.length

    def __hash__(self) -> int:
        return self.hash

    def set_block_table(self, block_table: List) -> None:
        self.block_table = block_table.copy()


class PrefixPool:
    """Dedup table of shared prefixes keyed by token-content hash."""

    def __init__(self, block_size: int) -> None:
        self.prefixes: Dict[int, Prefix] = {}
        self.block_size = block_size

    def _truncate_token_ids(self, token_ids: Sequence[int]) -> Tuple[int, ...]:
        new_length = len(token_ids) // self.block_size * self.block_size
        return tuple(token_ids[:new_length])

    def add_or_get_prefix(self, token_ids: Sequence[int]) -> Optional[Prefix]:
        token_ids = self._truncate_token_ids(token_ids)
        if len(token_ids) == 0:
            # Prefix shorter than one block: nothing to share.
            return None
        prefix = Prefix(token_ids, self.block_size)
        prefix_hash = hash(prefix)
        if prefix_hash not in self.prefixes:
            self.prefixes[prefix_hash] = prefix
        return self.prefixes[prefix_hash]
