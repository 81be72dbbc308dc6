"""Parked-page table: eviction policies for reusable cached KV pages.

Role parity with the reference's ``vllm/core/evictor.py``.  When prefix
caching is on, a page whose refcount drops to zero is not returned to a
free list — it is *parked* here, still holding its content, so a later
prompt with the same prefix hash can resurrect it for free.  Only when
the pool must mint a page and none are unminted does a parked page get
evicted and recycled.

Entries are ``(page_id, PageMeta)`` pairs keyed by content hash; the
pool owns the metadata records and this table never mutates them except
to clear ``computed`` on eviction (the page's content is about to be
overwritten).

Victim policy (LRU): smallest ``last_accessed`` wins; among equals the
page caching the LONGEST prefix goes first (a long prefix is the least
likely to be shared by future requests); remaining ties keep park
order.  The native engine (csrc/block_engine.cpp Evictor) implements
the identical order so both control planes stay bit-compatible.
"""
from __future__ import annotations

import enum
from typing import Dict, Tuple

from vllm_splitwise_tpu.block import PageMeta


class EvictionPolicy(enum.Enum):
    LRU = enum.auto()
    RANDOM = enum.auto()


class ParkedPages:
    """Base: an insertion-ordered hash -> (page, meta) table."""

    def __init__(self) -> None:
        self._by_hash: Dict[int, Tuple[int, PageMeta]] = {}

    def __contains__(self, content_hash: int) -> bool:
        return content_hash in self._by_hash

    def __len__(self) -> int:
        return len(self._by_hash)

    def park(self, page: int, meta: PageMeta) -> None:
        self._by_hash[meta.content_hash] = (page, meta)

    def resurrect(self, content_hash: int) -> int:
        """Hash hit on a parked page: hand it back, content intact."""
        try:
            page, _ = self._by_hash.pop(content_hash)
        except KeyError:
            raise ValueError(
                f"no parked page holds hash {content_hash}") from None
        return page

    def _pick_victim(self) -> Tuple[int, PageMeta]:
        raise NotImplementedError

    def evict(self) -> Tuple[int, PageMeta]:
        """Recycle a parked page; its cached content is forfeit."""
        if not self._by_hash:
            raise ValueError("No usable cache memory left")
        page, meta = self._pick_victim()
        del self._by_hash[meta.content_hash]
        meta.computed = False
        return page, meta


class LRUParkedPages(ParkedPages):

    def _pick_victim(self) -> Tuple[int, PageMeta]:
        # Insertion-ordered scan with strictly-better replacement: the
        # earliest-parked entry wins full ties, matching the native
        # engine's enter_seq tie-break.
        victim = None
        for entry in self._by_hash.values():
            if victim is None:
                victim = entry
                continue
            _, meta = entry
            _, vmeta = victim
            if meta.last_accessed != vmeta.last_accessed:
                if meta.last_accessed < vmeta.last_accessed:
                    victim = entry
            elif meta.num_hashed_tokens > vmeta.num_hashed_tokens:
                victim = entry
        return victim


class RandomParkedPages(ParkedPages):
    """'Random' = arbitrary: the first parked entry (matches reference)."""

    def _pick_victim(self) -> Tuple[int, PageMeta]:
        return next(iter(self._by_hash.values()))


def make_parked_pages(policy: EvictionPolicy) -> ParkedPages:
    if policy == EvictionPolicy.LRU:
        return LRUParkedPages()
    if policy == EvictionPolicy.RANDOM:
        return RandomParkedPages()
    raise ValueError(f"Unknown cache eviction policy: {policy}")


# Historical aliases (the first round shipped these names).
Evictor = ParkedPages
LRUEvictor = LRUParkedPages
RandomEvictor = RandomParkedPages
make_evictor = make_parked_pages
