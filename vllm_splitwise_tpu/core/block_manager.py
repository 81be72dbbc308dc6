"""Paged KV-cache page accounting (host side).

Role parity with the reference's ``vllm/core/block_manager.py``:
ref-counted physical pages, copy-on-write on fork, device<->host swap
planning, content-hash prefix caching with LRU eviction, and
computed-page tracking.  This module only PLANS page movements — the
worker's CacheEngine executes them on device arrays.

The design is integer-first rather than object-first.  Where the
reference passes ``PhysicalTokenBlock`` objects through tables, free
lists and swap maps, here a page is its integer index into the device
cache and every table is a plain ``List[int]`` — exactly the array the
TPU paged-attention kernel consumes, and exactly the wire format of the
native C++ engine (csrc/block_engine.cpp).  All per-page state lives
inside :class:`PagePool`; the equivalence suite
(tests/core/test_native_block_engine.py) drives this manager and the
native engine through identical workloads and requires bit-identical
page numbering, so allocation order here is deliberately deterministic:

* uncached pools hand out the HIGHEST free page first (LIFO stack over
  ``range(num_pages)``) and refill in release order;
* caching pools mint page numbers upward from zero and only then
  recycle parked pages via the LRU policy in ``core/evictor.py``.
"""
from __future__ import annotations

import enum
from itertools import count, takewhile
from os.path import commonprefix
from typing import Dict, Iterable, List, Optional, Set, Tuple

from vllm_splitwise_tpu.block import PageMeta
from vllm_splitwise_tpu.core.evictor import (EvictionPolicy,
                                             make_parked_pages)
from vllm_splitwise_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_splitwise_tpu.utils import Device


class PagePool:
    """Ref-counted pool of integer cache pages for one memory tier.

    Two modes:

    * plain (``enable_caching=False``): a LIFO free stack; pages carry
      no metadata.
    * caching: every page has a :class:`PageMeta`; zero-ref pages park
      in an eviction table keyed by content hash instead of freeing,
      so identical prefixes are deduplicated across requests.
    """

    def __init__(
        self,
        tier: Device,
        num_pages: int,
        enable_caching: bool = False,
        eviction_policy: EvictionPolicy = EvictionPolicy.LRU,
    ) -> None:
        self.tier = tier
        self.capacity = num_pages
        self.caching = enable_caching

        self._refs: Dict[int, int] = {}
        if enable_caching:
            self._minted = 0
            self._meta: Dict[int, PageMeta] = {}
            self._live_by_hash: Dict[int, int] = {}
            self._parked = make_parked_pages(eviction_policy)
            # Placeholder hashes for pages whose tail block is not yet
            # a reusable full-block prefix.
            self._auto_hash = count()
        else:
            self._free_stack: List[int] = list(range(num_pages))

    # ---- allocation --------------------------------------------------

    def alloc(self) -> int:
        """Take one plain page (refcount 1)."""
        assert not self.caching
        if not self._free_stack:
            raise ValueError("Out of memory! No free blocks are available.")
        page = self._free_stack.pop()
        self._refs[page] = 1
        return page

    def alloc_cached(self, content_hash: Optional[int],
                     num_hashed_tokens: int = 0) -> int:
        """Take (or adopt) a page for the given content hash.

        Hash hits — live or parked — share the existing page.  Misses
        mint a fresh page number, or recycle an eviction victim once
        every number is in circulation.
        """
        assert self.caching
        if content_hash is None:
            content_hash = next(self._auto_hash)
        if content_hash in self._parked:
            page = self._parked.resurrect(content_hash)
            self._live_by_hash[content_hash] = page
            self._refs[page] = 1
            return page
        page = self._live_by_hash.get(content_hash)
        if page is not None:
            self._refs[page] += 1
            return page
        page = self._mint(content_hash, num_hashed_tokens)
        self._live_by_hash[content_hash] = page
        self._refs[page] = 1
        return page

    def _mint(self, content_hash: int, num_hashed_tokens: int) -> int:
        if self._minted < self.capacity:
            page = self._minted
            self._minted += 1
            self._meta[page] = PageMeta(content_hash, num_hashed_tokens)
            return page
        page, meta = self._parked.evict()
        # The victim keeps its stale LRU stamp (native-engine parity);
        # only identity fields change.
        meta.content_hash = content_hash
        meta.num_hashed_tokens = num_hashed_tokens
        return page

    def retain(self, page: int, extra: int = 1) -> None:
        self._refs[page] += extra

    def set_refs(self, page: int, n: int) -> None:
        """Prompt allocation hands one table to n sibling sequences."""
        self._refs[page] = n

    def release(self, page: int) -> None:
        refs = self._refs.get(page, 0)
        if refs == 0:
            raise ValueError(f"Double free! page {page} is already free.")
        self._refs[page] = refs - 1
        if refs > 1:
            return
        if self.caching:
            meta = self._meta[page]
            del self._live_by_hash[meta.content_hash]
            self._parked.park(page, meta)
        else:
            self._free_stack.append(page)

    # ---- queries -----------------------------------------------------

    def refs(self, page: int) -> int:
        return self._refs.get(page, 0)

    def free_count(self) -> int:
        if self.caching:
            return self.capacity - self._minted + len(self._parked)
        return len(self._free_stack)

    def has_hash(self, content_hash: int) -> bool:
        return (content_hash in self._live_by_hash
                or content_hash in self._parked)

    def meta(self, page: int) -> PageMeta:
        return self._meta[page]

    def rehash(self, page: int, new_hash: int) -> None:
        """A page's tail block just filled: promote its placeholder hash
        to the real content hash so future prompts can hit it."""
        assert self.caching and not self.has_hash(new_hash)
        meta = self._meta[page]
        del self._live_by_hash[meta.content_hash]
        meta.content_hash = new_hash
        self._live_by_hash[new_hash] = page


class AllocStatus(enum.Enum):
    """Verdict on admitting a new prompt right now.

    OK: fits.  LATER: retry once pages free up.  NEVER: the prompt can
    never fit this cache — fail the request instead of queueing it.
    """
    OK = enum.auto()
    LATER = enum.auto()
    NEVER = enum.auto()


class PageTable:
    """One sequence's logical-index -> physical-page map.

    A table lives wholly in one tier at a time; swap rewrites it against
    the other tier's pool.
    """

    __slots__ = ("pool", "ids")

    def __init__(self, pool: PagePool, ids: List[int]) -> None:
        self.pool = pool
        self.ids = ids


class BlockSpaceManager:
    """Plans every page movement the scheduler decides on."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        enable_caching: bool = False,
    ) -> None:
        assert watermark >= 0.0
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks
        self.watermark = watermark
        self.watermark_blocks = int(watermark * num_gpu_blocks)
        self.enable_caching = enable_caching

        self.block_sliding_window: Optional[int] = None
        if sliding_window is not None:
            assert sliding_window % block_size == 0, (sliding_window,
                                                      block_size)
            self.block_sliding_window = sliding_window // block_size

        self.gpu_pool = PagePool(Device.TPU, num_gpu_blocks,
                                 enable_caching=enable_caching)
        self.cpu_pool = PagePool(Device.CPU, num_cpu_blocks,
                                 enable_caching=enable_caching)
        self.block_tables: Dict[int, PageTable] = {}

    # ---- prompt admission ---------------------------------------------

    def _prompt_page_demand(self, seq: Sequence) -> int:
        demand = seq.num_logical_blocks()
        if self.block_sliding_window is not None:
            demand = min(demand, self.block_sliding_window)
        return demand

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        demand = self._prompt_page_demand(seq)
        if self.num_total_gpu_blocks - demand < self.watermark_blocks:
            return AllocStatus.NEVER
        if (self.gpu_pool.free_count() - demand >= self.watermark_blocks):
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        waiting = seq_group.get_seqs(status=SequenceStatus.WAITING)
        seq = waiting[0]
        window = self.block_sliding_window
        ids: List[int] = []
        for logical_idx in range(seq.num_logical_blocks()):
            if window is not None and logical_idx >= window:
                # Past the attention horizon: recycle table slots
                # cyclically, no new page.
                ids.append(ids[logical_idx % window])
            elif self.enable_caching:
                ids.append(
                    self.gpu_pool.alloc_cached(
                        seq.hash_of_block(logical_idx),
                        seq.num_hashed_tokens_of_block(logical_idx)))
            else:
                page = self.gpu_pool.alloc()
                # The table below is handed to every WAITING sibling.
                # Deliberately not num_seqs(): after a recompute
                # preemption the group may drag finished siblings whose
                # refs would never be released.
                self.gpu_pool.set_refs(page, len(waiting))
                ids.append(page)
        for s in waiting:
            self.block_tables[s.seq_id] = PageTable(self.gpu_pool, list(ids))

    # ---- decode growth --------------------------------------------------

    def can_append_slot(self, seq_group: SequenceGroup) -> bool:
        running = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        if self.enable_caching:
            # Conservative bound: tail-block promotion may consult the
            # cached pool, so assume one fresh page per sequence.
            return len(running) <= self.gpu_pool.free_count()
        # Exact demand: a fresh page is needed only when the table lags
        # the sequence's logical blocks (and isn't recycling a sliding-
        # window slot), or when the tail page is shared (CoW pending).
        # Tables pre-extended by a lookahead window need nothing.
        demand = 0
        for seq in running:
            table = self.block_tables[seq.seq_id]
            if len(table.ids) < seq.num_logical_blocks():
                if (self.block_sliding_window is not None
                        and len(table.ids) >= self.block_sliding_window):
                    continue
                demand += 1
            elif table.ids and self.gpu_pool.refs(table.ids[-1]) > 1:
                demand += 1
        return demand <= self.gpu_pool.free_count()

    def can_append_slots(self, seq_group: SequenceGroup,
                         lookahead: int = 1) -> bool:
        """Worst-case page bound for a multi-step decode window of
        ``lookahead`` tokens per running sequence."""
        if lookahead <= 1:
            return self.can_append_slot(seq_group)
        pages_per_seq = -(-lookahead // self.block_size) + 1
        n = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return n * pages_per_seq <= self.gpu_pool.free_count()

    def can_reserve_window(self, num_seqs: int, lookahead: int) -> bool:
        """Batch-wide reservation bound, checked ONCE before the
        scheduler extends any table for a multi-step decode window."""
        pages_per_seq = -(-lookahead // self.block_size) + 1
        return num_seqs * pages_per_seq <= self.gpu_pool.free_count()

    def _alloc_tail_page(self, seq: Sequence) -> int:
        """A page for the sequence's newest logical block."""
        if not self.enable_caching:
            return self.gpu_pool.alloc()
        tail = seq.num_logical_blocks() - 1
        full = seq.num_tokens % self.block_size == 0
        return self.gpu_pool.alloc_cached(
            seq.hash_of_block(tail) if full else None,
            seq.num_hashed_tokens_of_block(tail))

    def append_slot(self, seq: Sequence) -> Optional[Tuple[int, int]]:
        """Make room for the sequence's next token write.

        Returns a ``(src_page, dst_page)`` pair when the shared tail
        page had to be copied (copy-on-write), else ``None``.
        """
        table = self.block_tables[seq.seq_id]
        ids = table.ids
        window = self.block_sliding_window

        if len(ids) < seq.num_logical_blocks():
            # Crossed into a new logical block.
            if window is not None and len(ids) >= window:
                ids.append(ids[len(ids) % window])
            else:
                ids.append(self._alloc_tail_page(seq))
            return None

        tail = ids[-1]
        assert table.pool is self.gpu_pool
        if self.gpu_pool.refs(tail) == 1:
            # Sole owner: write in place.  If the block just filled,
            # promote its placeholder hash so the prefix becomes
            # shareable.
            if self.enable_caching and seq.num_tokens % self.block_size == 0:
                full_hash = seq.hash_of_block(seq.num_logical_blocks() - 1)
                if self.gpu_pool.has_hash(full_hash):
                    # Identical content already cached elsewhere: dedup
                    # onto that page.
                    self.gpu_pool.release(tail)
                    ids[-1] = self.gpu_pool.alloc_cached(full_hash)
                else:
                    self.gpu_pool.rehash(tail, full_hash)
            return None

        # Shared tail: copy-on-write.
        fresh = self._alloc_tail_page(seq)
        ids[-1] = fresh
        self.gpu_pool.release(tail)
        return tail, fresh

    def append_slots(self, seq: Sequence,
                     lookahead: int = 1) -> List[Tuple[int, int]]:
        """Reserve pages for the next ``lookahead`` token writes (a
        multi-step decode window runs that many device steps before the
        host sees a token).

        Lookahead pages beyond the current logical blocks are plain
        unhashed pages — prefix promotion is skipped while the table
        runs ahead, and multi-step windows are restricted to unforked
        groups so no CoW arises on them.
        """
        table = self.block_tables[seq.seq_id]
        cows: List[Tuple[int, int]] = []
        if len(table.ids) <= seq.num_logical_blocks():
            cow = self.append_slot(seq)
            if cow is not None:
                cows.append(cow)
        if lookahead > 1:
            target = -(-(seq.num_tokens - 1 + lookahead) // self.block_size)
            window = self.block_sliding_window
            while len(table.ids) < target:
                if window is not None and len(table.ids) >= window:
                    table.ids.append(table.ids[len(table.ids) % window])
                else:
                    table.ids.append(self.gpu_pool.alloc())
        return cows

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        src = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = PageTable(
            src.pool, list(src.ids))
        for page in dict.fromkeys(src.ids):
            src.pool.retain(page)

    # ---- swap -----------------------------------------------------------

    def _group_pages(self, seq_group: SequenceGroup) -> Set[int]:
        pages: Set[int] = set()
        for seq in seq_group.get_seqs():
            if not seq.is_finished() and seq.seq_id in self.block_tables:
                pages.update(self.block_tables[seq.seq_id].ids)
        return pages

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        demand = (len(self._group_pages(seq_group)) +
                  seq_group.num_seqs(status=SequenceStatus.SWAPPED))
        return (self.gpu_pool.free_count() - demand >=
                self.watermark_blocks)

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        return (len(self._group_pages(seq_group)) <=
                self.cpu_pool.free_count())

    def _swap_tables(self, seqs: Iterable[Sequence], src_pool: PagePool,
                     dst_pool: PagePool) -> Dict[int, int]:
        """Rewrite each table against the destination pool; shared source
        pages map to one shared destination page."""
        mapping: Dict[int, int] = {}
        for seq in seqs:
            table = self.block_tables[seq.seq_id]
            fresh: List[int] = []
            for page in table.ids:
                dst = mapping.get(page)
                if dst is not None:
                    dst_pool.retain(dst)
                else:
                    if dst_pool.caching:
                        meta = src_pool.meta(page)
                        dst = dst_pool.alloc_cached(meta.content_hash,
                                                    meta.num_hashed_tokens)
                    else:
                        dst = dst_pool.alloc()
                    mapping[page] = dst
                fresh.append(dst)
                src_pool.release(page)
            table.pool = dst_pool
            table.ids = fresh
        return mapping

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Returns host_page -> device_page."""
        return self._swap_tables(
            seq_group.get_seqs(status=SequenceStatus.SWAPPED),
            self.cpu_pool, self.gpu_pool)

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Returns device_page -> host_page."""
        return self._swap_tables(
            seq_group.get_seqs(status=SequenceStatus.RUNNING),
            self.gpu_pool, self.cpu_pool)

    # ---- release / introspection ----------------------------------------

    def _release_table(self, table: PageTable) -> None:
        # First-occurrence dedup order: release order decides future
        # page numbering and must match the native engine exactly.
        for page in dict.fromkeys(table.ids):
            table.pool.release(page)

    def free(self, seq: Sequence) -> None:
        table = self.block_tables.pop(seq.seq_id, None)
        if table is not None:
            self._release_table(table)

    def reset(self) -> None:
        for table in self.block_tables.values():
            self._release_table(table)
        self.block_tables.clear()

    def get_block_table(self, seq: Sequence) -> List[int]:
        return list(self.block_tables[seq.seq_id].ids)

    def get_num_free_gpu_blocks(self) -> int:
        return self.gpu_pool.free_count()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_pool.free_count()

    # ---- prefix caching: computed-page tracking ---------------------------

    def access_all_blocks_in_seq(self, seq: Sequence,
                                 access_time: float) -> None:
        if not self.enable_caching:
            return
        pool = self.gpu_pool
        for page in self.block_tables[seq.seq_id].ids:
            pool.meta(page).last_accessed = access_time

    def compute_full_blocks_in_seq(self, seq: Sequence) -> None:
        table = self.block_tables.get(seq.seq_id)
        if table is None:
            return
        # Walk full blocks tail-to-head, stopping at the first already-
        # computed page (everything before it was marked earlier).
        for i in reversed(range(seq.num_tokens // self.block_size)):
            meta = table.pool.meta(table.ids[i])
            if meta.computed:
                break
            meta.computed = True

    def get_all_computed_blocks(self, seq: Sequence) -> List[int]:
        table = self.block_tables.get(seq.seq_id)
        if table is None or not self.enable_caching:
            return []
        pool = table.pool
        # The tail page never counts — it may still be partial.
        return list(
            takewhile(lambda p: pool.meta(p).computed, table.ids[:-1]))

    def get_common_computed_block_ids(
            self, seq_group: SequenceGroup) -> List[int]:
        """Pages computed for EVERY live sequence of the group — prompt
        positions the model runner may skip."""
        if not self.enable_caching:
            return []
        per_seq = [
            self.get_all_computed_blocks(seq)
            for seq in seq_group.get_seqs() if not seq.is_finished()
        ]
        return commonprefix(per_seq) if per_seq else []

    def mark_blocks_as_computed(self, seq_group: SequenceGroup) -> None:
        if not self.enable_caching:
            return
        for seq in seq_group.get_seqs():
            if not seq.is_finished():
                self.compute_full_blocks_in_seq(seq)
