"""BlockSpaceManager backed by the native (C++) block engine.

Same observable behavior as the pure-Python
:class:`~vllm_splitwise_tpu.core.block_manager.BlockSpaceManager`
(role-parity with reference vllm/core/block_manager.py:130-487), but all
per-step bookkeeping — ref counts, free lists, prefix-cache hash maps,
the LRU evictor, CoW and swap planning — runs in ``csrc/block_engine.cpp``.
This is the serving control plane's hot path: it is called for every
running sequence on every scheduler step, so it is native code here just
as the reference keeps its hot paths in csrc/.

The adapter stays a thin shim: it derives integer facts from the
Sequence/SequenceGroup data model (lengths, content hashes) and forwards
them; no block state lives on the Python side.  Equivalence with the
Python manager is enforced by tests/core/test_native_block_engine.py.
"""
from __future__ import annotations

from os.path import commonprefix
from typing import Dict, List, Optional, Tuple

from vllm_splitwise_tpu.core.block_manager import AllocStatus
from vllm_splitwise_tpu.sequence import Sequence, SequenceGroup, SequenceStatus

_STATUS = {0: AllocStatus.OK, 1: AllocStatus.LATER, 2: AllocStatus.NEVER}


def _load_engine_class():
    from vllm_splitwise_tpu.core._native_build import load_extension
    mod = load_extension("_block_engine", "block_engine.cpp")
    return getattr(mod, "BlockEngine", None) if mod else None


def native_engine_available() -> bool:
    return _load_engine_class() is not None


class NativeBlockSpaceManager:
    """Drop-in replacement for BlockSpaceManager (native bookkeeping)."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        enable_caching: bool = False,
    ) -> None:
        cls = _load_engine_class()
        if cls is None:
            raise RuntimeError("native block engine unavailable")
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks
        self.enable_caching = enable_caching
        assert watermark >= 0.0
        self.watermark = watermark
        self.watermark_blocks = int(watermark * num_gpu_blocks)
        window_blocks = -1
        if sliding_window is not None:
            assert sliding_window % block_size == 0, (sliding_window,
                                                      block_size)
            window_blocks = sliding_window // block_size
        self.block_sliding_window = (window_blocks
                                     if window_blocks >= 0 else None)
        self._eng = cls(block_size, num_gpu_blocks, num_cpu_blocks,
                        self.watermark_blocks, window_blocks,
                        enable_caching)

    # ---- allocation (prompt phase) ----

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        return _STATUS[self._eng.can_allocate(
            seq.num_logical_blocks())]

    def allocate(self, seq_group: SequenceGroup) -> None:
        waiting = seq_group.get_seqs(status=SequenceStatus.WAITING)
        seq = waiting[0]
        n = seq.num_logical_blocks()
        if self.enable_caching:
            hashes = [seq.hash_of_block(i) for i in range(n)]
            hashed = [seq.num_hashed_tokens_of_block(i) for i in range(n)]
        else:
            hashes = []
            hashed = []
        # Ref count = the seqs receiving the table (see the Python
        # manager's allocate: counting finished siblings after a
        # recompute-preemption leaks the blocks forever).
        self._eng.allocate([s.seq_id for s in waiting], n, hashes, hashed,
                           len(waiting))

    # ---- decode-phase growth ----

    def can_append_slot(self, seq_group: SequenceGroup) -> bool:
        running = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        if self.enable_caching or not hasattr(self._eng,
                                              "num_need_append"):
            # Conservative under prefix caching / stale cached .so.
            return self._eng.can_append_slot(len(running))
        # Exact need (mirrors block_manager.BlockSpaceManager): lookahead-
        # extended tables and sliding-window reuse consume nothing.
        need = self._eng.num_need_append(
            [s.seq_id for s in running],
            [s.num_logical_blocks() for s in running])
        return self._eng.can_append_slot(need)

    def append_slot(self, seq: Sequence) -> Optional[Tuple[int, int]]:
        n = seq.num_logical_blocks()
        last_full = seq.num_tokens % self.block_size == 0
        full_hash = 0
        hashed_last = 0
        if self.enable_caching:
            hashed_last = seq.num_hashed_tokens_of_block(n - 1)
            if last_full:
                full_hash = seq.hash_of_block(n - 1)
        return self._eng.append_slot(seq.seq_id, n, last_full, full_hash,
                                     hashed_last)

    def can_append_slots(self, seq_group: SequenceGroup,
                         lookahead: int = 1) -> bool:
        """Worst-case page bound for a multi-step decode window of
        ``lookahead`` tokens per running sequence (mirrors
        block_manager.BlockSpaceManager.can_append_slots)."""
        if lookahead <= 1:
            return self.can_append_slot(seq_group)
        per_seq = -(-lookahead // self.block_size) + 1
        num_seqs = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return num_seqs * per_seq <= self._eng.num_free_gpu()

    def can_reserve_window(self, num_seqs: int, lookahead: int) -> bool:
        """Batch-wide lookahead reservation bound (see
        block_manager.BlockSpaceManager.can_reserve_window)."""
        per_seq = -(-lookahead // self.block_size) + 1
        return num_seqs * per_seq <= self._eng.num_free_gpu()

    def append_slots(self, seq: Sequence,
                     lookahead: int = 1) -> List[Tuple[int, int]]:
        """Reserve slots for the next ``lookahead`` token writes (mirrors
        block_manager.BlockSpaceManager.append_slots; lookahead pages are
        plain unhashed allocations appended by the native engine)."""
        cows: List[Tuple[int, int]] = []
        n_logical = seq.num_logical_blocks()
        if len(self._eng.get_block_table(seq.seq_id)) <= n_logical:
            cow = self.append_slot(seq)
            if cow is not None:
                cows.append(cow)
        if lookahead > 1:
            needed = -(-(seq.num_tokens - 1 + lookahead) // self.block_size)
            self._eng.extend_table(seq.seq_id, needed)
        return cows

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self._eng.fork(parent_seq.seq_id, child_seq.seq_id)

    # ---- swap ----

    def _unfinished_ids(self, seq_group: SequenceGroup) -> List[int]:
        return [
            seq.seq_id for seq in seq_group.get_seqs()
            if not seq.is_finished()
        ]

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        num_swapped = seq_group.num_seqs(status=SequenceStatus.SWAPPED)
        return self._eng.can_swap_in(self._unfinished_ids(seq_group),
                                     num_swapped)

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        ids = [
            seq.seq_id
            for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED)
        ]
        return dict(self._eng.swap_in(ids))

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        return self._eng.can_swap_out(self._unfinished_ids(seq_group))

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        ids = [
            seq.seq_id
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING)
        ]
        return dict(self._eng.swap_out(ids))

    # ---- free / introspection ----

    def free(self, seq: Sequence) -> None:
        self._eng.free_seq(seq.seq_id)

    def reset(self) -> None:
        self._eng.reset()

    def get_block_table(self, seq: Sequence) -> List[int]:
        return self._eng.get_block_table(seq.seq_id)

    def get_num_free_gpu_blocks(self) -> int:
        return self._eng.num_free_gpu()

    def get_num_free_cpu_blocks(self) -> int:
        return self._eng.num_free_cpu()

    # ---- prefix caching (computed-block tracking) ----

    def access_all_blocks_in_seq(self, seq: Sequence,
                                 access_time: float) -> None:
        if not self.enable_caching:
            return
        self._eng.access_all(seq.seq_id, access_time)

    def compute_full_blocks_in_seq(self, seq: Sequence) -> None:
        max_full_block = seq.num_tokens // self.block_size - 1
        self._eng.compute_full_blocks(seq.seq_id, max_full_block)

    def get_all_computed_blocks(self, seq: Sequence) -> List[int]:
        return self._eng.get_all_computed(seq.seq_id)

    def get_common_computed_block_ids(
            self, seq_group: SequenceGroup) -> List[int]:
        if not self.enable_caching:
            return []
        ids_list = [
            self.get_all_computed_blocks(seq)
            for seq in seq_group.get_seqs()
            if not seq.is_finished()
        ]
        if not ids_list:
            return []
        return commonprefix([ids for ids in ids_list])

    def mark_blocks_as_computed(self, seq_group: SequenceGroup) -> None:
        if not self.enable_caching:
            return
        for seq in seq_group.get_seqs():
            if not seq.is_finished():
                self.compute_full_blocks_in_seq(seq)


def make_block_space_manager(*args, use_native: Optional[bool] = None,
                             **kwargs):
    """Pick the native manager when the extension builds, else Python.

    ``use_native=None`` auto-selects; VLLM_TPU_DISABLE_NATIVE=1 forces
    the Python implementation (see core/_native_build.py).
    """
    from vllm_splitwise_tpu.core.block_manager import BlockSpaceManager
    if use_native is None:
        use_native = native_engine_available()
    if use_native:
        try:
            return NativeBlockSpaceManager(*args, **kwargs)
        except RuntimeError:
            pass
    return BlockSpaceManager(*args, **kwargs)
