"""Paged KV-cache block bookkeeping (host side).

Role-parity with the reference's ``vllm/core/block_manager.py:13-487``:
ref-counted physical blocks, copy-on-write on fork, device<->host swap
planning, optional content-hash prefix caching with an evictor, and
computed-block tracking.  Pure Python — device arrays are managed by the
worker's CacheEngine; this module only plans block movements.
"""
from __future__ import annotations

import enum
import time
from itertools import count, takewhile
from os.path import commonprefix
from typing import Dict, List, Optional, Sequence as Seq, Set, Tuple

from vllm_splitwise_tpu.block import BlockTable, PhysicalTokenBlock
from vllm_splitwise_tpu.core.evictor import EvictionPolicy, Evictor, make_evictor
from vllm_splitwise_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_splitwise_tpu.utils import Device


class BlockAllocator:
    """Manages free physical blocks of one device.

    With ``enable_caching`` every full block carries a content hash; freed
    blocks park in an evictor and can be resurrected on a hash hit instead
    of recomputed.
    """

    def __init__(
        self,
        device: Device,
        block_size: int,
        num_blocks: int,
        eviction_policy: EvictionPolicy = EvictionPolicy.LRU,
        enable_caching: bool = False,
    ) -> None:
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.enable_caching = enable_caching

        self.current_num_blocks = 0
        self.cached_blocks: Dict[int, PhysicalTokenBlock] = {}
        self.evictor: Evictor = make_evictor(eviction_policy)
        self.default_hash_ctr = count()

        if not enable_caching:
            # Pre-populate a plain free list.
            self.free_blocks: List[PhysicalTokenBlock] = [
                PhysicalTokenBlock(device=device,
                                   block_number=i,
                                   block_size=block_size)
                for i in range(num_blocks)
            ]
        else:
            self.free_blocks = []

    def allocate_block(self, block_hash: int,
                       num_hashed_tokens: int) -> PhysicalTokenBlock:
        if self.current_num_blocks == self.num_blocks:
            block = self.evictor.evict()
            block.block_hash = block_hash
            block.num_hashed_tokens = num_hashed_tokens
            return block
        block = PhysicalTokenBlock(device=self.device,
                                   block_number=self.current_num_blocks,
                                   block_size=self.block_size,
                                   block_hash=block_hash,
                                   num_hashed_tokens=num_hashed_tokens)
        self.current_num_blocks += 1
        return block

    def allocate(self,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if not self.enable_caching:
            if not self.free_blocks:
                raise ValueError("Out of memory! No free blocks are available.")
            block = self.free_blocks.pop()
            block.ref_count = 1
            return block
        if block_hash is None:
            block_hash = next(self.default_hash_ctr)
        if block_hash in self.evictor:
            assert block_hash not in self.cached_blocks
            block = self.evictor.remove(block_hash)
            assert block.ref_count == 0
            self.cached_blocks[block_hash] = block
            block.ref_count += 1
            assert block.block_hash == block_hash
            return block
        if block_hash not in self.cached_blocks:
            self.cached_blocks[block_hash] = self.allocate_block(
                block_hash, num_hashed_tokens)
        block = self.cached_blocks[block_hash]
        assert block.block_hash == block_hash
        block.ref_count += 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            if self.enable_caching:
                assert block.block_hash not in self.evictor
                self.evictor.add(block)
                del self.cached_blocks[block.block_hash]
            else:
                self.free_blocks.append(block)

    def get_num_free_blocks(self) -> int:
        if self.enable_caching:
            return (self.num_blocks - self.current_num_blocks +
                    self.evictor.num_blocks)
        return len(self.free_blocks)

    def contains_block(self, block_hash: int) -> bool:
        return block_hash in self.cached_blocks or block_hash in self.evictor

    def update_hash(self, block_hash: int, block: PhysicalTokenBlock) -> None:
        """Promote a block whose content just became final (block filled)."""
        assert self.enable_caching
        assert not self.contains_block(block_hash)
        old_hash = block.block_hash
        block.block_hash = block_hash
        del self.cached_blocks[old_hash]
        self.cached_blocks[block_hash] = block


class AllocStatus(enum.Enum):
    """Can a new sequence group's prompt be allocated right now?

    OK: yes.  LATER: not now, but possible once memory frees up.
    NEVER: the prompt can never fit — reject the request.
    """
    OK = enum.auto()
    LATER = enum.auto()
    NEVER = enum.auto()


class BlockSpaceManager:
    """Maps sequences' logical blocks to physical device/host blocks."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        enable_caching: bool = False,
    ) -> None:
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks

        self.block_sliding_window: Optional[int] = None
        if sliding_window is not None:
            assert sliding_window % block_size == 0, (sliding_window,
                                                      block_size)
            self.block_sliding_window = sliding_window // block_size

        self.watermark = watermark
        assert watermark >= 0.0
        self.enable_caching = enable_caching
        self.watermark_blocks = int(watermark * num_gpu_blocks)

        self.gpu_allocator = BlockAllocator(Device.TPU,
                                            block_size,
                                            num_gpu_blocks,
                                            enable_caching=enable_caching)
        self.cpu_allocator = BlockAllocator(Device.CPU,
                                            block_size,
                                            num_cpu_blocks,
                                            enable_caching=enable_caching)
        # seq_id -> BlockTable.
        self.block_tables: Dict[int, BlockTable] = {}

    # ---- allocation (prompt phase) ----

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_required_blocks = len(seq.logical_token_blocks)
        if self.block_sliding_window is not None:
            num_required_blocks = min(num_required_blocks,
                                      self.block_sliding_window)
        num_free_gpu_blocks = self.gpu_allocator.get_num_free_blocks()
        if (self.num_total_gpu_blocks - num_required_blocks
                < self.watermark_blocks):
            return AllocStatus.NEVER
        if num_free_gpu_blocks - num_required_blocks >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_prompt_blocks = len(seq.logical_token_blocks)

        block_table: BlockTable = []
        for logical_idx in range(num_prompt_blocks):
            if (self.block_sliding_window is not None
                    and logical_idx >= self.block_sliding_window):
                block = block_table[logical_idx % self.block_sliding_window]
            elif self.enable_caching:
                block = self.gpu_allocator.allocate(
                    seq.hash_of_block(logical_idx),
                    seq.num_hashed_tokens_of_block(logical_idx))
            else:
                block = self.gpu_allocator.allocate()
            # One ref per sequence that RECEIVES the table below (fresh
            # groups have exactly one waiting prompt seq; beam/n>1 forks
            # add refs later via fork()).  NOT num_seqs(): a group
            # re-admitted after recompute-preemption can carry finished
            # siblings, and counting them leaks every block of the
            # re-prefilled sequence when it frees (refs never reach 0).
            if not self.enable_caching:
                block.ref_count = len(
                    seq_group.get_seqs(status=SequenceStatus.WAITING))
            block_table.append(block)

        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            self.block_tables[seq.seq_id] = block_table.copy()

    # ---- decode-phase growth ----

    def can_append_slot(self, seq_group: SequenceGroup) -> bool:
        num_free_gpu_blocks = self.gpu_allocator.get_num_free_blocks()
        if self.enable_caching:
            # Conservative under prefix caching (block promotion touches
            # the cached pool): worst case one new block per sequence.
            num_seqs = seq_group.num_seqs(status=SequenceStatus.RUNNING)
            return num_seqs <= num_free_gpu_blocks
        # Exact need: a sequence takes a fresh block only when its table
        # is shorter than its logical blocks (and not reusing a sliding-
        # window slot) or its last block is shared (copy-on-write).  A
        # table already extended by a multi-step lookahead window needs
        # NOTHING — the worst-case count was preempting groups whose
        # next tokens were fully pre-reserved.
        need = 0
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            block_table = self.block_tables[seq.seq_id]
            if len(block_table) < len(seq.logical_token_blocks):
                if (self.block_sliding_window is not None
                        and len(block_table) >= self.block_sliding_window):
                    continue
                need += 1
            elif block_table and block_table[-1].ref_count > 1:
                need += 1
        return need <= num_free_gpu_blocks

    def can_append_slots(self, seq_group: SequenceGroup,
                         lookahead: int = 1) -> bool:
        """Worst-case page bound for a multi-step decode window of
        ``lookahead`` tokens per running sequence."""
        if lookahead <= 1:
            return self.can_append_slot(seq_group)
        per_seq = -(-lookahead // self.block_size) + 1
        num_seqs = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return num_seqs * per_seq <= self.gpu_allocator.get_num_free_blocks()

    def can_reserve_window(self, num_seqs: int, lookahead: int) -> bool:
        """Batch-wide worst-case bound for reserving a multi-step decode
        window for ``num_seqs`` sequences at once (the scheduler checks
        this ONCE before extending any table)."""
        per_seq = -(-lookahead // self.block_size) + 1
        return num_seqs * per_seq <= self.gpu_allocator.get_num_free_blocks()

    def _promote_last_block(self, seq: Sequence,
                            last_block: PhysicalTokenBlock) -> PhysicalTokenBlock:
        """The last block just became full: give it its content hash so
        future prompts can hit it."""
        assert self.enable_caching
        new_hash = seq.hash_of_block(len(seq.logical_token_blocks) - 1)
        if self.gpu_allocator.contains_block(new_hash):
            # Another block with identical content already cached: dedup.
            self.gpu_allocator.free(last_block)
            return self.gpu_allocator.allocate(new_hash)
        self.gpu_allocator.update_hash(new_hash, last_block)
        return last_block

    def _is_last_block_full(self, seq: Sequence) -> bool:
        return seq.get_len() % seq.block_size == 0

    def _maybe_promote_last_block(
            self, seq: Sequence,
            last_block: PhysicalTokenBlock) -> PhysicalTokenBlock:
        if self._is_last_block_full(seq):
            return self._promote_last_block(seq, last_block)
        return last_block

    def _allocate_last_physical_block(self, seq: Sequence) -> PhysicalTokenBlock:
        if not self.enable_caching:
            return self.gpu_allocator.allocate()
        block_hash: Optional[int] = None
        if self._is_last_block_full(seq):
            block_hash = seq.hash_of_block(len(seq.logical_token_blocks) - 1)
        num_hashed_tokens = seq.num_hashed_tokens_of_block(
            len(seq.logical_token_blocks) - 1)
        new_block = self.gpu_allocator.allocate(block_hash, num_hashed_tokens)
        if block_hash is None:
            assert new_block.ref_count == 1
        return new_block

    def append_slot(self, seq: Sequence) -> Optional[Tuple[int, int]]:
        """Reserve a cache slot for the sequence's next token.

        Returns a (src_block, dst_block) copy-on-write pair when the last
        block was shared, else None.
        """
        logical_blocks = seq.logical_token_blocks
        block_table = self.block_tables[seq.seq_id]
        if len(block_table) < len(logical_blocks):
            if (self.block_sliding_window
                    and len(block_table) >= self.block_sliding_window):
                # Reuse a block cyclically within the sliding window.
                block_table.append(
                    block_table[len(block_table) % self.block_sliding_window])
            else:
                new_block = self._allocate_last_physical_block(seq)
                block_table.append(new_block)
            return None

        last_block = block_table[-1]
        assert last_block.device == Device.TPU
        if last_block.ref_count == 1:
            # Exclusively owned: append in place (and maybe promote the
            # block into the prefix cache now that it is full).
            if self.enable_caching:
                maybe_new = self._maybe_promote_last_block(seq, last_block)
                block_table[-1] = maybe_new
            return None
        # Shared block: copy-on-write.
        new_block = self._allocate_last_physical_block(seq)
        block_table[-1] = new_block
        self.gpu_allocator.free(last_block)
        return last_block.block_number, new_block.block_number

    def append_slots(self, seq: Sequence,
                     lookahead: int = 1) -> List[Tuple[int, int]]:
        """Reserve slots for the next ``lookahead`` token writes
        (positions ``get_len()-1 .. get_len()+lookahead-2`` — a
        multi-step decode window runs that many steps on device before
        the host sees any token).

        Future pages are plain (unhashed) allocations: prefix-cache
        promotion of decode-grown blocks is skipped while the table runs
        ahead of the logical blocks.  Multi-step windows are restricted
        to unforked single-sequence groups, so no CoW can arise on the
        lookahead pages themselves.
        """
        block_table = self.block_tables[seq.seq_id]
        cows: List[Tuple[int, int]] = []
        if len(block_table) <= len(seq.logical_token_blocks):
            cow = self.append_slot(seq)
            if cow is not None:
                cows.append(cow)
        if lookahead > 1:
            needed = -(-(seq.get_len() - 1 + lookahead) // seq.block_size)
            while len(block_table) < needed:
                if (self.block_sliding_window and
                        len(block_table) >= self.block_sliding_window):
                    block_table.append(block_table[
                        len(block_table) % self.block_sliding_window])
                else:
                    block_table.append(self.gpu_allocator.allocate())
        return cows

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        src_block_table = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = src_block_table.copy()
        for block in set(src_block_table):
            block.ref_count += 1

    # ---- swap ----

    def _get_physical_blocks(
            self, seq_group: SequenceGroup) -> List[PhysicalTokenBlock]:
        blocks: Set[PhysicalTokenBlock] = set()
        for seq in seq_group.get_seqs():
            if seq.is_finished():
                continue
            blocks.update(self.block_tables[seq.seq_id])
        return list(blocks)

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        num_swapped_seqs = seq_group.num_seqs(status=SequenceStatus.SWAPPED)
        num_free_blocks = self.gpu_allocator.get_num_free_blocks()
        num_required_blocks = len(blocks) + num_swapped_seqs
        return num_free_blocks - num_required_blocks >= self.watermark_blocks

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Returns host_block -> device_block mapping."""
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            new_block_table: BlockTable = []
            for cpu_block in self.block_tables[seq.seq_id]:
                if cpu_block in mapping:
                    gpu_block = mapping[cpu_block]
                    gpu_block.ref_count += 1
                else:
                    gpu_block = self.gpu_allocator.allocate(
                        cpu_block.block_hash, cpu_block.num_hashed_tokens)
                    mapping[cpu_block] = gpu_block
                new_block_table.append(gpu_block)
                self.cpu_allocator.free(cpu_block)
            self.block_tables[seq.seq_id] = new_block_table
        return {
            cpu_block.block_number: gpu_block.block_number
            for cpu_block, gpu_block in mapping.items()
        }

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Returns device_block -> host_block mapping."""
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            new_block_table: BlockTable = []
            for gpu_block in self.block_tables[seq.seq_id]:
                if gpu_block in mapping:
                    cpu_block = mapping[gpu_block]
                    cpu_block.ref_count += 1
                else:
                    cpu_block = self.cpu_allocator.allocate(
                        gpu_block.block_hash, gpu_block.num_hashed_tokens)
                    mapping[gpu_block] = cpu_block
                new_block_table.append(cpu_block)
                self.gpu_allocator.free(gpu_block)
            self.block_tables[seq.seq_id] = new_block_table
        return {
            gpu_block.block_number: cpu_block.block_number
            for gpu_block, cpu_block in mapping.items()
        }

    # ---- free / introspection ----

    def _free_block_table(self, block_table: BlockTable) -> None:
        # dict.fromkeys = dedup in first-occurrence order: freeing must
        # be deterministic so block numbering is reproducible (and so
        # the native engine's behavior matches bit-for-bit).
        for block in dict.fromkeys(block_table):
            if block.device == Device.TPU:
                self.gpu_allocator.free(block)
            else:
                self.cpu_allocator.free(block)

    def free(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return  # Already freed / never allocated.
        block_table = self.block_tables[seq.seq_id]
        self._free_block_table(block_table)
        del self.block_tables[seq.seq_id]

    def reset(self) -> None:
        for block_table in self.block_tables.values():
            self._free_block_table(block_table)
        self.block_tables.clear()

    def get_block_table(self, seq: Sequence) -> List[int]:
        return [b.block_number for b in self.block_tables[seq.seq_id]]

    def get_num_free_gpu_blocks(self) -> int:
        return self.gpu_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()

    # ---- prefix caching (computed-block tracking) ----

    def access_all_blocks_in_seq(self, seq: Sequence,
                                 access_time: float) -> None:
        if not self.enable_caching:
            return
        for block in self.block_tables[seq.seq_id]:
            block.last_accessed = access_time

    def compute_full_blocks_in_seq(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return
        max_full_block = seq.get_len() // self.block_size - 1
        block_table = self.block_tables[seq.seq_id]
        if max_full_block == -1:
            return
        for i in reversed(range(max_full_block + 1)):
            if block_table[i].computed:
                break
            block_table[i].computed = True

    def get_all_computed_blocks(self, seq: Sequence) -> List[int]:
        if seq.seq_id not in self.block_tables:
            return []
        block_table = self.block_tables[seq.seq_id]
        # The last block is never considered computed (it may be partial).
        return [
            b.block_number
            for b in takewhile(lambda b: b.computed, block_table[:-1])
        ]

    def get_common_computed_block_ids(
            self, seq_group: SequenceGroup) -> List[int]:
        """Blocks already computed for ALL sequences in the group — the
        model runner may skip recomputing these prompt positions."""
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
