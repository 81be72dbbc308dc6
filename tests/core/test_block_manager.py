"""Page-pool / block-manager unit tests (pure CPU), mirroring the
reference's coverage for alloc/append/CoW/swap status
(tests/core/test_block_manager.py)."""
import pytest

from vllm_splitwise_tpu.core.block_manager import (AllocStatus,
                                                   BlockSpaceManager,
                                                   PagePool)
from vllm_splitwise_tpu.sequence import Logprob, SequenceStatus
from vllm_splitwise_tpu.utils import Device

from .utils import create_dummy_prompt


def test_page_pool_alloc():
    pool = PagePool(Device.CPU, 4)
    free = 4
    assert pool.free_count() == free
    seen = set()
    for _ in range(4):
        page = pool.alloc()
        free -= 1
        assert page not in seen
        seen.add(page)
        assert pool.free_count() == free
    with pytest.raises(ValueError):
        pool.alloc()


def test_page_pool_release():
    pool = PagePool(Device.CPU, 4)
    pages = [pool.alloc() for _ in range(4)]
    for i, page in enumerate(pages):
        pool.release(page)
        assert pool.free_count() == i + 1
        with pytest.raises(ValueError):
            pool.release(page)  # Double free.


def test_page_pool_cached_hash_sharing():
    pool = PagePool(Device.TPU, 4, enable_caching=True)
    a = pool.alloc_cached(1234, 16)
    b = pool.alloc_cached(1234, 16)
    assert a == b
    assert pool.refs(a) == 2
    # Parked pages resurrect by hash after release.
    pool.release(a)
    pool.release(a)
    assert pool.free_count() == 4  # 3 unminted + 1 parked
    c = pool.alloc_cached(1234, 16)
    assert c == a


def test_allocate():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    # One block per prompt fits num_gpu_blocks times.
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        assert manager.can_allocate(seq_group) == AllocStatus.OK
        manager.allocate(seq_group)
    assert manager.can_allocate(seq_group) != AllocStatus.OK

    # Watermark reserves headroom.
    manager = BlockSpaceManager(block_size, 4, 4, watermark=1 / 4)
    for i in range(3):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        assert manager.can_allocate(seq_group) == AllocStatus.OK
        manager.allocate(seq_group)
    assert manager.can_allocate(seq_group) != AllocStatus.OK


def test_allocate_never():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)
    # A prompt larger than the whole cache can never run.
    _, seq_group = create_dummy_prompt("0", 5 * block_size, block_size)
    assert manager.can_allocate(seq_group) == AllocStatus.NEVER


def test_append_slot_single_seq():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1", block_size)
    manager.allocate(seq_group)

    # No new page needed while the last block has room.
    free_before = manager.get_num_free_gpu_blocks()
    prompt.status = SequenceStatus.RUNNING
    assert manager.append_slot(prompt) is None
    assert free_before == manager.get_num_free_gpu_blocks()

    # Filling the block forces a fresh page.
    for i in range(block_size):
        prompt.append_token(i + 100, {i + 100: Logprob(0.0)})
    assert manager.append_slot(prompt) is None
    assert free_before - 1 == manager.get_num_free_gpu_blocks()


def test_append_slot_cow():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1",
                                            block_size - 1,
                                            block_size=block_size)
    manager.allocate(seq_group)

    # Fork: both seqs share the last (partial) page.
    child = prompt.fork(2)
    token_id = 9999
    child.append_token(token_id, {token_id: Logprob(0.0)})
    seq_group.add(child)
    manager.fork(prompt, child)

    free_before = manager.get_num_free_gpu_blocks()
    cow = manager.append_slot(child)
    assert cow is not None
    src, dst = cow
    assert src != dst
    assert free_before - 1 == manager.get_num_free_gpu_blocks()


def test_fork():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1",
                                            block_size - 1,
                                            block_size=block_size)
    manager.allocate(seq_group)

    child = prompt.fork(2)
    manager.fork(prompt, child)
    assert manager.get_block_table(prompt) == manager.get_block_table(child)

    # Appending within the shared partial page triggers CoW, diverging
    # the tables.
    token_id = 4
    child.append_token(token_id, {token_id: Logprob(0.0)})
    manager.append_slot(child)
    assert manager.get_block_table(prompt) != manager.get_block_table(child)


def test_swap():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1", prompt_length=block_size - 1)
    prompt.status = SequenceStatus.WAITING
    manager.allocate(seq_group)

    prompt.status = SequenceStatus.RUNNING
    token_id = 0
    prompt.append_token(token_id, {token_id: Logprob(0.0)})

    # Swap out.
    assert manager.can_swap_out(seq_group)
    before_cpu = manager.get_num_free_cpu_blocks()
    before_gpu = manager.get_num_free_gpu_blocks()
    mapping = manager.swap_out(seq_group)
    assert before_cpu == manager.get_num_free_cpu_blocks() + len(mapping)
    assert before_gpu + len(mapping) == manager.get_num_free_gpu_blocks()
    prompt.status = SequenceStatus.SWAPPED

    # Swap in.
    assert manager.can_swap_in(seq_group)
    before_cpu = manager.get_num_free_cpu_blocks()
    before_gpu = manager.get_num_free_gpu_blocks()
    mapping = manager.swap_in(seq_group)
    assert before_cpu + len(mapping) == manager.get_num_free_cpu_blocks()
    assert before_gpu == manager.get_num_free_gpu_blocks() + len(mapping)


def test_free():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    prompt, seq_group = create_dummy_prompt("1", block_size)
    manager.allocate(seq_group)

    prompt_pages = len(manager.get_block_table(prompt))
    before = manager.get_num_free_gpu_blocks()
    manager.free(prompt)
    assert manager.get_num_free_gpu_blocks() == before + prompt_pages

    with pytest.raises(KeyError):
        manager.get_block_table(prompt)


def test_reset():
    block_size = 4
    manager = BlockSpaceManager(block_size, 4, 4, watermark=0)

    original = manager.get_num_free_gpu_blocks()
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), block_size)
        manager.allocate(seq_group)
    assert manager.get_num_free_gpu_blocks() == 0

    manager.reset()
    assert manager.get_num_free_gpu_blocks() == original


def test_prefix_caching_hash_reuse():
    """Two identical prompts share physical pages with enable_caching."""
    block_size = 4
    manager = BlockSpaceManager(block_size, 16, 16, watermark=0,
                                enable_caching=True)

    prompt1, group1 = create_dummy_prompt("1", 2 * block_size, block_size)
    manager.allocate(group1)
    table1 = manager.get_block_table(prompt1)

    prompt2, group2 = create_dummy_prompt("2", 2 * block_size, block_size)
    manager.allocate(group2)
    table2 = manager.get_block_table(prompt2)

    # Same content -> same physical pages.
    assert table1 == table2


def test_computed_blocks_tracking():
    block_size = 4
    manager = BlockSpaceManager(block_size, 16, 16, watermark=0,
                                enable_caching=True)
    prompt, group = create_dummy_prompt("1", 3 * block_size, block_size)
    manager.allocate(group)
    prompt.status = SequenceStatus.RUNNING
    assert manager.get_all_computed_blocks(prompt) == []
    manager.mark_blocks_as_computed(group)
    computed = manager.get_all_computed_blocks(prompt)
    # Last page is never reported computed.
    assert len(computed) == 2
