"""Scheduler unit tests (pure CPU): budgets, preemption, abort, and the
Splitwise blocks_to_nw planning."""
from typing import List

from vllm_splitwise_tpu.config import CacheConfig, SchedulerConfig
from vllm_splitwise_tpu.core.scheduler import Scheduler
from vllm_splitwise_tpu.sequence import Logprob, SequenceGroup, SequenceStatus

from .utils import create_dummy_prompt


def make_scheduler(max_num_seqs=64,
                   max_tokens=4096,
                   num_device_blocks=16,
                   num_host_blocks=8,
                   block_size=4,
                   track_prompt_blocks=False) -> Scheduler:
    scheduler_config = SchedulerConfig(max_num_batched_tokens=max_tokens,
                                       max_num_seqs=max_num_seqs,
                                       max_model_len=max_tokens)
    cache_config = CacheConfig(block_size=block_size,
                               hbm_utilization=0.9,
                               swap_space=0.0001)
    cache_config.num_device_blocks = num_device_blocks
    cache_config.num_host_blocks = num_host_blocks
    return Scheduler(scheduler_config,
                     cache_config,
                     None,
                     track_prompt_blocks=track_prompt_blocks)


def append_token(seq_group: SequenceGroup, token_id: int) -> None:
    for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
        seq.append_token_id(token_id, {token_id: Logprob(0.0)})


def test_scheduler_add_seq_group():
    scheduler = make_scheduler(num_device_blocks=4, num_host_blocks=4)
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), prompt_length=4, block_size=4)
        scheduler.add_seq_group(seq_group)
        assert scheduler.get_num_unfinished_seq_groups() == i + 1


def test_scheduler_abort_seq_group():
    scheduler = make_scheduler(num_device_blocks=4, num_host_blocks=4)
    request_ids = set()
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i), prompt_length=4, block_size=4)
        scheduler.add_seq_group(seq_group)
        request_ids.add(str(i))
    assert scheduler.get_num_unfinished_seq_groups() == 4
    scheduler.abort_seq_group(request_ids)
    assert scheduler.get_num_unfinished_seq_groups() == 0


def test_scheduler_schedule_simple():
    block_size = 4
    num_seq_group = 4
    scheduler = make_scheduler(max_num_seqs=num_seq_group,
                               num_device_blocks=16,
                               block_size=block_size)
    running: List[SequenceGroup] = []
    for i in range(num_seq_group):
        _, seq_group = create_dummy_prompt(str(i), prompt_length=block_size)
        scheduler.add_seq_group(seq_group)
        running.append(seq_group)

    # Prompt run: all groups batched together.
    seq_group_meta, out = scheduler.schedule()
    assert out.prompt_run
    assert set(out.scheduled_seq_groups) == set(running)
    assert out.num_batched_tokens == num_seq_group * block_size
    assert (not out.blocks_to_copy and not out.blocks_to_swap_in
            and not out.blocks_to_swap_out)
    assert len(seq_group_meta) == num_seq_group
    assert all(m.is_prompt for m in seq_group_meta)

    for sg in running:
        append_token(sg, 1)

    # Decode run.
    seq_group_meta, out = scheduler.schedule()
    assert not out.prompt_run
    assert set(out.scheduled_seq_groups) == set(running)
    assert out.num_batched_tokens == num_seq_group
    assert all(not m.is_prompt for m in seq_group_meta)


def test_scheduler_prompt_token_budget():
    block_size = 4
    scheduler = make_scheduler(max_tokens=64,
                               num_device_blocks=64,
                               block_size=block_size)
    # Two prompts of 64 tokens each: only one fits the 64-token budget.
    for i in range(2):
        _, seq_group = create_dummy_prompt(str(i),
                                           prompt_length=64,
                                           block_size=block_size)
        scheduler.add_seq_group(seq_group)
    _, out = scheduler.schedule()
    assert out.prompt_run
    assert len(out.scheduled_seq_groups) == 1

    # The second comes in the next prompt run.
    _, out = scheduler.schedule()
    assert out.prompt_run
    assert len(out.scheduled_seq_groups) == 1


def test_scheduler_too_long_prompt_ignored():
    block_size = 4
    scheduler = make_scheduler(max_num_seqs=16,
                               max_tokens=32,
                               num_device_blocks=64,
                               block_size=block_size)
    _, seq_group = create_dummy_prompt("0",
                                       prompt_length=33,
                                       block_size=block_size)
    scheduler.add_seq_group(seq_group)
    _, out = scheduler.schedule()
    assert out.ignored_seq_groups == [seq_group]
    assert seq_group.get_seqs()[0].status == SequenceStatus.FINISHED_IGNORED


def test_scheduler_preempt_by_recompute():
    """When blocks run out mid-decode, the victim is recomputed later."""
    block_size = 4
    # 2 groups x 1 block each fills the cache; decoding past the block
    # boundary needs a new block -> preemption.
    scheduler = make_scheduler(num_device_blocks=2,
                               num_host_blocks=2,
                               block_size=block_size)
    groups = []
    for i in range(2):
        _, seq_group = create_dummy_prompt(str(i),
                                           prompt_length=block_size,
                                           block_size=block_size)
        scheduler.add_seq_group(seq_group)
        groups.append(seq_group)

    _, out = scheduler.schedule()
    assert out.prompt_run and len(out.scheduled_seq_groups) == 2
    for sg in groups:
        append_token(sg, 1)

    # Decode: both need one new block but none are free -> one group gets
    # preempted (recompute => back to waiting).
    _, out = scheduler.schedule()
    assert not out.prompt_run
    assert len(out.scheduled_seq_groups) == 1
    assert len(scheduler.waiting) == 1
    victim = scheduler.waiting[0]
    assert victim.get_seqs()[0].status == SequenceStatus.WAITING
    # Recompute preemption resets output tokens? No - output tokens are
    # kept; they will be re-prefilled together with the prompt.
    assert victim.get_seqs()[0].get_output_len() == 1


def test_scheduler_max_seqs():
    block_size = 4
    max_seqs = 2
    scheduler = make_scheduler(max_num_seqs=max_seqs,
                               num_device_blocks=16,
                               block_size=block_size)
    all_groups = []
    for i in range(4):
        _, seq_group = create_dummy_prompt(str(i),
                                           prompt_length=block_size,
                                           block_size=block_size)
        all_groups.append(seq_group)

    for g in all_groups:
        scheduler.add_seq_group(g)

    _, out = scheduler.schedule()
    assert len(out.scheduled_seq_groups) == max_seqs


def test_blocks_to_nw_tracking():
    """Splitwise: prefill output and first decode step populate
    blocks_to_nw keyed by transfer slot."""
    block_size = 4
    scheduler = make_scheduler(num_device_blocks=16,
                               block_size=block_size,
                               track_prompt_blocks=True)
    _, seq_group = create_dummy_prompt("0",
                                       prompt_length=2 * block_size,
                                       block_size=block_size)
    scheduler.add_seq_group(seq_group)

    # Prompt run: output_len == 0 -> blocks tracked.
    _, out = scheduler.schedule()
    assert out.prompt_run
    assert len(out.blocks_to_nw) == 1
    slot_id, block_ids = next(iter(out.blocks_to_nw.items()))
    assert len(block_ids) == 2

    append_token(seq_group, 1)

    # First decode step: output_len == 1 -> still tracked (decode side).
    _, out = scheduler.schedule()
    assert not out.prompt_run
    assert slot_id in out.blocks_to_nw

    append_token(seq_group, 2)

    # Second decode step: output_len == 2 -> no longer tracked.
    _, out = scheduler.schedule()
    assert out.blocks_to_nw == {}

    # Finishing the seq frees its slot for reuse.
    seq = seq_group.get_seqs()[0]
    seq.status = SequenceStatus.FINISHED_STOPPED
    scheduler.free_seq(seq)
    assert scheduler.seq_to_slot_mapper.free_slots[-1] == slot_id


def test_scheduler_swap_preemption_multi_seq():
    """Groups with multiple candidate seqs preempt by swap, not recompute."""
    block_size = 4
    scheduler = make_scheduler(num_device_blocks=4,
                               num_host_blocks=8,
                               block_size=block_size)
    # A best_of=2 group: after prompt it forks (we simulate fork by using
    # create_dummy_prompt best_of=2 then manual fork after prompt run).
    _, group_a = create_dummy_prompt("a",
                                     prompt_length=2 * block_size,
                                     block_size=block_size,
                                     best_of=2)
    scheduler.add_seq_group(group_a)
    _, out = scheduler.schedule()
    assert out.prompt_run

    # Fork the second candidate like the engine does after prompt.
    parent = group_a.get_seqs()[0]
    child = parent.fork(1000)
    group_a.add(child)
    scheduler.fork_seq(parent, child)

    append_token(group_a, 1)

    # Fill the cache with another group so appends fail.
    _, group_b = create_dummy_prompt("b",
                                     prompt_length=2 * block_size,
                                     block_size=block_size)
    scheduler.add_seq_group(group_b)
    _, out = scheduler.schedule()  # prompt run for b
    assert out.prompt_run
    append_token(group_b, 1)

    # Decode: no free blocks; lowest-priority group must be preempted.
    _, out = scheduler.schedule()
    assert not out.prompt_run
    # group_a is multi-seq -> if it was the victim it went to swapped.
    assert len(scheduler.swapped) + len(scheduler.waiting) >= 1
