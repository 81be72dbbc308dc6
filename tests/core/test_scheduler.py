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
        seq.append_token(token_id, {token_id: Logprob(0.0)})


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
    assert victim.get_seqs()[0].output_len == 1


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


def test_reallocate_after_recompute_finished_sibling_no_leak():
    """A group re-admitted after recompute-preemption while carrying a
    FINISHED sibling must not over-count block refs (the leak: ref_count
    = num_seqs() counted the finished seq, so the re-prefilled seq's
    blocks never freed)."""
    from vllm_splitwise_tpu.core.scheduler import PreemptionMode
    block_size = 4
    scheduler = make_scheduler(num_device_blocks=8,
                               num_host_blocks=8,
                               block_size=block_size)
    bm = scheduler.block_manager
    total_free = bm.get_num_free_gpu_blocks()

    _, group = create_dummy_prompt("0", prompt_length=block_size,
                                   block_size=block_size, best_of=2)
    scheduler.add_seq_group(group)
    _, out = scheduler.schedule()
    assert out.prompt_run
    append_token(group, 1)

    # n=2: fork a child, then the child finishes immediately (stays in
    # the group's seqs_dict for output assembly).
    parent = group.get_seqs()[0]
    child = parent.fork(4242)
    group.add(child)
    scheduler.fork_seq(parent, child)
    child.status = SequenceStatus.FINISHED_STOPPED
    scheduler.free_seq(child)

    # Memory pressure: recompute-preempt the group (1 running seq).
    scheduler._preempt(group, {}, PreemptionMode.RECOMPUTE)
    assert bm.get_num_free_gpu_blocks() == total_free

    # Re-admission re-prefills; finishing the survivor must return ALL
    # blocks.
    _, out = scheduler.schedule()
    assert out.prompt_run
    parent.status = SequenceStatus.FINISHED_STOPPED
    scheduler.free_seq(parent)
    scheduler.free_finished_seq_groups()
    assert bm.get_num_free_gpu_blocks() == total_free


def test_can_append_slot_with_lookahead_reserved_tables():
    """Sequences whose tables were extended by a multi-step lookahead
    window need NO new page — can_append_slot must not report pressure
    (which preempted groups spuriously when the pool ran low)."""
    block_size = 4
    # Pool sized so the lookahead reservation takes the LAST free pages.
    scheduler = make_scheduler(num_device_blocks=3,
                               block_size=block_size)
    bm = scheduler.block_manager
    _, group = create_dummy_prompt("0", prompt_length=block_size,
                                   block_size=block_size)
    scheduler.add_seq_group(group)
    scheduler.schedule()
    seq = group.get_seqs()[0]
    # Reserve a lookahead window (multi-step decode): table runs ahead,
    # consuming the remaining 2 pages.
    list(bm.append_slots(seq, lookahead=2 * block_size))
    assert bm.get_num_free_gpu_blocks() == 0
    append_token(group, 1)
    assert bm.can_append_slot(group)  # table already covers the token
    assert bm.append_slot(seq) is None


def test_plan_decode_window_precheck_reserves_nothing_on_degrade():
    """If the batch's lookahead cannot be reserved for EVERYONE, the
    planner must degrade to 1 WITHOUT taking pages for a prefix of the
    batch."""
    block_size = 4
    scheduler_config = SchedulerConfig(max_num_batched_tokens=4096,
                                       max_num_seqs=64,
                                       max_model_len=4096,
                                       num_decode_steps=8)
    cache_config = CacheConfig(block_size=block_size,
                               hbm_utilization=0.9,
                               swap_space=0.0001)
    cache_config.num_device_blocks = 8
    cache_config.num_host_blocks = 8
    scheduler = Scheduler(scheduler_config, cache_config, None)
    bm = scheduler.block_manager
    for i in range(3):
        _, g = create_dummy_prompt(str(i), prompt_length=block_size,
                                   block_size=block_size, max_tokens=64)
        scheduler.add_seq_group(g)
        scheduler.schedule()
        append_token(g, 1)
    free_before = bm.get_num_free_gpu_blocks()
    # window=8 needs (ceil(8/4)+1)=3 pages/seq * 3 seqs = 9 > free.
    assert free_before < 9
    copies = {}
    assert scheduler._plan_decode_window(copies) == 1
    assert bm.get_num_free_gpu_blocks() == free_before
    assert copies == {}


def test_blocks_to_nw_skips_forked_children():
    """Splitwise: a beam/n>1 fork reads its parent's already-migrated
    pages — it must not emit a transfer slot of its own (the decode pool
    would wait on a push that never comes)."""
    block_size = 4
    scheduler = make_scheduler(num_device_blocks=16,
                               block_size=block_size,
                               track_prompt_blocks=True)
    _, group = create_dummy_prompt("0", prompt_length=2 * block_size,
                                   block_size=block_size, best_of=2)
    scheduler.add_seq_group(group)
    _, out = scheduler.schedule()
    assert out.prompt_run and len(out.blocks_to_nw) == 1
    append_token(group, 1)

    parent = group.get_seqs()[0]
    child = parent.fork(777)
    group.add(child)
    scheduler.fork_seq(parent, child)

    _, out = scheduler.schedule()
    # Parent's first decode step is tracked; the fork is not.
    parent_slot = scheduler.seq_to_slot_mapper.get_slot_id(parent.seq_id)
    child_slot = scheduler.seq_to_slot_mapper.get_slot_id(child.seq_id)
    assert parent_slot in out.blocks_to_nw
    assert child_slot not in out.blocks_to_nw


class _FakeLoraRequest:
    def __init__(self, lora_int_id):
        self.lora_int_id = lora_int_id
        self.lora_name = f"l{lora_int_id}"


class _FakeLoraConfig:
    max_loras = 1
    max_lora_rank = 8
    max_cpu_loras = 4


def _lora_scheduler(num_device_blocks=64, block_size=4):
    scheduler_config = SchedulerConfig(max_num_batched_tokens=4096,
                                       max_num_seqs=64,
                                       max_model_len=4096)
    cache_config = CacheConfig(block_size=block_size,
                               hbm_utilization=0.9,
                               swap_space=0.0001)
    cache_config.num_device_blocks = num_device_blocks
    cache_config.num_host_blocks = 32
    return Scheduler(scheduler_config, cache_config, _FakeLoraConfig())


def test_lora_budget_defers_not_blocks_waiting_queue():
    """A LoRA-blocked waiting group is deferred; base-model prompts
    behind it still schedule (no head-of-line blocking)."""
    block_size = 4
    scheduler = _lora_scheduler(block_size=block_size)
    _, g1 = create_dummy_prompt("1", prompt_length=block_size,
                                block_size=block_size)
    g1.lora_request = _FakeLoraRequest(1)
    scheduler.add_seq_group(g1)
    _, out = scheduler.schedule()
    assert [g.request_id for g in out.scheduled_seq_groups] == ["1"]
    append_token(g1, 1)

    _, g2 = create_dummy_prompt("2", prompt_length=block_size,
                                block_size=block_size)
    g2.lora_request = _FakeLoraRequest(2)  # over budget (max_loras=1)
    _, g3 = create_dummy_prompt("3", prompt_length=block_size,
                                block_size=block_size)  # base model
    scheduler.add_seq_group(g2)
    scheduler.add_seq_group(g3)
    _, out = scheduler.schedule()
    ids = [g.request_id for g in out.scheduled_seq_groups]
    assert out.prompt_run and ids == ["3"]
    # The deferred LoRA group is still queued, not lost.
    assert any(g.request_id == "2" for g in scheduler.waiting)


def test_lora_budget_enforced_on_swap_in():
    """Swapping a group back in must respect max_loras — more distinct
    adapters than slots silently computes with wrong weights."""
    from vllm_splitwise_tpu.core.scheduler import PreemptionMode
    block_size = 4
    scheduler = _lora_scheduler(block_size=block_size)
    _, g1 = create_dummy_prompt("1", prompt_length=block_size,
                                block_size=block_size, best_of=2)
    g1.lora_request = _FakeLoraRequest(1)
    scheduler.add_seq_group(g1)
    scheduler.schedule()
    append_token(g1, 1)
    scheduler.running.remove(g1)  # as the decode loop does before _preempt
    scheduler._preempt(g1, {}, PreemptionMode.SWAP)
    assert len(scheduler.swapped) == 1

    # Admit a second adapter directly (normal admission is blocked while
    # anything is swapped — this manufactures the invariant-violating
    # state the guard protects against).
    _, g2 = create_dummy_prompt("2", prompt_length=block_size,
                                block_size=block_size)
    g2.lora_request = _FakeLoraRequest(2)
    scheduler._allocate(g2)
    scheduler.running.append(g2)
    append_token(g2, 1)

    # Decode: g1 must NOT swap in beside g2 (two adapters, one slot).
    _, out = scheduler.schedule()
    assert not out.prompt_run
    assert [g.request_id for g in out.scheduled_seq_groups] == ["2"]
    assert len(scheduler.swapped) == 1
    assert out.blocks_to_swap_in == {}


def test_scheduler_max_num_prompt_seqs_cap():
    """--max-num-prompt-seqs bounds the PROMPT batch even when the token
    budget would admit more (TPU compile hygiene: every prompt batch
    bucket is a separate compiled program)."""
    scheduler = make_scheduler(num_device_blocks=64)
    scheduler.scheduler_config.max_num_prompt_seqs = 2
    for i in range(5):
        _, group = create_dummy_prompt(str(i), prompt_length=4,
                                       block_size=4)
        scheduler.add_seq_group(group)
    _, out = scheduler.schedule()
    assert out.prompt_run
    assert len(out.scheduled_seq_groups) == 2
    # The rest arrive in later prompt runs, order preserved (FCFS).
    _, out = scheduler.schedule()
    assert [g.request_id for g in out.scheduled_seq_groups] == ["2", "3"]


def test_decode_priority_steps_throttles_prompts():
    """--decode-priority-steps N: while decodes are pending, a prompt
    run only happens after N decode runs (bounds TPOT inflation under
    steady prompt arrivals; 0 keeps strict prompt-first)."""
    scheduler = make_scheduler(num_device_blocks=64)
    scheduler.scheduler_config.decode_priority_steps = 2

    _, g0 = create_dummy_prompt("0", prompt_length=4, block_size=4)
    scheduler.add_seq_group(g0)
    _, out = scheduler.schedule()       # first prompt always allowed
    assert out.prompt_run
    append_token(g0, 1)

    _, g1 = create_dummy_prompt("1", prompt_length=4, block_size=4)
    scheduler.add_seq_group(g1)
    # Two decode runs must happen before the waiting prompt is admitted.
    _, out = scheduler.schedule()
    assert not out.prompt_run
    append_token(g0, 1)
    _, out = scheduler.schedule()
    assert not out.prompt_run
    append_token(g0, 1)
    _, out = scheduler.schedule()
    assert out.prompt_run
    assert [g.request_id for g in out.scheduled_seq_groups] == ["1"]
