"""Lookahead (multi-step decode) page reservation: append_slots /
can_append_slots on both block managers, and the scheduler's window
planning (_plan_decode_window)."""
import pytest

from vllm_splitwise_tpu.config import CacheConfig, SchedulerConfig
from vllm_splitwise_tpu.core.block_manager import BlockSpaceManager
from vllm_splitwise_tpu.core.native_block_manager import (
    NativeBlockSpaceManager, native_engine_available)
from vllm_splitwise_tpu.core.scheduler import Scheduler
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.sequence import (Sequence, SequenceGroup,
                                         SequenceStatus)

BLOCK = 4


def _make_group(seq_id, prompt_len, sp=None):
    seq = Sequence(seq_id, "x", list(range(prompt_len)), BLOCK, 2)
    group = SequenceGroup(f"req-{seq_id}", [seq],
                         sp or SamplingParams(temperature=0.0), 0.0)
    return seq, group


MANAGERS = [BlockSpaceManager]
if native_engine_available():
    MANAGERS.append(NativeBlockSpaceManager)


@pytest.mark.parametrize("cls", MANAGERS)
def test_append_slots_reserves_lookahead(cls):
    mgr = cls(block_size=BLOCK, num_gpu_blocks=16, num_cpu_blocks=0,
              watermark=0.0)
    seq, group = _make_group(0, 6)  # 2 logical blocks (4+2)
    mgr.allocate(group)
    seq.status = SequenceStatus.RUNNING
    assert len(mgr.get_block_table(seq)) == 2

    # Window of 6: table must cover positions 0..(6-1+6-1)=10 -> 3 pages.
    lookahead = 6
    assert mgr.can_append_slots(group, lookahead)
    cows = mgr.append_slots(seq, lookahead)
    assert cows == []
    assert len(mgr.get_block_table(seq)) == 3

    # Idempotent while the table still runs ahead.
    mgr.append_slots(seq, lookahead)
    assert len(mgr.get_block_table(seq)) == 3

    # lookahead=1 degrades to plain append_slot semantics.
    assert mgr.can_append_slots(group, 1) == mgr.can_append_slot(group)


@pytest.mark.parametrize("cls", MANAGERS)
def test_can_append_slots_worst_case_bound(cls):
    mgr = cls(block_size=BLOCK, num_gpu_blocks=4, num_cpu_blocks=0,
              watermark=0.0)
    seq, group = _make_group(1, 4)
    mgr.allocate(group)
    seq.status = SequenceStatus.RUNNING
    # 3 free pages; worst case for lookahead=12 is ceil(12/4)+1=4 pages.
    assert not mgr.can_append_slots(group, 12)
    assert mgr.can_append_slots(group, 8)  # ceil(8/4)+1 = 3


def _scheduler(num_decode_steps, num_blocks=64):
    cache = CacheConfig(block_size=BLOCK, hbm_utilization=0.9,
                        swap_space=0)
    cache.num_device_blocks = num_blocks
    cache.num_host_blocks = 0
    sched_cfg = SchedulerConfig(max_num_batched_tokens=256, max_num_seqs=8,
                                max_model_len=64, max_paddings=256,
                                num_decode_steps=num_decode_steps)
    return Scheduler(sched_cfg, cache)


def _add_and_prefill(sched, seq_id, prompt_len, sp=None):
    seq, group = _make_group(seq_id, prompt_len, sp)
    sched.add_seq_group(group)
    sched.schedule()  # prompt run
    seq.data.append_token(7, 0.0)  # the sampled first token
    return seq, group


def test_scheduler_plans_window():
    sched = _scheduler(8)
    seq, _ = _add_and_prefill(sched, 0, 6)
    _, out = sched.schedule()  # decode run
    assert not out.prompt_run
    assert out.num_decode_steps == 8
    # Table covers positions 0..(7-1+8-1)=13 -> 4 pages.
    assert len(sched.block_manager.get_block_table(seq)) == 4


def test_scheduler_window_capped_by_max_tokens():
    sched = _scheduler(8)
    sp = SamplingParams(temperature=0.0, max_tokens=3)
    _add_and_prefill(sched, 0, 6, sp)
    _, out = sched.schedule()
    # 1 token emitted at prefill; 2 remain -> window 2.
    assert out.num_decode_steps == 2


def test_scheduler_window_ineligible_groups():
    sched = _scheduler(8)
    sp = SamplingParams(temperature=0.9, presence_penalty=0.5)
    _add_and_prefill(sched, 0, 6, sp)
    _, out = sched.schedule()
    assert out.num_decode_steps == 1


def test_scheduler_window_degrades_without_pages():
    # 4 pages: prompt takes 2 (6 tokens), +1 slot -> no room for an
    # 8-step lookahead; the window must degrade to 1, not preempt.
    sched = _scheduler(8, num_blocks=4)
    seq, _ = _add_and_prefill(sched, 0, 6)
    _, out = sched.schedule()
    assert not out.prompt_run
    assert out.num_decode_steps == 1
    assert seq.status == SequenceStatus.RUNNING


def test_scheduler_window_quantizes_to_pow2():
    """Shrunk windows round DOWN to a power of two: each distinct window
    length is a separately compiled program on TPU, and warmup
    pre-compiles exactly the {2, 4, ..., K} ladder."""
    sched = _scheduler(8)
    sp = SamplingParams(temperature=0.0, max_tokens=7)
    _add_and_prefill(sched, 0, 6, sp)
    _, out = sched.schedule()
    # 6 tokens remain -> raw window 6 -> quantized to 4.
    assert out.num_decode_steps == 4


def test_scheduler_window_full_not_quantized():
    sched = _scheduler(8)
    sp = SamplingParams(temperature=0.0, max_tokens=32)
    _add_and_prefill(sched, 0, 6, sp)
    _, out = sched.schedule()
    assert out.num_decode_steps == 8  # full window untouched
