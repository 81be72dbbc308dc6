"""Equivalence suite: native (C++) block engine vs Python manager.

Drives the NativeBlockSpaceManager (csrc/block_engine.cpp) and the pure
Python BlockSpaceManager through identical workloads and asserts
identical observable behavior at every step: block tables, free counts,
CoW pairs, swap mappings, computed-block tracking.  Mirrors the
reference's model of testing the scheduling core CPU-only
(tests/core/test_block_manager.py pattern).
"""
import random

import pytest

from tests.core.utils import create_dummy_prompt
from vllm_splitwise_tpu.core.block_manager import AllocStatus, BlockSpaceManager
from vllm_splitwise_tpu.core.native_block_manager import (
    NativeBlockSpaceManager, native_engine_available)
from vllm_splitwise_tpu.sequence import Logprob, SequenceStatus

pytestmark = pytest.mark.skipif(not native_engine_available(),
                                reason="native block engine unavailable")


def _pair(block_size=4, num_gpu=8, num_cpu=8, watermark=0.0,
          sliding_window=None, enable_caching=False):
    kwargs = dict(block_size=block_size, num_gpu_blocks=num_gpu,
                  num_cpu_blocks=num_cpu, watermark=watermark,
                  sliding_window=sliding_window,
                  enable_caching=enable_caching)
    return (BlockSpaceManager(**kwargs), NativeBlockSpaceManager(**kwargs))


def _assert_same_tables(py, cc, seqs):
    for seq in seqs:
        in_py = seq.seq_id in py.block_tables
        assert cc._eng.has_seq(seq.seq_id) == in_py
        if in_py:
            assert py.get_block_table(seq) == cc.get_block_table(seq), (
                f"seq {seq.seq_id}")
    assert py.get_num_free_gpu_blocks() == cc.get_num_free_gpu_blocks()
    assert py.get_num_free_cpu_blocks() == cc.get_num_free_cpu_blocks()


def test_basic_alloc_append_free_parity():
    py, cc = _pair()
    prompt, group = create_dummy_prompt("1", 4, block_size=4)
    assert py.can_allocate(group) == cc.can_allocate(group)
    py.allocate(group)
    cc.allocate(group)
    prompt.status = SequenceStatus.RUNNING
    _assert_same_tables(py, cc, [prompt])

    for i in range(10):
        prompt.append_token(100 + i, {100 + i: Logprob(0.0)})
        assert py.append_slot(prompt) == cc.append_slot(prompt)
        _assert_same_tables(py, cc, [prompt])

    py.free(prompt)
    cc.free(prompt)
    _assert_same_tables(py, cc, [prompt])


def test_cow_parity():
    py, cc = _pair()
    prompt, group = create_dummy_prompt("1", 3, block_size=4)
    py.allocate(group)
    cc.allocate(group)
    child = prompt.fork(2)
    child.append_token(9999, {9999: Logprob(0.0)})
    group.add(child)
    py.fork(prompt, child)
    cc.fork(prompt, child)
    cow_py = py.append_slot(child)
    cow_cc = cc.append_slot(child)
    assert cow_py == cow_cc
    assert cow_py is not None
    _assert_same_tables(py, cc, [prompt, child])


def test_swap_parity():
    py, cc = _pair(num_gpu=8, num_cpu=8)
    prompt, group = create_dummy_prompt("1", 8, block_size=4)
    py.allocate(group)
    cc.allocate(group)
    prompt.status = SequenceStatus.RUNNING
    for i in range(5):
        prompt.append_token(i, {i: Logprob(0.0)})
        assert py.append_slot(prompt) == cc.append_slot(prompt)

    assert py.can_swap_out(group) == cc.can_swap_out(group)
    assert py.swap_out(group) == cc.swap_out(group)
    prompt.status = SequenceStatus.SWAPPED
    _assert_same_tables(py, cc, [prompt])

    assert py.can_swap_in(group) == cc.can_swap_in(group)
    assert py.swap_in(group) == cc.swap_in(group)
    prompt.status = SequenceStatus.RUNNING
    _assert_same_tables(py, cc, [prompt])


def test_watermark_and_never_parity():
    py, cc = _pair(num_gpu=4, num_cpu=4, watermark=0.25)
    _, big = create_dummy_prompt("9", 5 * 4, block_size=4)
    assert py.can_allocate(big) == cc.can_allocate(big) == AllocStatus.NEVER

    groups = []
    for i in range(3):
        _, g = create_dummy_prompt(str(i), 4, block_size=4)
        groups.append(g)
        s_py = py.can_allocate(g)
        s_cc = cc.can_allocate(g)
        assert s_py == s_cc
        if s_py == AllocStatus.OK:
            py.allocate(g)
            cc.allocate(g)
    assert py.can_allocate(groups[-1]) == cc.can_allocate(groups[-1])


def test_sliding_window_parity():
    py, cc = _pair(block_size=4, num_gpu=8, sliding_window=8)
    prompt, group = create_dummy_prompt("1", 20, block_size=4)
    py.allocate(group)
    cc.allocate(group)
    prompt.status = SequenceStatus.RUNNING
    _assert_same_tables(py, cc, [prompt])
    for i in range(12):
        prompt.append_token(i, {i: Logprob(0.0)})
        assert py.append_slot(prompt) == cc.append_slot(prompt)
        _assert_same_tables(py, cc, [prompt])


def test_prefix_caching_parity():
    py, cc = _pair(block_size=4, num_gpu=8, num_cpu=8,
                   enable_caching=True)
    # Two prompts sharing a 2-block prefix: the second must reuse blocks
    # identically in both implementations.
    p1, g1 = create_dummy_prompt("1", 8, block_size=4)
    py.allocate(g1)
    cc.allocate(g1)
    t = [1.0]

    def access(mgr, seq):
        mgr.access_all_blocks_in_seq(seq, t[0])

    access(py, p1)
    access(cc, p1)
    t[0] += 1
    py.mark_blocks_as_computed(g1)
    cc.mark_blocks_as_computed(g1)
    assert py.get_all_computed_blocks(p1) == cc.get_all_computed_blocks(p1)

    p2, g2 = create_dummy_prompt("2", 8, block_size=4)
    py.allocate(g2)
    cc.allocate(g2)
    assert py.get_block_table(p2) == cc.get_block_table(p2)
    # Shared prefix -> same physical blocks as p1.
    assert py.get_block_table(p2) == py.get_block_table(p1)
    _assert_same_tables(py, cc, [p1, p2])

    py.free(p1)
    cc.free(p1)
    py.free(p2)
    cc.free(p2)
    _assert_same_tables(py, cc, [p1, p2])

    # Freed cached blocks resurrect from the evictor on re-allocate.
    p3, g3 = create_dummy_prompt("3", 8, block_size=4)
    py.allocate(g3)
    cc.allocate(g3)
    _assert_same_tables(py, cc, [p3])


def test_randomized_workload_parity():
    rng = random.Random(1234)
    for trial in range(4):
        caching = trial % 2 == 1
        py, cc = _pair(block_size=4, num_gpu=32, num_cpu=32,
                       watermark=0.0, enable_caching=caching)
        live = {}  # seq_id -> (seq, group, status)
        next_id = 0
        clock = [0.0]
        for step in range(300):
            op = rng.random()
            if op < 0.3 or not live:
                # New prompt.
                plen = rng.randint(1, 12)
                prompt, group = create_dummy_prompt(str(next_id), plen,
                                                    block_size=4)
                next_id += 1
                s_py = py.can_allocate(group)
                s_cc = cc.can_allocate(group)
                assert s_py == s_cc
                if s_py == AllocStatus.OK:
                    py.allocate(group)
                    cc.allocate(group)
                    prompt.status = SequenceStatus.RUNNING
                    live[prompt.seq_id] = (prompt, group)
            elif op < 0.7:
                # Decode step on a random running seq.
                sid = rng.choice(list(live))
                seq, group = live[sid]
                if seq.status != SequenceStatus.RUNNING:
                    continue
                # Engine order: the sampled token is appended to the
                # sequence BEFORE the next schedule's can_append_slot
                # (llm_engine._process_model_outputs runs first), so the
                # exact-need check must see the grown logical blocks.
                tok = rng.randint(0, 10**6)
                seq.append_token(tok, {tok: Logprob(0.0)})
                ok_py = py.can_append_slot(group)
                ok_cc = cc.can_append_slot(group)
                assert ok_py == ok_cc
                if not ok_py:
                    # Undo the speculative append (token buffer directly:
                    # output_token_ids is a read-only view).
                    seq.data._tokens.pop()
                    continue
                assert py.append_slot(seq) == cc.append_slot(seq)
                if caching:
                    clock[0] += 1
                    py.access_all_blocks_in_seq(seq, clock[0])
                    cc.access_all_blocks_in_seq(seq, clock[0])
            elif op < 0.8:
                # Swap a running group out, or a swapped one back in.
                sid = rng.choice(list(live))
                seq, group = live[sid]
                if seq.status == SequenceStatus.RUNNING:
                    ok_py = py.can_swap_out(group)
                    assert ok_py == cc.can_swap_out(group)
                    if ok_py:
                        assert py.swap_out(group) == cc.swap_out(group)
                        seq.status = SequenceStatus.SWAPPED
                elif seq.status == SequenceStatus.SWAPPED:
                    ok_py = py.can_swap_in(group)
                    assert ok_py == cc.can_swap_in(group)
                    if ok_py:
                        assert py.swap_in(group) == cc.swap_in(group)
                        seq.status = SequenceStatus.RUNNING
            else:
                # Finish a sequence.
                sid = rng.choice(list(live))
                seq, group = live.pop(sid)
                py.free(seq)
                cc.free(seq)
            seqs = [v[0] for v in live.values()]
            _assert_same_tables(py, cc, seqs)
        py.reset()
        cc.reset()
        assert (py.get_num_free_gpu_blocks() ==
                cc.get_num_free_gpu_blocks() == 32)
