"""Chunked prefill: long prompts prefill in page-aligned chunks through
the prefix-attention path, so a prompt can never stall the decode batch
longer than one chunk and prefill dispatches collapse onto one padded
length bucket.  TPU extension — the reference (vLLM v0.3.3) prefills
whole prompts only (vllm/core/scheduler.py:200-279)."""
import sys
import tempfile
import time

import pytest

from vllm_splitwise_tpu.config import CacheConfig, SchedulerConfig
from vllm_splitwise_tpu.core.scheduler import Scheduler
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.sequence import Sequence, SequenceGroup

sys.path.insert(0, "tests")

BLOCK = 4


def make_scheduler(chunk=8, max_tokens=4096, blocks=128):
    sc = SchedulerConfig(max_num_batched_tokens=max_tokens,
                         max_num_seqs=16, max_model_len=max_tokens,
                         chunked_prefill_tokens=chunk)
    cc = CacheConfig(block_size=BLOCK, hbm_utilization=0.9,
                     swap_space=0.0001)
    cc.num_device_blocks = blocks
    cc.num_host_blocks = 16
    return Scheduler(sc, cc, None)


def add_prompt(scheduler, rid, n):
    seq = Sequence(int(rid), "x", list(range(n)), block_size=BLOCK)
    group = SequenceGroup(rid, [seq], SamplingParams(max_tokens=4),
                          time.time())
    scheduler.add_seq_group(group)
    return group


def test_chunk_walk_and_promotion():
    """A 19-token prompt at chunk 8 prefills as (0,8), (8,16), (16,19);
    only after the final chunk does the group reach `running`."""
    s = make_scheduler(chunk=8)
    g = add_prompt(s, "0", 19)

    _, out = s.schedule()
    assert out.prompt_run
    assert out.prefill_chunks == {"0": (0, 8)}
    assert g.prefill_in_progress and list(s.prefilling) == [g]
    assert not s.running

    _, out = s.schedule()
    assert out.prefill_chunks == {"0": (8, 16)}
    assert g.prefill_in_progress

    _, out = s.schedule()
    assert out.prefill_chunks == {"0": (16, 19)}
    assert not g.prefill_in_progress
    assert list(s.running) == [g] and not s.prefilling

    # Next step is a decode step for the promoted group.
    meta, out = s.schedule()
    assert not out.prompt_run


def test_chunk_metadata_bounds():
    """The handed-off metadata carries prefix_len=start, prefill_end=end
    and the full block table."""
    s = make_scheduler(chunk=8)
    add_prompt(s, "0", 19)
    meta, _ = s.schedule()
    assert meta[0].prefix_len == 0 and meta[0].prefill_end == 8
    meta, _ = s.schedule()
    assert meta[0].prefix_len == 8 and meta[0].prefill_end == 16
    # Pages for the WHOLE prompt were allocated up front.
    assert len(meta[0].block_tables[0]) == -(-19 // BLOCK)


def test_short_prompts_not_chunked_and_mixed_batch():
    """Prompts at or under the chunk run whole; a continuation and a
    fresh prompt share one prompt batch."""
    s = make_scheduler(chunk=8)
    g_long = add_prompt(s, "0", 20)
    _, out = s.schedule()          # chunk 1 of the long prompt
    assert out.prefill_chunks == {"0": (0, 8)}
    g_short = add_prompt(s, "1", 6)
    _, out = s.schedule()
    ids = [g.request_id for g in out.scheduled_seq_groups]
    assert ids == ["0", "1"]       # continuation first
    assert out.prefill_chunks == {"0": (8, 16)}
    assert not g_short.prefill_in_progress
    assert g_long.prefill_in_progress


def test_unfinished_accounting_includes_prefilling():
    s = make_scheduler(chunk=8)
    add_prompt(s, "0", 30)
    s.schedule()
    assert s.has_unfinished_seqs()
    assert s.get_num_unfinished_seq_groups() == 1
    s.abort_seq_group("0")
    assert not s.prefilling
    assert not s.has_unfinished_seqs()


def test_e2e_chunked_matches_whole_prompt():
    """Greedy outputs with chunked prefill are token-identical to the
    whole-prompt engine on the same checkpoint."""
    from models.utils import (hf_model_and_weights, save_local_checkpoint,
                              save_tiny_tokenizer, tiny_llama_config)

    from vllm_splitwise_tpu import LLM, SamplingParams

    cfg = tiny_llama_config()
    _, weights = hf_model_and_weights(cfg)
    d = tempfile.mkdtemp()
    save_local_checkpoint(cfg, weights, d)
    save_tiny_tokenizer(d)
    prompts = [[7] * 37 + [11] * 30, [5] * 9, [3] * 52]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    base = LLM(model=d, max_model_len=128, block_size=16)
    want = [o.outputs[0].token_ids
            for o in base.generate(prompt_token_ids=prompts,
                                   sampling_params=sp, use_tqdm=False)]
    del base

    chunked = LLM(model=d, max_model_len=128, block_size=16,
                  chunked_prefill_tokens=16)
    got = [o.outputs[0].token_ids
           for o in chunked.generate(prompt_token_ids=prompts,
                                     sampling_params=sp, use_tqdm=False)]
    assert got == want
