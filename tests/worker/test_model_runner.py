"""ModelRunner input-preparation oracle (reference pattern:
tests/worker/test_model_runner.py — `_prepare_prompt` / `_prepare_decode`
shape and slot-mapping checks, no model needed)."""
import numpy as np
import pytest

from vllm_splitwise_tpu.config import (CacheConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.sequence import (SequenceData,
                                         SequenceGroupMetadata)
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.worker.model_runner import ModelRunner

from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                            save_tiny_tokenizer, tiny_llama_config)

BLOCK = 16


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("runner"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return ModelRunner(
        ModelConfig(d, dtype="float32", max_model_len=256),
        ParallelConfig(),
        SchedulerConfig(max_num_batched_tokens=2048, max_num_seqs=8,
                        max_model_len=256),
        CacheConfig(block_size=BLOCK, swap_space=0.1))


def _group(rid, token_ids, block_table, prefix_len=0, is_prompt=True):
    return SequenceGroupMetadata(
        request_id=rid, is_prompt=is_prompt,
        seq_data={int(rid): SequenceData(list(token_ids))},
        sampling_params=SamplingParams(),
        block_tables={int(rid): list(block_table)},
        prefix_len=prefix_len)


def test_prepare_prompt_slot_mapping(runner):
    # Two prompts of different lengths; hand-computed slot mapping.
    g0 = _group("0", range(100, 100 + 20), [3, 7])       # 20 tokens
    g1 = _group("1", range(200, 200 + 5), [9])           # 5 tokens
    input_ids, positions, md, seq_lens = runner._prepare_prompt([g0, g1])

    assert seq_lens == [20, 5]
    assert input_ids.shape == positions.shape
    assert input_ids.shape[1] >= 20                      # bucket-padded
    np.testing.assert_array_equal(input_ids[0, :20],
                                  np.arange(100, 120))
    np.testing.assert_array_equal(positions[0, :20], np.arange(20))

    slots = np.asarray(md.slot_mapping)
    # token i of seq 0 lives at page block_table[i//16] * 16 + i%16
    expect0 = [(3 if i < 16 else 7) * BLOCK + i % BLOCK for i in range(20)]
    np.testing.assert_array_equal(slots[0, :20], expect0)
    np.testing.assert_array_equal(slots[1, :5],
                                  [9 * BLOCK + i for i in range(5)])
    # Padding slots are parked at -1 (masked store).
    assert (slots[0, 20:] == -1).all() and (slots[1, 5:] == -1).all()


def test_prepare_prompt_with_prefix(runner):
    # 16 cached prefix tokens on page 5, 4 fresh tokens on page 8.
    g = _group("2", range(300, 300 + 20), [5, 8], prefix_len=16)
    input_ids, positions, md, seq_lens = runner._prepare_prompt([g])
    assert seq_lens == [4]
    np.testing.assert_array_equal(input_ids[0, :4],
                                  np.arange(316, 320))
    np.testing.assert_array_equal(positions[0, :4], [16, 17, 18, 19])
    np.testing.assert_array_equal(
        np.asarray(md.slot_mapping)[0, :4],
        [8 * BLOCK + 0, 8 * BLOCK + 1, 8 * BLOCK + 2, 8 * BLOCK + 3])
    assert md.block_tables is not None
    assert np.asarray(md.block_tables)[0, 0] == 5
    assert int(np.asarray(md.prefix_lens)[0]) == 16


def test_prepare_decode_bucketing(runner):
    groups = []
    for i in range(3):
        data = SequenceData(list(range(10 + i)))
        data.append_token(7, 0.0)                # one generated token
        groups.append(SequenceGroupMetadata(
            request_id=str(i), is_prompt=False,
            seq_data={i: data},
            sampling_params=SamplingParams(),
            block_tables={i: [i * 2, i * 2 + 1]}))
    input_ids, positions, md, batch = runner._prepare_decode(groups)

    assert batch == 3                              # real rows
    assert input_ids.shape[0] >= batch             # bucket-padded batch
    assert input_ids.shape[1] == 1
    ctx = np.asarray(md.context_lens)
    np.testing.assert_array_equal(ctx[:3], [11, 12, 13])
    # Last token of seq i sits at position ctx-1 in its block table.
    slots = np.asarray(md.slot_mapping)
    for i in range(3):
        pos = 10 + i                               # index of new token
        page = [i * 2, i * 2 + 1][pos // BLOCK]
        assert slots[i] == page * BLOCK + pos % BLOCK
