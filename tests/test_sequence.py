"""Sequence data-model tests (reference pattern: tests/test_sequence.py
adapted to this build's SamplerOutput = List[SequenceGroupOutput])."""
import pytest

from vllm_splitwise_tpu.sequence import (Logprob, Sequence,
                                         SequenceGroupOutput,
                                         SequenceOutput, SequenceStatus)


@pytest.fixture
def sample_outputs():
    return [
        SequenceGroupOutput(samples=[
            SequenceOutput(parent_seq_id=0, output_token=i, logprobs={})
        ], prompt_logprobs=None) for i in range(5)
    ]


def test_sequence_group_output_eq(sample_outputs):
    a = SequenceGroupOutput(samples=[
        SequenceOutput(parent_seq_id=0, output_token=1, logprobs={})
    ], prompt_logprobs=None)
    b = SequenceGroupOutput(samples=[
        SequenceOutput(parent_seq_id=0, output_token=1, logprobs={})
    ], prompt_logprobs=None)
    c = SequenceGroupOutput(samples=[
        SequenceOutput(parent_seq_id=0, output_token=2, logprobs={})
    ], prompt_logprobs=None)
    assert a == b
    assert a != c


def test_sampler_output_list_semantics(sample_outputs):
    out = list(sample_outputs)
    assert len(out) == 5
    assert out[2] == sample_outputs[2]
    replacement = SequenceGroupOutput(samples=[
        SequenceOutput(parent_seq_id=0, output_token=99, logprobs={})
    ], prompt_logprobs=None)
    out[2] = replacement
    assert out[2] == replacement
    assert out != sample_outputs


def test_sequence_append_and_fork():
    seq = Sequence(seq_id=1, prompt="ab", prompt_token_ids=[1, 2],
                   block_size=4)
    assert seq.num_tokens == 2
    assert seq.prompt_len == 2
    seq.append_token(7, {7: Logprob(-0.5)})
    assert seq.num_tokens == 3
    assert seq.output_len == 1
    assert seq.last_token == 7

    fork = seq.fork(new_seq_id=2)
    assert fork.seq_id == 2
    assert fork.data.token_ids == seq.data.token_ids
    fork.append_token(9, {9: Logprob(-0.25)})
    # Fork is independent of the parent.
    assert seq.output_len == 1
    assert fork.output_len == 2


def test_sequence_logical_blocks():
    seq = Sequence(seq_id=1, prompt="", prompt_token_ids=list(range(9)),
                   block_size=4)
    # 9 tokens at block_size 4 -> 3 logical blocks, last holds one token.
    assert seq.num_logical_blocks() == 3
    assert seq.last_block_num_tokens() == 1


def test_sequence_status_finished():
    assert SequenceStatus.is_finished(SequenceStatus.FINISHED_STOPPED)
    assert SequenceStatus.is_finished(SequenceStatus.FINISHED_ABORTED)
    assert not SequenceStatus.is_finished(SequenceStatus.RUNNING)
    assert not SequenceStatus.is_finished(SequenceStatus.WAITING)
