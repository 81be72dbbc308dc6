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
    assert seq.get_len() == 2
    assert seq.get_prompt_len() == 2
    seq.append_token_id(7, {7: Logprob(-0.5)})
    assert seq.get_len() == 3
    assert seq.get_output_len() == 1
    assert seq.get_last_token_id() == 7

    fork = seq.fork(new_seq_id=2)
    assert fork.seq_id == 2
    assert fork.data.get_token_ids() == seq.data.get_token_ids()
    fork.append_token_id(9, {9: Logprob(-0.25)})
    # Fork is independent of the parent.
    assert seq.get_output_len() == 1
    assert fork.get_output_len() == 2


def test_sequence_logical_blocks():
    seq = Sequence(seq_id=1, prompt="", prompt_token_ids=list(range(9)),
                   block_size=4)
    # 9 tokens at block_size 4 -> 3 logical blocks, last holds one token.
    assert len(seq.logical_token_blocks) == 3
    assert seq.logical_token_blocks[-1].num_tokens == 1


def test_sequence_status_finished():
    assert SequenceStatus.is_finished(SequenceStatus.FINISHED_STOPPED)
    assert SequenceStatus.is_finished(SequenceStatus.FINISHED_ABORTED)
    assert not SequenceStatus.is_finished(SequenceStatus.RUNNING)
    assert not SequenceStatus.is_finished(SequenceStatus.WAITING)
