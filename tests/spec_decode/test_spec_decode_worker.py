"""SpecDecodeWorker / MultiStepWorker unit tests with mock workers
(reference pattern: tests/spec_decode/test_spec_decode_worker.py and
test_multi_step_worker.py — mock draft/target workers, assert proposal
shapes, state isolation, and accept/reject plumbing)."""
from typing import List

import numpy as np

from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.sequence import (Logprob, SequenceData,
                                         SequenceGroupMetadata,
                                         SequenceGroupOutput,
                                         SequenceOutput)
from vllm_splitwise_tpu.spec_decode.interfaces import (SpeculativeProposals,
                                                       SpeculativeScores)
from vllm_splitwise_tpu.spec_decode.multi_step_worker import MultiStepWorker
from vllm_splitwise_tpu.spec_decode.spec_decode_worker import SpecDecodeWorker

VOCAB = 32


class FakeModelConfig:
    def get_vocab_size(self):
        return VOCAB


class FakeModelRunner:
    model_config = FakeModelConfig()


class FakeDraftWorker:
    """Emits token (last_token + 1) % VOCAB each step."""

    def __init__(self):
        self.model_runner = FakeModelRunner()
        self.calls = 0

    def execute_model(self, metas) -> List[SequenceGroupOutput]:
        self.calls += 1
        out = []
        for md in metas:
            seq_id = next(iter(md.seq_data))
            last = md.seq_data[seq_id].last_token
            tok = (last + 1) % VOCAB
            out.append(SequenceGroupOutput(
                samples=[SequenceOutput(seq_id, tok, {tok: Logprob(0.0)})],
                prompt_logprobs=None))
        return out


def make_meta(seq_id: int, tokens: List[int]) -> SequenceGroupMetadata:
    data = SequenceData(list(tokens))
    return SequenceGroupMetadata(
        request_id=str(seq_id), is_prompt=False,
        seq_data={seq_id: data},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={seq_id: [0]})


def test_multi_step_worker_proposals_and_isolation():
    worker = MultiStepWorker(FakeDraftWorker())
    metas = [make_meta(0, [3, 4]), make_meta(1, [10])]
    k = 3
    props = worker.get_proposals(metas, k)
    assert props.proposal_token_ids.shape == (2, k)
    assert props.proposal_probs.shape == (2, k, VOCAB)
    # Draft counts up from each sequence's last token.
    np.testing.assert_array_equal(props.proposal_token_ids[0], [5, 6, 7])
    np.testing.assert_array_equal(props.proposal_token_ids[1],
                                  [11, 12, 13])
    # One-hot draft distributions.
    assert props.proposal_probs[0, 0].sum() == 1.0
    assert props.proposal_probs[0, 0, 5] == 1.0
    np.testing.assert_array_equal(props.proposal_lens, [k, k])
    # Engine-owned metadata must be untouched (deep copy).
    assert metas[0].seq_data[0].token_ids == [3, 4]
    assert metas[1].seq_data[1].token_ids == [10]


class StubProposer:
    def __init__(self, proposals):
        self.proposals = proposals

    def get_proposals(self, metas, k):
        return self.proposals


class StubScorer:
    def __init__(self, scores):
        self.scores = scores

    def score_proposals(self, metas, proposals):
        return self.scores


def make_spec_worker(proposals, scores, k) -> SpecDecodeWorker:
    w = SpecDecodeWorker.__new__(SpecDecodeWorker)
    from vllm_splitwise_tpu.spec_decode.metrics import AsyncMetricsCollector
    from vllm_splitwise_tpu.spec_decode.spec_decode_worker import \
        SpecDecodeStats
    import jax
    w.proposer = StubProposer(proposals)
    w.scorer = StubScorer(scores)
    w.k = k
    w.stats = SpecDecodeStats()
    w.metrics_collector = AsyncMetricsCollector()
    w.metrics_collector.init_tensors(rank=0)
    w._key = jax.random.PRNGKey(0)
    return w


def one_hot(ids, vocab=VOCAB):
    ids = np.asarray(ids)
    out = np.zeros(ids.shape + (vocab, ), dtype=np.float32)
    np.put_along_axis(out, ids[..., None], 1.0, axis=-1)
    return out


def test_spec_worker_all_accept_emits_k_plus_one():
    k = 3
    drafts = np.asarray([[5, 6, 7]])
    # Target agrees on all drafts; bonus token 9 at position k.
    target_ids = np.asarray([[5, 6, 7, 9]])
    proposals = SpeculativeProposals(drafts, one_hot(drafts),
                                     np.full((1, ), k, np.int32))
    scores = SpeculativeScores(one_hot(target_ids), target_ids)
    w = make_spec_worker(proposals, scores, k)
    out = w.step([make_meta(0, [1, 2])])
    assert out.shape == (1, k + 1)
    np.testing.assert_array_equal(out[0], [5, 6, 7, 9])
    assert w.stats.num_accepted == k
    assert w.stats.num_emitted == k + 1


def test_spec_worker_first_reject_emits_target_token():
    k = 3
    drafts = np.asarray([[5, 6, 7]])
    # Target disagrees at position 0: emits its own token 8, drops rest.
    target_ids = np.asarray([[8, 6, 7, 9]])
    proposals = SpeculativeProposals(drafts, one_hot(drafts),
                                     np.full((1, ), k, np.int32))
    scores = SpeculativeScores(one_hot(target_ids), target_ids)
    w = make_spec_worker(proposals, scores, k)
    out = w.step([make_meta(0, [1, 2])])
    assert out[0, 0] == 8
    # Rejected positions padded with -1.
    assert (out[0, 1:] == -1).all()
    assert w.stats.num_accepted == 0
    assert w.stats.num_emitted == 1
