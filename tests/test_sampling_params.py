"""SamplingParams validation tests (reference pattern:
tests/test_sampling_params.py plus the class's own _verify_args rules)."""
import pytest

from vllm_splitwise_tpu import SamplingParams


def test_max_tokens_none():
    """max_tokens=None (generate until stop) must be allowed."""
    SamplingParams(temperature=0.01, top_p=0.1, max_tokens=None)


def test_defaults_valid():
    p = SamplingParams()
    assert p.n == 1
    assert p.temperature == 1.0


@pytest.mark.parametrize("kwargs", [
    dict(n=0),
    dict(best_of=2, n=3),
    dict(temperature=-0.1),
    dict(top_p=0.0),
    dict(top_p=1.5),
    dict(top_k=0),
    dict(max_tokens=0),
    dict(presence_penalty=3.0),
    dict(frequency_penalty=-3.0),
    dict(repetition_penalty=0.0),
    dict(logprobs=-1),
])
def test_invalid_params_raise(kwargs):
    with pytest.raises(ValueError):
        SamplingParams(**kwargs)


def test_beam_search_requires_width():
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=1)
    SamplingParams(use_beam_search=True, best_of=2, temperature=0.0)


def test_greedy_rejects_multiple_draws():
    # best_of > 1 with temperature 0 cannot draw distinct samples.
    with pytest.raises(ValueError):
        SamplingParams(temperature=0.0, best_of=2)
