"""Beam-search outputs vs the HF beam-search oracle (reference pattern:
tests/samplers/test_beam_search.py — exact sequence equality at equal
beam width)."""
import numpy as np
import pytest

from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                            save_tiny_tokenizer, tiny_llama_config)

BEAM_WIDTH = 4
MAX_TOKENS = 8


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_beam"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


def test_beam_search_matches_hf(setup):
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = setup
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=128, max_num_seqs=8,
              max_paddings=512, swap_space=0.1)

    rng = np.random.RandomState(0)
    prompt_ids = [rng.randint(3, config.vocab_size, size=12).tolist()
                  for _ in range(2)]
    outs = llm.generate(
        prompt_token_ids=prompt_ids,
        sampling_params=SamplingParams(temperature=0.0,
                                       use_beam_search=True,
                                       best_of=BEAM_WIDTH, n=1,
                                       max_tokens=MAX_TOKENS,
                                       ignore_eos=True,
                                       length_penalty=1.0,
                                       early_stopping=False),
        use_tqdm=False)

    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(
                torch.tensor([ids]), num_beams=BEAM_WIDTH,
                num_return_sequences=1, max_new_tokens=MAX_TOKENS,
                do_sample=False, early_stopping=False, length_penalty=1.0)
        got = out.outputs[0].token_ids
        want = hf_out[0, len(ids):].tolist()
        assert got == want, (got, want)


def test_beam_search_n_beams_returned(setup):
    """n == best_of beams come back sorted by cumulative logprob."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = setup
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=128, max_num_seqs=8,
              max_paddings=512, swap_space=0.1)
    rng = np.random.RandomState(1)
    ids = [rng.randint(3, config.vocab_size, size=10).tolist()]
    outs = llm.generate(
        prompt_token_ids=ids,
        sampling_params=SamplingParams(temperature=0.0,
                                       use_beam_search=True,
                                       best_of=BEAM_WIDTH, n=BEAM_WIDTH,
                                       max_tokens=4, ignore_eos=True),
        use_tqdm=False)
    beams = outs[0].outputs
    assert len(beams) == BEAM_WIDTH
    # Distinct beams, best-first by cumulative logprob.
    assert len({tuple(b.token_ids) for b in beams}) > 1
    lps = [b.cumulative_logprob for b in beams]
    assert lps == sorted(lps, reverse=True)
