"""Seeded sampling reproducibility (reference pattern:
tests/samplers/test_seeded_generate.py): identical seeds give identical
samples, different seeds diverge."""
import pytest

from vllm_splitwise_tpu import LLM, SamplingParams

from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                            save_tiny_tokenizer, tiny_llama_config)


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("seeded"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return LLM(model=d, dtype="float32", max_model_len=128,
               num_gpu_blocks_override=64, max_num_seqs=8,
               max_paddings=256, swap_space=0.1)


def _sample(llm, seed):
    outs = llm.generate(
        prompt_token_ids=[[5, 9, 23], [41, 7]],
        sampling_params=SamplingParams(temperature=1.0, seed=seed,
                                       max_tokens=8, ignore_eos=True))
    return [o.outputs[0].token_ids for o in outs]


def test_same_seed_reproduces(llm):
    assert _sample(llm, 1234) == _sample(llm, 1234)


def test_different_seeds_diverge(llm):
    # With temperature 1.0 over a 256-vocab random model, two seeds
    # producing 2x8 identical tokens is (1/256)^16-unlikely.
    assert _sample(llm, 1) != _sample(llm, 2)
