"""Multi-step (fused-window) decode: K scheduler steps per device
dispatch must be observationally identical to K single steps.

TPU extension with no reference analog (the reference's CUDA-graph decode
still runs one step per executor round-trip); these tests pin the
equivalence contract: greedy tokens, seeded-random tokens, stop handling
and overshoot-discard all match --num-decode-steps=1 exactly.
"""
import numpy as np
import pytest

from vllm_splitwise_tpu import LLM, SamplingParams

from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                            save_tiny_tokenizer, tiny_llama_config)


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_llama_ms"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


def _make_llm(model_dir, num_decode_steps):
    return LLM(model=model_dir, dtype="float32", max_model_len=256,
               num_gpu_blocks_override=128, block_size=16,
               max_num_seqs=16, max_paddings=512,
               num_decode_steps=num_decode_steps)


def _prompts(seed, n, lo=8, hi=24, vocab=256):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(3, vocab, size=rng.randint(lo, hi)).tolist()
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def llm_single(tiny_checkpoint):
    d, _, _ = tiny_checkpoint
    return _make_llm(d, 1)


@pytest.fixture(scope="module")
def llm_multi(tiny_checkpoint):
    d, _, _ = tiny_checkpoint
    return _make_llm(d, 4)


def _generate(llm, prompt_ids, sp):
    outs = llm.generate(prompt_token_ids=[list(p) for p in prompt_ids],
                        sampling_params=sp, use_tqdm=False)
    return [o.outputs[0].token_ids for o in outs]


def test_greedy_equivalence(llm_single, llm_multi):
    prompt_ids = _prompts(11, 6)
    sp = SamplingParams(temperature=0.0, max_tokens=19, ignore_eos=True)
    assert _generate(llm_multi, prompt_ids, sp) == \
        _generate(llm_single, prompt_ids, sp)


def test_seeded_equivalence(llm_single, llm_multi):
    prompt_ids = _prompts(12, 4)
    sp = SamplingParams(temperature=0.8, seed=1234, max_tokens=17,
                        ignore_eos=True)
    assert _generate(llm_multi, prompt_ids, sp) == \
        _generate(llm_single, prompt_ids, sp)


def test_stop_and_overshoot(llm_single, llm_multi, tiny_checkpoint):
    # EOS may land mid-window: the overshoot tokens must be discarded and
    # finish_reason preserved.
    _, _, config = tiny_checkpoint
    prompt_ids = _prompts(13, 8)
    sp = SamplingParams(temperature=0.0, max_tokens=32)
    single = llm_single.generate(
        prompt_token_ids=[list(p) for p in prompt_ids],
        sampling_params=sp, use_tqdm=False)
    multi = llm_multi.generate(
        prompt_token_ids=[list(p) for p in prompt_ids],
        sampling_params=sp, use_tqdm=False)
    for s, m in zip(single, multi):
        assert m.outputs[0].token_ids == s.outputs[0].token_ids
        assert m.outputs[0].finish_reason == s.outputs[0].finish_reason


def test_max_tokens_not_exceeded(llm_multi):
    # max_tokens smaller than the window: output length must cap exactly.
    prompt_ids = _prompts(14, 3)
    sp = SamplingParams(temperature=0.0, max_tokens=2, ignore_eos=True)
    for ids in _generate(llm_multi, prompt_ids, sp):
        assert len(ids) == 2


def test_ineligible_batch_falls_back(llm_multi, llm_single):
    # Penalties force the scheduler window to 1; output must still be
    # correct (matches the single-step engine with identical params).
    prompt_ids = _prompts(15, 3)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True,
                        repetition_penalty=1.3)
    assert _generate(llm_multi, prompt_ids, sp) == \
        _generate(llm_single, prompt_ids, sp)
