"""Behavioral regression tests (reference pattern: tests/test_regression.py
— user-reported failure modes that must never recur, adapted to local
tiny checkpoints)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_llm(tmp_path_factory):
    from vllm_splitwise_tpu import LLM

    from .models.utils import (hf_model_and_weights, save_local_checkpoint,
                               save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_reg"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              num_gpu_blocks_override=64, max_num_seqs=4,
              max_paddings=256, swap_space=0.1)
    return llm, config


def test_over_length_prompt_ignored_not_duplicated(tiny_llm):
    """A prompt longer than max_model_len must be finished-ignored once,
    alongside normal prompts (reference: vllm issue 1655 — the ignored
    group was emitted twice)."""
    from vllm_splitwise_tpu import SamplingParams
    llm, config = tiny_llm
    rng = np.random.RandomState(0)
    prompts = [
        rng.randint(3, config.vocab_size, size=8).tolist(),
        rng.randint(3, config.vocab_size, size=500).tolist(),  # > 128
    ]
    outs = llm.generate(prompt_token_ids=prompts,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=4,
                                                       ignore_eos=True),
                        use_tqdm=False)
    assert len(outs) == len(prompts)
    ids = [o.request_id for o in outs]
    assert len(ids) == len(set(ids))
    # The over-length request finishes with no generated output.
    long_out = outs[1]
    assert long_out.outputs[0].finish_reason in ("length", "abort",
                                                 "ignored", "stop")


def test_max_tokens_none_generates_until_cap(tiny_llm):
    from vllm_splitwise_tpu import SamplingParams
    llm, config = tiny_llm
    rng = np.random.RandomState(1)
    prompts = [rng.randint(3, config.vocab_size, size=8).tolist()]
    outs = llm.generate(prompt_token_ids=prompts,
                        sampling_params=SamplingParams(temperature=0.01,
                                                       top_p=0.1,
                                                       max_tokens=None),
                        use_tqdm=False)
    assert len(outs) == 1
    # Generation ran to model-length cap or a stop token, not an error.
    assert len(outs[0].outputs[0].token_ids) >= 1


def test_engine_shutdown_releases_engine(tiny_llm, tmp_path):
    """Engine deletion must not leave the next engine unable to start
    (reference test_gc role; HBM release is the TPU analog)."""
    import gc

    from vllm_splitwise_tpu import LLM, SamplingParams

    from .models.utils import (hf_model_and_weights, save_local_checkpoint,
                               save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path)
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              num_gpu_blocks_override=32, max_num_seqs=2,
              max_paddings=256, swap_space=0.1)
    del llm
    gc.collect()
    llm2 = LLM(model=d, dtype="float32", max_model_len=128,
               num_gpu_blocks_override=32, max_num_seqs=2,
               max_paddings=256, swap_space=0.1)
    outs = llm2.generate(prompt_token_ids=[[3, 4, 5]],
                         sampling_params=SamplingParams(temperature=0.0,
                                                        max_tokens=2,
                                                        ignore_eos=True),
                         use_tqdm=False)
    assert len(outs) == 1
