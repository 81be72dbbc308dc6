"""Tensor-parallel correctness on a virtual CPU mesh (reference pattern:
tests/distributed/test_basic_distributed_correctness.py — TP=2 vs HF)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_llama_tp"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


def test_tp2_greedy_matches_hf(tiny_checkpoint):
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, tensor_parallel_size=2)

    # Weights actually sharded over the 2-device model axis (layers are
    # stacked [L, H, O] for the scan path).
    q_proj = llm.llm_engine.executor.worker.model_runner.params["layers"][
        "q_proj"]
    assert len(q_proj.sharding.device_set) == 2

    rng = np.random.RandomState(0)
    prompt_ids = [
        rng.randint(3, config.vocab_size, size=rng.randint(8, 20)).tolist()
        for _ in range(4)
    ]
    max_tokens = 10
    outs = llm.generate(prompt_token_ids=prompt_ids,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=max_tokens,
                                                       ignore_eos=True),
                        use_tqdm=False)
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]),
                                 max_new_tokens=max_tokens,
                                 do_sample=False)
        assert out.outputs[0].token_ids == hf_out[0, len(ids):].tolist()


def test_tp2_splitwise_combined(tiny_checkpoint):
    """The fork's full configuration: TP=2 per pool x 2 pools = 4 chips."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, tensor_parallel_size=2,
              sep_prompt_token=True)
    executor = llm.llm_engine.executor
    assert executor.prefill_worker.mesh.size == 2
    assert executor.decode_worker.mesh.size == 2

    rng = np.random.RandomState(1)
    prompt_ids = [rng.randint(3, config.vocab_size, size=12).tolist()
                  for _ in range(2)]
    outs = llm.generate(prompt_token_ids=prompt_ids,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=6,
                                                       ignore_eos=True),
                        use_tqdm=False)
    import torch
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                                 do_sample=False)
        assert out.outputs[0].token_ids == hf_out[0, len(ids):].tolist()
