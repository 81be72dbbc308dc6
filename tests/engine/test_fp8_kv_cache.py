"""FP8/int8 KV-cache end-to-end (reference role: csrc fp8_e5m2 cache
support + --kv-cache-dtype flag): cache halves to 1 byte/elt; decode
attention dequantizes in-kernel."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_fp8"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


@pytest.mark.parametrize("cache_dtype", ["fp8_e5m2", "fp8_e4m3"])
def test_fp8_kv_cache_generation(setup, cache_dtype):
    import jax.numpy as jnp
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = setup
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1,
              kv_cache_dtype=cache_dtype)
    cache = llm.llm_engine.executor.worker.kv_caches
    k = cache[0] if isinstance(cache, tuple) else cache[0][0]
    assert "float8" in str(k.dtype)

    rng = np.random.RandomState(0)
    ids = rng.randint(3, config.vocab_size, size=16).tolist()
    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=6,
                                                       ignore_eos=True),
                        use_tqdm=False)
    got = outs[0].outputs[0].token_ids
    with torch.no_grad():
        ref = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                          do_sample=False)[0, 16:].tolist()
    # Prefill attends over fresh (full-precision) K/V: the first token is
    # exact; later tokens read the fp8 cache and may drift on a random
    # tiny model — require the first token and finite outputs.
    assert got[0] == ref[0]
    assert len(got) == 6
