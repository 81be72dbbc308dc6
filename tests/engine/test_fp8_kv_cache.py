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


def test_quantize_for_cache_int8_roundtrip():
    import jax.numpy as jnp

    from vllm_splitwise_tpu.ops.kv_cache import quantize_for_cache
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.standard_normal((4, 2, 8)).astype(np.float32))
    scale = 1.0 / 16.0
    q = quantize_for_cache(x, jnp.int8, scale)
    assert q.dtype == jnp.int8
    deq = np.asarray(q, dtype=np.float32) * scale
    # Round-to-nearest: error bounded by half a quantization step.
    assert np.abs(deq - np.asarray(x)).max() <= scale / 2 + 1e-6


def test_int8_kv_cache_generation(setup):
    """int8 KV cache stores x/kv_scale (default 1/16); first decode token
    must match the full-precision oracle."""
    import jax.numpy as jnp
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = setup
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, kv_cache_dtype="int8")
    worker = llm.llm_engine.executor.worker
    cache = worker.kv_caches
    k = cache[0] if isinstance(cache, tuple) else cache[0][0]
    assert k.dtype == jnp.int8
    assert worker.model_runner.model.attn[0].kv_scale == 1.0 / 16.0

    rng = np.random.RandomState(3)
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
    assert got[0] == ref[0]
    assert len(got) == 6


def test_int4_kv_cache_generation(setup):
    """int4 KV: nibble-packed QuantPages (data + per-token scales); the
    cache shrinks to half a byte per element + 2 scale bytes per row."""
    import jax.numpy as jnp
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    from vllm_splitwise_tpu.ops.kv_cache import QuantPages
    d, hf, config = setup
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, kv_cache_dtype="int4")
    worker = llm.llm_engine.executor.worker
    cache = worker.kv_caches
    k = cache[0] if isinstance(cache, tuple) else cache[0][0]
    assert isinstance(k, QuantPages)
    assert k.data.dtype == jnp.int8
    head_dim = (config.hidden_size // config.num_attention_heads)
    assert k.data.shape[-1] == head_dim
    # token pairs per byte row; one scale per real token
    assert k.data.shape[-2] * 2 == k.scale.shape[-1]
    assert k.scale.dtype == jnp.bfloat16

    rng = np.random.RandomState(3)
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
    # Prefill attends over fresh full-precision K/V, so the first output
    # token is exact; later tokens read the int4 cache and may drift on a
    # random (structureless) tiny model.
    assert got[0] == ref[0]
    assert len(got) == 6


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
