"""Prefix-caching tests (reference pattern:
tests/prefix_caching/test_prefix_caching.py + test_cache_block_hashing.py):
block-manager hash reuse and end-to-end correctness with caching on."""
import numpy as np
import pytest

from vllm_splitwise_tpu.config import CacheConfig, SchedulerConfig
from vllm_splitwise_tpu.core.block_manager import BlockSpaceManager
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.sequence import Sequence, SequenceGroup


def make_seq(seq_id, token_ids, block_size=16):
    return Sequence(seq_id, "", token_ids, block_size, eos_token_id=2)


def test_block_hashes_shared_prefix():
    """Same-prefix sequences produce identical block hashes (reference
    tests/test_cache_block_hashing.py)."""
    prefix = list(range(100, 132))  # two full 16-token blocks
    a = make_seq(0, prefix + [1, 2, 3])
    b = make_seq(1, prefix + [7, 8, 9])
    assert a.hash_of_block(0) == b.hash_of_block(0)
    assert a.hash_of_block(1) == b.hash_of_block(1)
    c = make_seq(2, [5] + prefix)
    assert a.hash_of_block(0) != c.hash_of_block(0)


def test_block_manager_reuses_cached_blocks():
    bm = BlockSpaceManager(block_size=16, num_gpu_blocks=16,
                           num_cpu_blocks=0, enable_caching=True)
    prefix = list(range(100, 132))
    g1 = SequenceGroup("r1", [make_seq(0, prefix + [1])],
                       SamplingParams(), 0.0)
    bm.allocate(g1)
    free_after_first = bm.get_num_free_gpu_blocks()
    bm.mark_blocks_as_computed(g1)

    g2 = SequenceGroup("r2", [make_seq(1, prefix + [2])],
                       SamplingParams(), 0.0)
    bm.allocate(g2)
    free_after_second = bm.get_num_free_gpu_blocks()
    # The two full prefix blocks were shared, only the tail block is new.
    assert free_after_first - free_after_second == 1

    computed = bm.get_common_computed_block_ids(g2)
    assert len(computed) == 2

    t1 = bm.get_block_table(g1.get_seqs()[0])
    t2 = bm.get_block_table(g2.get_seqs()[0])
    assert t1[:2] == t2[:2]
    assert t1[2] != t2[2]


@pytest.fixture(scope="module")
def cached_llm(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    from vllm_splitwise_tpu import LLM
    d = str(tmp_path_factory.mktemp("tiny_prefix"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1,
              enable_prefix_caching=True)
    return llm, hf, config


def test_prefix_cached_generation_matches_hf(cached_llm):
    """Second request sharing a 2-block prefix computes only the suffix
    (prefix_len > 0 path) yet matches full HF generation."""
    import torch

    from vllm_splitwise_tpu import SamplingParams
    llm, hf, config = cached_llm
    rng = np.random.RandomState(0)
    prefix = rng.randint(3, config.vocab_size, size=32).tolist()
    p1 = prefix + rng.randint(3, config.vocab_size, size=5).tolist()
    p2 = prefix + rng.randint(3, config.vocab_size, size=7).tolist()

    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=[p1], sampling_params=sp,
                        use_tqdm=False)
    outs2 = llm.generate(prompt_token_ids=[p2], sampling_params=sp,
                         use_tqdm=False)
    for ids, out in ((p1, outs[0]), (p2, outs2[0])):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=8,
                              do_sample=False)
        assert out.outputs[0].token_ids == ref[0, len(ids):].tolist()


def test_prefix_split_matches_full_prefill_all_rows():
    """Splitting a prompt into (cached prefix, computed suffix) must give
    the SAME attention output at every suffix position as one full
    prefill.  Regression: the suffix causal mask offset only q positions,
    letting earlier suffix rows attend future suffix tokens (invisible to
    greedy generation — only the last row samples — but corrupting
    prompt logprobs and any chunked-prefill use)."""
    import jax.numpy as jnp

    from vllm_splitwise_tpu.ops.prefill_attention import prefill_attention
    rng = np.random.RandomState(0)
    B, T, H, D = 2, 12, 2, 16
    fq = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    fk = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    fv = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    ref = prefill_attention(fq, fk, fv, jnp.full((B, ), T, jnp.int32))
    P = 4
    out = prefill_attention(
        fq[:, P:], fk[:, P:], fv[:, P:],
        jnp.full((B, ), T - P, jnp.int32),
        start_positions=jnp.full((B, ), P, jnp.int32),
        prefix_kv=(fk[:, :P], fv[:, :P], jnp.full((B, ), P, jnp.int32)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref[:, P:]),
                               atol=1e-5)
