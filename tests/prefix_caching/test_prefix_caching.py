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


def test_prefix_multiquery_kernel_matches_dense():
    """The TPU prefix path (multi-query paged kernel over prefix+suffix
    pages with ctx = prefix + padded_suffix) must match the dense
    prefix_kv path at every VALID suffix row, including ragged suffixes."""
    import jax
    import jax.numpy as jnp

    from vllm_splitwise_tpu.ops.paged_attention import paged_attention
    from vllm_splitwise_tpu.ops.prefill_attention import prefill_attention

    rng = np.random.RandomState(0)
    B, H, D, PS = 2, 4, 128, 16
    prefix_lens = np.asarray([32, 16], np.int32)
    suf_lens = np.asarray([8, 5], np.int32)
    T = 8  # padded suffix

    num_pages = 16
    kp = np.zeros((num_pages, H, PS, D), np.float32)
    vp = np.zeros((num_pages, H, PS, D), np.float32)
    bt = np.zeros((B, 4), np.int32)
    q = jnp.asarray(rng.randn(B, T, H, D), jnp.float32)
    k_pre, v_pre = [], []
    next_page = 0
    for b in range(B):
        total = int(prefix_lens[b]) + T
        kv_k = rng.randn(total, H, D).astype(np.float32)
        kv_v = rng.randn(total, H, D).astype(np.float32)
        npages = -(-total // PS)
        for j in range(npages):
            pg = next_page; next_page += 1
            bt[b, j] = pg
            chunk_k = kv_k[j * PS:(j + 1) * PS]
            kp[pg, :, :chunk_k.shape[0]] = chunk_k.transpose(1, 0, 2)
            chunk_v = kv_v[j * PS:(j + 1) * PS]
            vp[pg, :, :chunk_v.shape[0]] = chunk_v.transpose(1, 0, 2)
        k_pre.append(kv_k[:int(prefix_lens[b])])
        v_pre.append(kv_v[:int(prefix_lens[b])])

    # Dense oracle: suffix k/v fresh + prefix via prefix_kv.
    pmax = int(prefix_lens.max())
    kpre = np.zeros((B, pmax, H, D), np.float32)
    vpre = np.zeros((B, pmax, H, D), np.float32)
    ksuf = np.zeros((B, T, H, D), np.float32)
    vsuf = np.zeros((B, T, H, D), np.float32)
    for b in range(B):
        p = int(prefix_lens[b])
        kpre[b, :p] = k_pre[b]
        vpre[b, :p] = v_pre[b]
    # Suffix k/v as stored in the pages (positions prefix..prefix+T).
    for b in range(B):
        p = int(prefix_lens[b])
        for t in range(T):
            pos = p + t
            pg = bt[b, pos // PS]
            ksuf[b, t] = kp[pg, :, pos % PS]
            vsuf[b, t] = vp[pg, :, pos % PS]

    ref = prefill_attention(
        q, jnp.asarray(ksuf), jnp.asarray(vsuf),
        jnp.asarray(suf_lens),
        start_positions=jnp.asarray(prefix_lens),
        prefix_kv=(jnp.asarray(kpre), jnp.asarray(vpre),
                   jnp.asarray(prefix_lens)))

    on_tpu = jax.devices()[0].platform == "tpu"
    out = paged_attention(q, jnp.asarray(kp), jnp.asarray(vp),
                          jnp.asarray(bt),
                          jnp.asarray(prefix_lens + T, dtype=np.int32),
                          pages_per_chunk=2, interpret=not on_tpu)
    for b in range(B):
        n = int(suf_lens[b])
        np.testing.assert_allclose(np.asarray(out[b, :n]),
                                   np.asarray(ref[b, :n]), atol=2e-2,
                                   rtol=2e-2)


def test_prefix_cached_generation_fused_kv(tmp_path_factory):
    """Prefix-cached prefill over the fused interleaved layout: suffix
    queries gather the cached prefix from physical pages (2b, 2b+1) and
    output must exactly match HF."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_prefix_fused"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1,
              enable_prefix_caching=True, kv_layout="fused")

    rng = np.random.RandomState(21)
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
