"""End-to-end fused (interleaved) KV layout: --kv-layout fused allocates
ONE page array per cache with K of logical block b at physical page 2b
and V at 2b+1 (one attention DMA per logical page).  Greedy output must
EXACTLY equal the split-layout engine's."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_fused"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, config


def _greedy(llm, prompts, max_tokens=12):
    from vllm_splitwise_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    return [o.outputs[0].token_ids for o in outs]


def _prompts(config, seed=3):
    rng = np.random.RandomState(seed)
    return [rng.randint(3, config.vocab_size, size=n).tolist()
            for n in (16, 9, 24)]


def _kwargs(d):
    return dict(model=d, dtype="float32", max_model_len=256,
                num_gpu_blocks_override=64, max_num_seqs=4,
                max_paddings=512, swap_space=0.05)


def test_fused_greedy_equals_split(ckpt):
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    prompts = _prompts(config)
    ref = _greedy(LLM(**_kwargs(d)), prompts)
    llm = LLM(kv_layout="fused", **_kwargs(d))
    worker = llm.llm_engine.executor.worker
    assert worker.cache_engine.fused
    kv = worker.cache_engine.device_cache
    assert kv[1] is None and kv[0].shape[1] == 2 * 64
    got = _greedy(llm, prompts)
    assert got == ref


def test_fused_int4_greedy_equals_split_int4(ckpt):
    """Fused layout composes with the int4 QuantPages cache."""
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    prompts = _prompts(config, seed=7)
    ref = _greedy(LLM(kv_cache_dtype="int4", **_kwargs(d)), prompts)
    llm = LLM(kv_cache_dtype="int4", kv_layout="fused", **_kwargs(d))
    got = _greedy(llm, prompts)
    assert got == ref


def test_fused_preemption_swap_roundtrip(ckpt):
    """Force SWAP-based preemption (beam groups: max_num_running_seqs > 1
    selects PreemptionMode.SWAP, scheduler.py) so the fused engine-level
    swap-out/swap-in paths run; output must still match the
    unconstrained split engine."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, config = ckpt
    rng = np.random.RandomState(13)
    # Two beam groups whose prompts fit TOGETHER at prefill (1 page
    # each) but whose beams outgrow the budget as they decode: the
    # scheduler must SWAP the lower-priority group out and back in.
    prompts = [rng.randint(3, config.vocab_size, size=16).tolist()
               for _ in range(2)]
    sp = SamplingParams(temperature=0.0, use_beam_search=True, best_of=2,
                        n=1, max_tokens=40, ignore_eos=True,
                        length_penalty=1.0, early_stopping=False)

    def beam(llm):
        outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                            use_tqdm=False)
        return [o.outputs[0].token_ids for o in outs]

    kwargs = _kwargs(d)
    kwargs["max_model_len"] = 144  # fits the 9-page budget below
    ref = beam(LLM(**kwargs))
    kwargs["num_gpu_blocks_override"] = 9
    llm = LLM(kv_layout="fused", **kwargs)
    got = beam(llm)
    scheduler = llm.llm_engine.scheduler
    assert scheduler.num_swapped_total > 0, (
        "test config no longer triggers swap preemption")
    assert got == ref


def _tiny_cache_engine(kv_layout, cache_dtype="auto"):
    import jax.numpy as jnp
    from transformers import LlamaConfig

    from vllm_splitwise_tpu.config import (CacheConfig, ModelConfig,
                                           ParallelConfig)
    from vllm_splitwise_tpu.worker.cache_engine import CacheEngine
    hf = LlamaConfig(vocab_size=128, hidden_size=256, intermediate_size=256,
                     num_hidden_layers=2, num_attention_heads=2,
                     num_key_value_heads=2, max_position_embeddings=128)
    mc = ModelConfig("x", "x", "auto", False, None, "auto", "float32", 0,
                     None, None, None, 128, None, False, None, 5,
                     hf_config=hf)
    cc = CacheConfig(block_size=16, hbm_utilization=0.9, swap_space=0.01,
                     cache_dtype=cache_dtype, kv_layout=kv_layout)
    cc.num_device_blocks = 8
    cc.num_host_blocks = 8
    pc = ParallelConfig(1, 1, False, False)
    return CacheEngine(cc, mc, pc, stacked=True)


def test_fused_cache_engine_swap_and_copy():
    """Fused layout swap/copy plans expand logical page ids to the
    interleaved [2i, 2i+1] physical pairs."""
    import jax.numpy as jnp
    eng = _tiny_cache_engine("fused")
    kv, none = eng.device_cache
    assert none is None and kv.shape[1] == 16  # 2 * 8 logical pages

    rng = np.random.RandomState(1)
    filled = jnp.asarray(rng.randn(*kv.shape), kv.dtype)
    eng.device_cache = (filled, None)

    # Copy logical 2 -> 6: physical (4,5) -> (12,13).
    eng.copy({2: [6]})
    kv2 = eng.device_cache[0]
    np.testing.assert_array_equal(np.asarray(kv2[:, 12:14]),
                                  np.asarray(filled[:, 4:6]))

    # Swap logical 1 out to host 5, zero device, swap host 5 into 3.
    eng.swap_out({1: 5})
    eng.device_cache = (jnp.zeros_like(filled), None)
    eng.swap_in({5: 3})
    kv3 = eng.device_cache[0]
    np.testing.assert_array_equal(np.asarray(kv3[:, 6:8]),
                                  np.asarray(filled[:, 2:4]))
    # Untouched logical pages stay zero.
    assert not np.asarray(kv3[:, :6]).any()


def test_fused_cache_engine_swap_int4():
    """Fused + int4 QuantPages: both leaves follow the doubled indices."""
    import jax.numpy as jnp

    from vllm_splitwise_tpu.ops.kv_cache import QuantPages
    eng = _tiny_cache_engine("fused", cache_dtype="int4")
    kv, none = eng.device_cache
    assert none is None and kv.data.shape[1] == 16

    rng = np.random.RandomState(2)
    filled = QuantPages(
        jnp.asarray(rng.randint(-128, 128, kv.data.shape), jnp.int8),
        jnp.asarray(rng.rand(*kv.scale.shape), jnp.bfloat16))
    eng.device_cache = (filled, None)
    eng.swap_out({2: 5})
    eng.device_cache = (QuantPages(jnp.zeros_like(filled.data),
                                   jnp.zeros_like(filled.scale)), None)
    eng.swap_in({5: 3})
    kv3 = eng.device_cache[0]
    np.testing.assert_array_equal(np.asarray(kv3.data[:, 6:8]),
                                  np.asarray(filled.data[:, 4:6]))
    np.testing.assert_array_equal(
        np.asarray(kv3.scale[:, 6:8]).view(np.uint16),
        np.asarray(filled.scale[:, 4:6]).view(np.uint16))
