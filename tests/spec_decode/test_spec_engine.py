"""End-to-end speculative decoding through the engine (TPU extension —
the reference ships vllm/spec_decode as scaffolding without engine
wiring; here --speculative-model runs a fused draft-scan + multi-query
verify + rejection-sample step).

Greedy oracle: with temperature 0 the rejection sampler degenerates to
token equality against the target argmax, so spec output must EXACTLY
equal the non-speculative engine's greedy output."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_spec"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, config


@pytest.fixture(scope="module")
def draft_ckpt(tmp_path_factory):
    """A genuinely smaller draft (1 layer) sharing the target's vocab."""
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_draft"))
    config = tiny_llama_config(layers=1, hidden_size=32, heads=2,
                               kv_heads=2, intermediate=64)
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d


def _greedy(llm, prompts, max_tokens=12):
    from vllm_splitwise_tpu import SamplingParams
    sp = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                        ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    return [o.outputs[0].token_ids for o in outs]


def test_spec_greedy_equals_plain(ckpt):
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    rng = np.random.RandomState(11)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (16, 9, 24)]
    kwargs = dict(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=64, max_num_seqs=4,
                  max_paddings=512, swap_space=0.05)
    ref = _greedy(LLM(**kwargs), prompts)
    llm = LLM(speculative_model=d, num_speculative_tokens=3, **kwargs)
    got = _greedy(llm, prompts)
    assert got == ref

    stats = llm.llm_engine.executor.worker.model_runner.spec_stats
    # The draft IS the target here: only numeric near-ties on this random
    # tiny model can reject.
    assert stats.acceptance_rate > 0.9, stats.acceptance_rate
    assert stats.mean_tokens_per_step > 3.0, stats.mean_tokens_per_step


def test_spec_small_draft_correct_and_measured(ckpt, draft_ckpt):
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    rng = np.random.RandomState(5)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (12, 20)]
    kwargs = dict(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=64, max_num_seqs=4,
                  max_paddings=512, swap_space=0.05)
    ref = _greedy(LLM(**kwargs), prompts)
    llm = LLM(speculative_model=draft_ckpt, num_speculative_tokens=4,
              **kwargs)
    got = _greedy(llm, prompts)
    # Rejection sampling guarantees the target distribution regardless of
    # the (unrelated random) draft: greedy output must still match.
    assert got == ref
    stats = llm.llm_engine.executor.worker.model_runner.spec_stats
    assert stats.num_steps > 0
    # An unrelated draft proposes near-uniform junk: acceptance is low
    # but every step still emits at least one token.
    assert stats.mean_tokens_per_step >= 1.0


def test_spec_sampling_smoke(ckpt):
    """Temperature sampling with spec: runs, respects max_tokens, and a
    fixed seed reproduces within one engine."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, config = ckpt
    rng = np.random.RandomState(3)
    prompts = [rng.randint(3, config.vocab_size, size=10).tolist()]
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=4, max_paddings=512,
              swap_space=0.05, speculative_model=d,
              num_speculative_tokens=3)
    sp = SamplingParams(temperature=0.9, top_p=0.9, max_tokens=8,
                        ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    toks = outs[0].outputs[0].token_ids
    assert len(toks) == 8
    assert all(0 <= t < config.vocab_size for t in toks)


def test_spec_with_tensor_parallel(ckpt):
    """Spec decode over a 2-device model-parallel mesh: the draft params
    shard alongside the target's and greedy output still matches the
    non-speculative engine."""
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    rng = np.random.RandomState(7)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (10, 14)]
    kwargs = dict(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=64, max_num_seqs=4,
                  max_paddings=512, swap_space=0.05,
                  tensor_parallel_size=2)
    ref = _greedy(LLM(**kwargs), prompts, max_tokens=8)
    llm = LLM(speculative_model=d, num_speculative_tokens=3, **kwargs)
    runner = llm.llm_engine.executor.worker.model_runner
    assert len(runner.draft_params["layers"]["q_proj"].sharding
               .device_set) == 2
    got = _greedy(llm, prompts, max_tokens=8)
    assert got == ref


def test_spec_with_int4_kv_cache(ckpt):
    """Spec decode over int4 QuantPages caches (multi-query verify +
    draft scan both ride the nibble-packed pages)."""
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    rng = np.random.RandomState(9)
    prompts = [rng.randint(3, config.vocab_size, size=12).tolist()]
    kwargs = dict(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=64, max_num_seqs=4,
                  max_paddings=512, swap_space=0.05,
                  kv_cache_dtype="int4")
    ref = _greedy(LLM(**kwargs), prompts, max_tokens=8)
    llm = LLM(speculative_model=d, num_speculative_tokens=3, **kwargs)
    got = _greedy(llm, prompts, max_tokens=8)
    # int4 KV is lossy: require the continuation to match the plain
    # int4 engine exactly (same quantized cache semantics both sides).
    assert got == ref


def test_spec_logprobs_requests_degrade(ckpt):
    """Requests asking for logprobs must bypass the spec window (spec
    packs only top-1) and still return the requested number."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, config = ckpt
    rng = np.random.RandomState(4)
    prompts = [rng.randint(3, config.vocab_size, size=10).tolist()]
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=4, max_paddings=512,
              swap_space=0.05, speculative_model=d,
              num_speculative_tokens=3)
    sp = SamplingParams(temperature=0.0, max_tokens=4, logprobs=3,
                        ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    comp = outs[0].outputs[0]
    assert len(comp.token_ids) == 4
    for lp in comp.logprobs:
        assert len(lp) >= 3
    # No spec step should have run for this request.
    runner = llm.llm_engine.executor.worker.model_runner
    assert runner.spec_stats.num_steps == 0


def test_spec_config_validation(ckpt):
    from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
    d, _ = ckpt
    with pytest.raises(ValueError, match="mutually exclusive"):
        EngineArgs(model=d, speculative_model=d,
                   num_decode_steps=8).create_engine_configs()
    with pytest.raises(ValueError, match="LoRA"):
        EngineArgs(model=d, speculative_model=d,
                   enable_lora=True).create_engine_configs()


def test_spec_greedy_equals_plain_fused_kv(ckpt):
    """Speculative decoding composes with the fused interleaved KV
    layout (target AND draft caches both fused)."""
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    rng = np.random.RandomState(17)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (16, 9, 24)]
    kwargs = dict(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=64, max_num_seqs=4,
                  max_paddings=512, swap_space=0.05)
    ref = _greedy(LLM(**kwargs), prompts)
    llm = LLM(speculative_model=d, num_speculative_tokens=3,
              kv_layout="fused", **kwargs)
    worker = llm.llm_engine.executor.worker
    assert worker.cache_engine.fused and worker.draft_cache_engine.fused
    got = _greedy(llm, prompts)
    assert got == ref


def test_spec_with_mixed_pipeline(ckpt, draft_ckpt):
    """Speculative decoding composed with --mixed-batch and
    --pipeline-decode: spec steps invalidate the window carry so the
    pipeline permanently drains-and-re-enters — greedy outputs must
    still exactly equal the plain engine's."""
    from vllm_splitwise_tpu import LLM
    d, config = ckpt
    rng = np.random.RandomState(23)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (14, 22, 9)]
    kwargs = dict(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=128, max_num_seqs=4,
                  max_paddings=512, swap_space=0.05)
    ref = _greedy(LLM(**kwargs), prompts)
    llm = LLM(speculative_model=draft_ckpt, num_speculative_tokens=3,
              mixed_batch=True, pipeline_decode=True,
              chunked_prefill_tokens=16, max_num_prompt_seqs=1, **kwargs)
    got = _greedy(llm, prompts)
    assert got == ref
