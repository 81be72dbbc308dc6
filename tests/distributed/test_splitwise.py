"""Splitwise phase-disaggregation tests.

Ports the reference's KV-comm integration test pattern
(tests/distributed/test_kvcache_comm.py: pattern-fill the prompt pool's
cache, push everything, assert token-pool equality) and adds an
end-to-end greedy-equality run with ``sep_prompt_token=True`` on two
virtual CPU devices.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_llama_sw"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


@pytest.fixture(scope="module")
def splitwise_llm(tiny_checkpoint):
    from vllm_splitwise_tpu import LLM
    d, _, _ = tiny_checkpoint
    return LLM(model=d, dtype="float32", max_model_len=256,
               num_gpu_blocks_override=64, block_size=16,
               max_num_seqs=8, max_paddings=512, swap_space=0.1,
               sep_prompt_token=True)


def test_kvcache_comm(splitwise_llm):
    """Pattern-fill prefill cache -> push all pages -> verify decode side
    (reference tests/distributed/test_kvcache_comm.py:27-42)."""
    executor = splitwise_llm.llm_engine.executor
    executor.set_prefill_cache_pattern(3.25)
    assert not executor.check_decode_cache_pattern(3.25)
    executor.send_recv_kvcache_all()
    assert executor.check_decode_cache_pattern(3.25)
    # Reset for later tests.
    executor.set_prefill_cache_pattern(0.0)
    executor.send_recv_kvcache_all()
    executor.kv_migration._migrated_slots.clear()


def test_splitwise_pools_are_distinct_devices(splitwise_llm):
    executor = splitwise_llm.llm_engine.executor
    prefill_devs = set(executor.prefill_worker.mesh.devices.flat)
    decode_devs = set(executor.decode_worker.mesh.devices.flat)
    assert prefill_devs.isdisjoint(decode_devs)


def test_splitwise_greedy_matches_hf(splitwise_llm, tiny_checkpoint):
    """Full disaggregated path: prefill on pool A, KV migration, decode on
    pool B — greedy tokens must equal HF."""
    import torch

    from vllm_splitwise_tpu import SamplingParams
    _, hf, config = tiny_checkpoint

    rng = np.random.RandomState(0)
    prompt_ids = [
        rng.randint(3, config.vocab_size, size=rng.randint(8, 24)).tolist()
        for _ in range(6)
    ]
    max_tokens = 12
    outs = splitwise_llm.generate(
        prompt_token_ids=prompt_ids,
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

    # Migration actually happened (pages moved prefill -> decode) and the
    # layer-streamed path (not the bulk fallback) carried it.
    executor = splitwise_llm.llm_engine.executor
    assert executor.kv_migration.num_migrations >= 1
    assert executor.kv_migration.num_pages_moved > 0
    assert executor.kv_migration.num_streamed >= 1


def test_splitwise_continuous_stream(splitwise_llm, tiny_checkpoint):
    """Interleaved prompt/decode steps: submit in two waves so prefills of
    wave 2 interleave with decodes of wave 1."""
    from vllm_splitwise_tpu import SamplingParams
    _, _, config = tiny_checkpoint
    engine = splitwise_llm.llm_engine
    rng = np.random.RandomState(1)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    for i in range(3):
        engine.add_request(f"w1-{i}", None, sp,
                           rng.randint(3, 256, size=10).tolist())
    # A few steps: prefill wave 1, start decoding.
    for _ in range(3):
        engine.step()
    for i in range(3):
        engine.add_request(f"w2-{i}", None, sp,
                           rng.randint(3, 256, size=10).tolist())
    finished = []
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                finished.append(out)
    assert len(finished) == 6
    for out in finished:
        assert len(out.outputs[0].token_ids) == 8


def test_splitwise_multi_step_decode(tiny_checkpoint):
    """Disaggregation + multi-step decode: the decode pool runs fused
    K-step windows after KV migration; greedy output must match HF."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, block_size=16,
              max_num_seqs=8, max_paddings=512, swap_space=0.1,
              sep_prompt_token=True, num_decode_steps=4)
    rng = np.random.RandomState(2)
    prompt_ids = [
        rng.randint(3, config.vocab_size, size=rng.randint(8, 24)).tolist()
        for _ in range(4)
    ]
    max_tokens = 11  # not a multiple of the window: exercises overshoot
    outs = llm.generate(
        prompt_token_ids=prompt_ids,
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
    assert llm.llm_engine.executor.kv_migration.num_migrations >= 1


def test_splitwise_int4_kv_migration(tiny_checkpoint):
    """Disaggregated serving over int4 QuantPages caches: the KV
    migration must move data AND scale leaves (tree-mapped paths), and
    decode on the token pool must continue the prefill correctly."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, block_size=16,
              max_num_seqs=8, max_paddings=512, swap_space=0.1,
              sep_prompt_token=True, kv_cache_dtype="int4")

    from vllm_splitwise_tpu.ops.kv_cache import QuantPages
    dec = llm.llm_engine.executor.decode_worker.kv_caches
    assert isinstance(dec[0], QuantPages)

    import torch
    rng = np.random.RandomState(2)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (14, 9)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    km = llm.llm_engine.executor.kv_migration
    assert km.num_migrations > 0 and km.num_pages_moved > 0
    for ids, out in zip(prompts, outs):
        got = out.outputs[0].token_ids
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                              do_sample=False)[0, len(ids):].tolist()
        # First token comes from full-precision prefill attention and
        # must be exact; later tokens read the int4 cache on the decode
        # pool (finite, in-vocab — exactness not guaranteed on a random
        # tiny model).
        assert got[0] == ref[0]
        assert len(got) == 6
        assert all(0 <= t < config.vocab_size for t in got)


def test_splitwise_with_speculative_decoding(tiny_checkpoint):
    """Spec decode on the disaggregated decode pool: draft KV pages
    migrate alongside the target's, and greedy output matches the plain
    (non-disaggregated, non-speculative) engine exactly."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = tiny_checkpoint
    rng = np.random.RandomState(6)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (12, 17)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    base = LLM(model=d, dtype="float32", max_model_len=256,
               num_gpu_blocks_override=64, block_size=16, max_num_seqs=8,
               max_paddings=512, swap_space=0.1)
    ref = [o.outputs[0].token_ids for o in base.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    del base

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, block_size=16, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, sep_prompt_token=True,
              speculative_model=d, num_speculative_tokens=3)
    got = [o.outputs[0].token_ids for o in llm.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    assert got == ref

    stats = llm.llm_engine.executor.decode_worker.model_runner.spec_stats
    assert stats.num_steps > 0
    assert stats.acceptance_rate > 0.8, stats.acceptance_rate


def test_splitwise_fused_kv_migration(tiny_checkpoint):
    """Disaggregated serving over the fused interleaved layout: the KV
    migration expands logical page ids to [2i, 2i+1] physical pairs, and
    greedy output must exactly match HF (full-precision cache)."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, block_size=16,
              max_num_seqs=8, max_paddings=512, swap_space=0.1,
              sep_prompt_token=True, kv_layout="fused")

    dec = llm.llm_engine.executor.decode_worker.kv_caches
    assert dec[1] is None and dec[0].shape[1] == 2 * 64

    import torch
    rng = np.random.RandomState(4)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (14, 9)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    km = llm.llm_engine.executor.kv_migration
    assert km.num_migrations > 0 and km.num_pages_moved > 0
    for ids, out in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=6,
                              do_sample=False)[0, len(ids):].tolist()
        assert out.outputs[0].token_ids == ref


def test_layer_streamed_migration_segments(tiny_checkpoint):
    """The prefill dispatches as layer-group segments, pushing each
    group's pages mid-forward (the reference's per-layer put(),
    flash_attn.py:82-86); output must equal a bulk-migration run
    (--kv-stream-segments 1)."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    from vllm_splitwise_tpu.worker.kv_migration import MigrationStream
    d, hf, config = tiny_checkpoint
    rng = np.random.RandomState(7)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (13, 21)]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)

    pushes = []
    orig_push = MigrationStream.push

    def counting_push(self, layer_start, num_layers, kv_caches):
        pushes.append((layer_start, num_layers))
        return orig_push(self, layer_start, num_layers, kv_caches)

    MigrationStream.push = counting_push
    try:
        llm = LLM(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=64, block_size=16,
                  max_num_seqs=8, max_paddings=512, swap_space=0.1,
                  sep_prompt_token=True)
        streamed = [o.outputs[0].token_ids for o in llm.generate(
            prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
        km = llm.llm_engine.executor.kv_migration
        assert km.num_streamed == km.num_migrations >= 1
        # Every migration pushed one segment per layer group, covering
        # all layers exactly once in order.
        n_layers = config.num_hidden_layers
        per_mig = len(pushes) // km.num_streamed
        assert per_mig > 1, "prefill was not dispatched in segments"
        covered = sorted(pushes[:per_mig])
        assert sum(n for _, n in covered) == n_layers
        del llm
    finally:
        MigrationStream.push = orig_push

    bulk = LLM(model=d, dtype="float32", max_model_len=256,
               num_gpu_blocks_override=64, block_size=16,
               max_num_seqs=8, max_paddings=512, swap_space=0.1,
               sep_prompt_token=True, kv_stream_segments=1)
    bulk_out = [o.outputs[0].token_ids for o in bulk.generate(
        prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
    km = bulk.llm_engine.executor.kv_migration
    assert km.num_streamed == 0 and km.num_migrations >= 1
    assert streamed == bulk_out


def test_splitwise_prompt_logprobs_and_echo(splitwise_llm, tiny_checkpoint):
    """prompt_logprobs rides the segmented prefill's tail dispatch: the
    chosen-token logprob at position i must score token i+1 exactly as
    the non-disaggregated engine computes it."""
    import torch

    from vllm_splitwise_tpu import SamplingParams
    _, hf, config = tiny_checkpoint
    rng = np.random.RandomState(9)
    ids = rng.randint(3, config.vocab_size, size=12).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True,
                        prompt_logprobs=2)
    out = splitwise_llm.generate(prompt_token_ids=[ids],
                                 sampling_params=sp, use_tqdm=False)[0]
    assert out.prompt_logprobs is not None
    assert len(out.prompt_logprobs) == len(ids)
    assert out.prompt_logprobs[0] is None
    with torch.no_grad():
        logits = hf(torch.tensor([ids])).logits[0].float()
        ref_lp = torch.log_softmax(logits, dim=-1)
    for pos in range(1, len(ids)):
        chosen = out.prompt_logprobs[pos][ids[pos]].logprob
        assert abs(chosen - ref_lp[pos - 1, ids[pos]].item()) < 5e-3


def test_splitwise_with_lora(tmp_path_factory, tiny_checkpoint):
    """Multi-LoRA under disaggregation: the adapter stack rides the
    segmented prefill (sliced per layer group) and the decode pool's
    steps; output must match the merged-weights HF oracle."""
    import copy

    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    from vllm_splitwise_tpu.lora.request import LoRARequest
    from ..lora.test_lora import RANK, _make_adapter
    d, hf, config = tiny_checkpoint

    adapter_dir = str(tmp_path_factory.mktemp("sw_adapter"))
    deltas = _make_adapter(adapter_dir, config, seed=11)
    hf_merged = copy.deepcopy(hf)
    state = hf_merged.state_dict()
    for name, delta in deltas.items():
        state[name] = state[name] + torch.tensor(delta)
    hf_merged.load_state_dict(state)

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, block_size=16, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, sep_prompt_token=True,
              enable_lora=True, max_loras=2, max_lora_rank=RANK)
    rng = np.random.RandomState(10)
    ids = rng.randint(3, config.vocab_size, size=14).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate(prompt_token_ids=[ids], sampling_params=sp,
                       lora_request=LoRARequest("a1", 1, adapter_dir),
                       use_tqdm=False)[0]
    with torch.no_grad():
        ref = hf_merged.generate(torch.tensor([ids]), max_new_tokens=8,
                                 do_sample=False)[0, len(ids):].tolist()
    assert out.outputs[0].token_ids == ref
    assert llm.llm_engine.executor.kv_migration.num_streamed >= 1


def test_dual_step_runs_both_pools_concurrently(tiny_checkpoint):
    """Stagger arrivals so prefill bursts land while earlier requests
    are decoding: at least one engine step must dispatch a prompt batch
    AND a decode batch together (execute_dual with both halves
    non-empty), and outputs must equal the single-pool engine's."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = tiny_checkpoint

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, block_size=16,
              max_num_seqs=8, max_paddings=512, swap_space=0.1,
              sep_prompt_token=True)
    engine = llm.llm_engine
    executor = engine.executor

    dual_steps = {"both": 0}
    orig = executor.execute_dual

    def counting_dual(prompt_meta, pnw, decode_meta, *args, **kwargs):
        if prompt_meta and decode_meta:
            dual_steps["both"] += 1
        return orig(prompt_meta, pnw, decode_meta, *args, **kwargs)

    executor.execute_dual = counting_dual

    rng = np.random.RandomState(3)
    prompts = [
        rng.randint(3, config.vocab_size, size=rng.randint(8, 24)).tolist()
        for _ in range(6)
    ]
    params = SamplingParams(temperature=0.0, max_tokens=16,
                            ignore_eos=True)

    # Drive the engine loop by hand, adding two requests up front and
    # the rest one per step (each arrival prefills while others decode).
    results = {}
    for i, p in enumerate(prompts[:2]):
        engine.add_request(str(i), None, params, p)
    next_i = 2
    while engine.has_unfinished_requests():
        if next_i < len(prompts):
            engine.add_request(str(next_i), None, params, prompts[next_i])
            next_i += 1
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids

    assert dual_steps["both"] >= 1, \
        "no engine step ever dispatched both pools together"

    for i, p in enumerate(prompts):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([p]), max_new_tokens=16,
                                 do_sample=False)
        assert results[str(i)] == hf_out[0, len(p):].tolist(), \
            f"request {i} diverged from HF under dual-pool stepping"
