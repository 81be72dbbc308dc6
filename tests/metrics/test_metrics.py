"""Engine stats / Prometheus metrics (reference pattern:
tests/metrics/test_metrics.py — counters reflect real runs)."""
import pytest

from vllm_splitwise_tpu import LLM, SamplingParams

from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                            save_tiny_tokenizer, tiny_llama_config)


@pytest.fixture(scope="module")
def llm(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("metrics"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return LLM(model=d, dtype="float32", max_model_len=128,
               num_gpu_blocks_override=64, max_num_seqs=8,
               max_paddings=256, swap_space=0.1, disable_log_stats=False)


def test_stats_reflect_generation(llm):
    engine = llm.llm_engine
    prompt_ids = [[5, 9, 23, 41], [7, 3, 11]]
    max_tokens = 6
    engine.add_request("m0", None, SamplingParams(
        temperature=0.0, max_tokens=max_tokens, ignore_eos=True),
        prompt_token_ids=prompt_ids[0])
    engine.add_request("m1", None, SamplingParams(
        temperature=0.0, max_tokens=max_tokens, ignore_eos=True),
        prompt_token_ids=prompt_ids[1])

    prompt_tokens = 0
    gen_tokens = 0
    ttfts = []
    while engine.has_unfinished_requests():
        out = engine.step()
        stats = engine._get_stats(engine._last_scheduler_outputs) \
            if hasattr(engine, "_last_scheduler_outputs") else None
        del out, stats
        # collect via the public logger path below

    # Drive a second pass collecting Stats directly.
    engine.add_request("m2", None, SamplingParams(
        temperature=0.0, max_tokens=max_tokens, ignore_eos=True),
        prompt_token_ids=prompt_ids[0])
    while engine.has_unfinished_requests():
        scheduled = engine.scheduler.schedule()
        seq_group_metadata_list, scheduler_outputs = scheduled[0], scheduled[1]
        samples = engine.executor.execute_model(
            seq_group_metadata_list,
            scheduler_outputs.blocks_to_swap_in,
            scheduler_outputs.blocks_to_swap_out,
            scheduler_outputs.blocks_to_copy,
            getattr(scheduler_outputs, "blocks_to_nw", {}))
        engine._process_model_outputs(samples, scheduler_outputs)
        stats = engine._get_stats(scheduler_outputs)
        prompt_tokens += stats.num_prompt_tokens
        gen_tokens += stats.num_generation_tokens
        ttfts += stats.time_to_first_tokens
        assert stats.num_running >= 0
        assert 0.0 <= stats.kv_cache_usage <= 1.0

    assert prompt_tokens == len(prompt_ids[0])
    # The prompt step emits the first output token under the prompt
    # counter (reference semantics): decode steps = max_tokens - 1.
    assert gen_tokens == max_tokens - 1
    assert len(ttfts) == 1 and ttfts[0] >= 0.0
