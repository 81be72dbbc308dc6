"""Eager bucket warmup (reference parity: CUDA-graph capture over
_BATCH_SIZES_TO_CAPTURE, model_runner.py:700-779).

Runs ModelRunner.warm_up directly on a tiny CPU model and checks that it
covers every decode bucket up to the scheduler's max batch plus the
budget-feasible prefill buckets, and that real steps still work after
(caches were donated through correctly).
"""
import pytest

from vllm_splitwise_tpu.config import (CacheConfig, ModelConfig,
                                       ParallelConfig, SchedulerConfig)
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.sequence import SequenceData, SequenceGroupMetadata
from vllm_splitwise_tpu.worker.model_runner import ModelRunner

from ..models.utils import (hf_model_and_weights, make_kv_caches,
                            save_local_checkpoint, save_tiny_tokenizer,
                            tiny_llama_config)

BLOCK = 16


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("warmup"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    r = ModelRunner(
        ModelConfig(d, dtype="float32", max_model_len=64),
        ParallelConfig(),
        SchedulerConfig(max_num_batched_tokens=64, max_num_seqs=8,
                        max_model_len=64),
        CacheConfig(block_size=BLOCK, swap_space=0.01))
    r.load_model()
    return r


def test_warm_up_compiles_buckets_and_caches_stay_valid(runner):
    config = tiny_llama_config()
    kv = make_kv_caches(config.num_hidden_layers,
                        config.num_key_value_heads,
                        config.hidden_size // config.num_attention_heads,
                        num_pages=32, page_size=BLOCK)
    kv = runner.warm_up(kv)
    assert kv is not None

    # A real decode step after warmup must still run (the donated cache
    # chain was threaded through every warmup call).
    data = SequenceData([5, 6, 7])
    data.append_token(9, 0.0)
    md = SequenceGroupMetadata(
        request_id="r0", is_prompt=False,
        seq_data={0: data},
        sampling_params=SamplingParams(temperature=0.0),
        block_tables={0: [1]})
    out, kv = runner.execute_model([md], kv)
    assert len(out) == 1
    tok = out[0].samples[0].output_token
    assert 0 <= tok < config.vocab_size


def test_worker_warmup_repoints_cache_engine(tmp_path_factory):
    """Regression: warm_up donates the cache arrays; both worker.kv_caches
    AND cache_engine.device_cache must point at the fresh ones, because
    cache_swap() re-reads cache_engine.device_cache every step.  (The
    stale-reference failure only manifests on TPU, where donation really
    deletes buffers — this asserts the identity invariant instead.)"""
    from vllm_splitwise_tpu.worker.worker import Worker

    d = str(tmp_path_factory.mktemp("warmup_worker"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)

    cache_config = CacheConfig(block_size=BLOCK, swap_space=0.01)
    cache_config.num_device_blocks = 32
    cache_config.num_host_blocks = 0
    w = Worker(
        ModelConfig(d, dtype="float32", max_model_len=64),
        ParallelConfig(),
        SchedulerConfig(max_num_batched_tokens=64, max_num_seqs=8,
                        max_model_len=64),
        cache_config)
    w.load_model()
    w.init_cache_engine(cache_config)
    w._run_warmup()
    assert w.kv_caches is w.cache_engine.device_cache


def test_phase_scoped_warmup(tmp_path_factory):
    """Splitwise pools warm only their own phase's programs: a PREFILL
    worker's warmup must dispatch no decode shapes and vice versa (the
    executor calls warm_up(decode=..., prefill=...) per worker_type)."""
    d = str(tmp_path_factory.mktemp("warmup_phase"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)

    def make_runner():
        r = ModelRunner(
            ModelConfig(d, dtype="float32", max_model_len=64),
            ParallelConfig(),
            SchedulerConfig(max_num_batched_tokens=64, max_num_seqs=8,
                            max_model_len=64),
            CacheConfig(block_size=BLOCK, swap_space=0.01))
        r.load_model()
        return r

    def kv():
        return make_kv_caches(
            config.num_hidden_layers, config.num_key_value_heads,
            config.hidden_size // config.num_attention_heads,
            num_pages=32, page_size=BLOCK)

    r = make_runner()
    r.warm_up(kv(), decode=False, prefill=True)
    sigs = set(r._seen_programs)
    assert sigs and all(s[0] == "P" for s in sigs), sigs

    r = make_runner()
    r.warm_up(kv(), decode=True, prefill=False)
    sigs = set(r._seen_programs)
    assert sigs and all(s[0] == "D" for s in sigs), sigs
