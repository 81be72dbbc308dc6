"""Warmup shape-coverage enumeration (no device work): the grids that
--warmup-mode full and chunked prefill pre-compile."""
from vllm_splitwise_tpu.worker.model_runner import ModelRunner, _bucket


class _MR(ModelRunner):
    def __init__(self):
        pass


class _SC:
    warmup_mode = "full"
    max_num_prompt_seqs = 0
    chunked_prefill_tokens = 0


def make_runner(mode="full", prompt_cap=0, chunk=0, max_model_len=4096):
    mr = _MR()
    mr.PREFILL_BATCH_BUCKETS = [1, 2, 4, 8, 16]
    mr.PREFILL_LEN_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096]
    mr.max_model_len = max_model_len
    sc = _SC()
    sc.warmup_mode = mode
    sc.max_num_prompt_seqs = prompt_cap
    sc.chunked_prefill_tokens = chunk
    mr.scheduler_config = sc
    return mr


def test_full_grid_covers_every_feasible_combo():
    grid = set(make_runner()._warmup_prefill_grid(max_seqs=32,
                                                  budget=4096))
    # Feasibility: some raw (count, length) pair padding up to the
    # bucket pair satisfies count*len <= budget; the minimum such pair
    # is (prev_batch_bucket+1, prev_len_bucket+1).
    lens = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096]
    batches = [1, 2, 4, 8, 16]
    for b, t in grid:
        prev = ([x for x in lens if x < t] or [0])[-1]
        prev_b = ([x for x in batches if x < b] or [0])[-1]
        assert (prev_b + 1) * (prev + 1) <= 4096
    assert (1, 4096) in grid and (16, 256) in grid
    # 9 raw prompts x 455 tokens (4095 <= 4096) pads to (16, 512):
    # the full grid must cover it or it compiles mid-traffic.
    assert (16, 512) in grid
    assert (2, 4096) not in grid      # 2 * 2049 > 4096
    assert (16, 1024) not in grid     # 9 * 513 > 4096
    assert len(grid) == 38


def test_prompt_cap_shrinks_grid():
    grid = set(make_runner(prompt_cap=2)._warmup_prefill_grid(
        max_seqs=32, budget=4096))
    assert {b for b, _ in grid} == {1, 2}


def test_chunk_caps_lengths():
    grid = set(make_runner(chunk=512)._warmup_prefill_grid(
        max_seqs=32, budget=4096))
    assert max(t for _, t in grid) == 512


def test_diagonal_one_length_per_batch():
    grid = list(make_runner(mode="diagonal")._warmup_prefill_grid(
        max_seqs=32, budget=4096))
    assert grid == [(1, 4096), (2, 2048), (4, 1024), (8, 512), (16, 256)]
