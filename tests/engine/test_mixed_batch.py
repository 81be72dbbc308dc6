"""Mixed prefill+decode stepping (--mixed-batch): every engine step
schedules the decode window AND a prompt(-chunk) batch, dispatched
back-to-back on one mesh, so decode advances every step instead of
stalling behind whole prompt batches.  TPU extension — the reference
(vLLM v0.3.3) steps prompt-first (vllm/core/scheduler.py:200-279) and
its fork only overlaps phases across two disaggregated pools
(ray_gpu_executor.py:291-306)."""
import time

import numpy as np
import pytest

from vllm_splitwise_tpu import LLM, SamplingParams
from vllm_splitwise_tpu.config import CacheConfig, SchedulerConfig
from vllm_splitwise_tpu.core.scheduler import Scheduler
from vllm_splitwise_tpu.sequence import Logprob, Sequence, SequenceGroup

from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                            save_tiny_tokenizer, tiny_llama_config)

BLOCK = 4


# ---- scheduler level: both halves come out of one schedule call ----

def _make_scheduler(chunk=8, max_tokens=4096, blocks=256):
    sc = SchedulerConfig(max_num_batched_tokens=max_tokens,
                         max_num_seqs=16, max_model_len=max_tokens,
                         chunked_prefill_tokens=chunk, mixed_batch=True)
    cc = CacheConfig(block_size=BLOCK, hbm_utilization=0.9,
                     swap_space=0.0001)
    cc.num_device_blocks = blocks
    cc.num_host_blocks = 16
    return Scheduler(sc, cc, None)


def _add_prompt(scheduler, rid, n):
    seq = Sequence(int(rid), "x", list(range(n)), block_size=BLOCK)
    group = SequenceGroup(rid, [seq], SamplingParams(max_tokens=64),
                          time.time())
    scheduler.add_seq_group(group)
    return group


def _decode_rows(sched):
    (decode_meta, _), _ = sched.schedule_splitwise()
    return decode_meta


def test_decode_and_chunk_in_one_step():
    """With one running sequence and one long waiting prompt, a single
    schedule_splitwise() call yields BOTH a decode row and the prompt's
    first chunk — decode never skips a step behind prefill."""
    s = _make_scheduler(chunk=8)
    g0 = _add_prompt(s, "0", 6)
    (decode_meta, _), (prompt_meta, pout) = s.schedule_splitwise()
    assert not decode_meta and len(prompt_meta) == 1  # prefill g0 whole
    for seq in g0.get_seqs():
        seq.append_token(5, {5: Logprob(0.0)})

    g1 = _add_prompt(s, "1", 19)  # needs chunks (0,8),(8,16),(16,19)
    steps = []
    for _ in range(3):
        (decode_meta, dout), (prompt_meta, pout) = s.schedule_splitwise()
        steps.append((len(decode_meta), dict(pout.prefill_chunks)))
        for md in decode_meta:
            pass  # decode metadata built; engine would append tokens
        for seq in g0.get_seqs():
            seq.append_token(5, {5: Logprob(0.0)})
    # Every step carried the decode row AND one chunk of g1.
    assert steps[0] == (1, {"1": (0, 8)})
    assert steps[1] == (1, {"1": (8, 16)})
    assert steps[2] == (1, {"1": (16, 19)})
    assert list(s.running)[-1] is g1  # final chunk promoted g1


# ---- engine level: greedy outputs identical to HF under mixed load ----

@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_llama_mixed"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


def _prompts(seed, n, lo=8, hi=80, vocab=256):
    rng = np.random.RandomState(seed)
    return [
        rng.randint(3, vocab, size=rng.randint(lo, hi)).tolist()
        for _ in range(n)
    ]


def test_mixed_batch_greedy_matches_hf(tiny_checkpoint):
    """Length-staggered prompts force the engine through interleaved
    decode-window + chunk steps; outputs must be token-identical to
    whole-prompt prompt-first serving (HF greedy oracle)."""
    import torch
    d, hf, _ = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=256, block_size=16,
              max_num_seqs=16, max_paddings=512, mixed_batch=True,
              chunked_prefill_tokens=32, max_num_prompt_seqs=2,
              num_decode_steps=4)
    prompt_ids = _prompts(3, 7)
    max_tokens = 12
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
        expected = hf_out[0, len(ids):].tolist()
        assert out.outputs[0].token_ids == expected


def test_mixed_batch_without_chunking_matches_hf(tiny_checkpoint):
    """--mixed-batch alone (no chunking): whole prompts ride the prompt
    half; still token-identical."""
    import torch
    d, hf, _ = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=256, block_size=16,
              max_num_seqs=16, max_paddings=512, mixed_batch=True)
    prompt_ids = _prompts(11, 5, lo=8, hi=32)
    outs = llm.generate(
        prompt_token_ids=prompt_ids,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                       ignore_eos=True),
        use_tqdm=False)
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]), max_new_tokens=8,
                                 do_sample=False)
        expected = hf_out[0, len(ids):].tolist()
        assert out.outputs[0].token_ids == expected


def test_pipelined_greedy_matches_hf(tiny_checkpoint):
    """--pipeline-decode: chained decode windows (device-side token
    carry, placeholder reconciliation) under interleaved prompt load
    must stay token-identical to HF greedy."""
    import torch
    d, hf, _ = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=256, block_size=16,
              max_num_seqs=16, max_paddings=512, mixed_batch=True,
              pipeline_decode=True, chunked_prefill_tokens=32,
              max_num_prompt_seqs=2, num_decode_steps=4)
    prompt_ids = _prompts(21, 7)
    max_tokens = 13  # not a multiple of the window: exercises overshoot
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
        expected = hf_out[0, len(ids):].tolist()
        assert out.outputs[0].token_ids == expected
    # The pipeline actually chained (not silently degraded to sync).
    runner = llm.llm_engine.executor.worker.model_runner
    assert runner.dispatch_stats.get("chained_windows", 0) > 0


def test_pipelined_eos_and_varied_lengths(tiny_checkpoint):
    """EOS stops mid-window + max_tokens staggered across requests: the
    placeholder/overshoot reconciliation must never leak placeholder
    tokens or overshoot past a stop."""
    import torch
    d, hf, config = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=256, block_size=16,
              max_num_seqs=16, max_paddings=512, mixed_batch=True,
              pipeline_decode=True, chunked_prefill_tokens=32,
              max_num_prompt_seqs=2, num_decode_steps=4)
    prompt_ids = _prompts(29, 8, lo=8, hi=48)
    outs = []
    for i, ids in enumerate(prompt_ids):
        outs.append(llm._add_and_track(i, ids) if False else None)
    params = [SamplingParams(temperature=0.0, max_tokens=5 + (i % 7))
              for i in range(len(prompt_ids))]
    for i, (ids, sp) in enumerate(zip(prompt_ids, params)):
        llm.llm_engine.add_request(str(i), None, sp,
                                   prompt_token_ids=ids)
    results = {}
    while llm.llm_engine.has_unfinished_requests():
        for out in llm.llm_engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
    for i, (ids, sp) in enumerate(zip(prompt_ids, params)):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]),
                                 max_new_tokens=sp.max_tokens,
                                 do_sample=False,
                                 eos_token_id=config.eos_token_id)
        expected = hf_out[0, len(ids):].tolist()
        if expected and expected[-1] == config.eos_token_id:
            got = results[str(i)]
            assert got in (expected, expected[:-1]), (got, expected)
        else:
            assert results[str(i)] == expected, (i, results[str(i)],
                                                 expected)


def test_pipelined_streaming_arrivals_and_abort(tiny_checkpoint):
    """Requests arrive WHILE windows are in flight (chain breaks on
    every join) and one request aborts mid-flight: outputs must stay
    HF-exact and the abort must not wedge the pipeline."""
    import torch
    d, hf, _ = tiny_checkpoint
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=256, block_size=16,
              max_num_seqs=16, max_paddings=512, mixed_batch=True,
              pipeline_decode=True, chunked_prefill_tokens=32,
              max_num_prompt_seqs=1, num_decode_steps=4)
    eng = llm.llm_engine
    prompt_ids = _prompts(31, 9, lo=8, hi=60)
    sp = lambda: SamplingParams(temperature=0.0, max_tokens=11,
                                ignore_eos=True)
    from collections import deque
    pending = deque(enumerate(prompt_ids))
    # Seed two requests, then add one per engine step.
    for _ in range(2):
        i, ids = pending.popleft()
        eng.add_request(str(i), None, sp(), prompt_token_ids=ids)
    results = {}
    step = 0
    aborted = False
    while eng.has_unfinished_requests():
        step += 1
        if pending:
            i, ids = pending.popleft()
            eng.add_request(str(i), None, sp(), prompt_token_ids=ids)
        if step == 6 and not aborted:
            eng.abort_request("1")
            aborted = True
        for out in eng.step():
            if out.finished:
                assert out.request_id not in results, \
                    f"request {out.request_id} finished twice"
                results[out.request_id] = out.outputs[0].token_ids
    for i, ids in enumerate(prompt_ids):
        if str(i) == "1" and "1" not in results:
            continue  # aborted before finishing
        cur = list(ids)
        for _ in range(11):
            with torch.no_grad():
                logits = hf(torch.tensor([cur])).logits[0, -1]
            cur.append(int(torch.argmax(logits)))
        got = results[str(i)]
        exp = cur[len(ids):]
        if str(i) == "1":
            assert got == exp[:len(got)], (got, exp)
        else:
            assert got == exp, (i, got, exp)


def test_pipelined_async_engine(tiny_checkpoint):
    """The ASYNC engine must route through the pipelined step (serving
    runs AsyncLLMEngine — an async path that silently fell back to the
    sync mixed step would invalidate every --pipeline-decode serving
    number).  Greedy outputs must stay HF-exact and the runner must
    actually chain windows."""
    import asyncio

    import torch

    from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine

    d, hf, _ = tiny_checkpoint
    engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs(
        model=d, dtype="float32", max_model_len=256,
        num_gpu_blocks_override=256, block_size=16, max_num_seqs=16,
        max_paddings=512, mixed_batch=True, pipeline_decode=True,
        chunked_prefill_tokens=32, max_num_prompt_seqs=2,
        num_decode_steps=4, disable_log_stats=True,
        disable_log_requests=True))

    prompt_ids = _prompts(41, 5, lo=8, hi=60)

    async def collect(i, ids):
        final = None
        async for out in engine.generate(
                None, SamplingParams(temperature=0.0, max_tokens=24,
                                     ignore_eos=True), str(i),
                prompt_token_ids=ids):
            final = out
        return final

    async def main():
        return await asyncio.gather(
            *(collect(i, ids) for i, ids in enumerate(prompt_ids)))

    outs = asyncio.run(main())
    for ids, out in zip(prompt_ids, outs):
        cur = list(ids)
        for _ in range(24):
            with torch.no_grad():
                logits = hf(torch.tensor([cur])).logits[0, -1]
            cur.append(int(torch.argmax(logits)))
        assert out.outputs[0].token_ids == cur[len(ids):]
    runner = engine.engine.executor.worker.model_runner
    assert runner.dispatch_stats.get("chained_windows", 0) > 0


def test_pipelined_beam_and_fanout(tiny_checkpoint):
    """Beam search and n>1 requests mixed with plain greedy under
    --pipeline-decode: fork groups join decode AFTER a deferred prompt
    step, so their first scheduled metadata can be stale — the drain
    path must drop-and-reschedule them, never decode a stale single
    parent row.  Beam outputs must match the sync engine's."""
    d, hf, _ = tiny_checkpoint

    def run(pipe):
        llm = LLM(model=d, dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=256, block_size=16,
                  max_num_seqs=16, max_paddings=512, mixed_batch=True,
                  pipeline_decode=pipe, chunked_prefill_tokens=32,
                  max_num_prompt_seqs=2, num_decode_steps=4)
        prompt_ids = _prompts(47, 4, lo=8, hi=40)
        params = [
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True),
            SamplingParams(temperature=0.0, max_tokens=8, n=2,
                           use_beam_search=True, ignore_eos=True),
            SamplingParams(temperature=0.0, max_tokens=8,
                           ignore_eos=True),
            SamplingParams(temperature=0.8, seed=123, max_tokens=8,
                           n=2, best_of=2, ignore_eos=True),
        ]
        for i, (ids, sp) in enumerate(zip(prompt_ids, params)):
            llm.llm_engine.add_request(str(i), None, sp,
                                       prompt_token_ids=ids)
        results = {}
        while llm.llm_engine.has_unfinished_requests():
            for out in llm.llm_engine.step():
                if out.finished:
                    results[out.request_id] = sorted(
                        tuple(o.token_ids) for o in out.outputs)
        return results

    sync = run(False)
    pipe = run(True)
    assert sync == pipe, (sync, pipe)
