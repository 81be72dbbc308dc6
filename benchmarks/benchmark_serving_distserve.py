"""DistServe-style disaggregated-serving benchmark (reference role:
benchmarks/benchmark_serving_distserve.py): arrival-process sweeps, SLO
attainment curves, .exp dumps named <prefix>-<num_prompts>-<rate>.exp."""
import argparse
import asyncio
import json
import random
import time

import aiohttp

from benchmark_utils import (LifetimeEvent, RequestResult, dump_results,
                             sample_arrivals, slo_attainment, summarize)


async def send_request(session, api_url, model, prompt_ids, output_len,
                       result: RequestResult):
    payload = {
        "model": model,
        "prompt": prompt_ids,
        "max_tokens": output_len,
        "temperature": 0.0,
        "ignore_eos": True,
        "stream": True,
    }
    result.start_time = time.time()
    result.record_event(LifetimeEvent.Issued)
    async with session.post(api_url, json=payload) as resp:
        first = True
        async for line in resp.content:
            line = line.strip()
            if not line or not line.startswith(b"data: "):
                continue
            if line == b"data: [DONE]":
                break
            now = time.time()
            if first:
                result.record_event(LifetimeEvent.ContextEnd, now)
                result.record_event(LifetimeEvent.DecodingBegin, now)
                first = False
            result.token_timestamps.append(now)
    result.end_time = time.time()
    result.record_event(LifetimeEvent.DecodingEnd, result.end_time)


def _workload(args):
    """(prompt_ids, output_len) pairs: either fixed-shape synthetic
    requests, or — with --replay-workload — the EXACT per-request
    (prompt_len, output_len) mix of a reference .exp dump (e.g. the
    fork's committed ShareGPT-derived llama3-100-*.exp), for a
    like-for-like p50 against its recorded numbers."""
    random.seed(args.seed)
    if args.replay_workload:
        with open(args.replay_workload) as f:
            recs = json.load(f)[:args.num_prompts]
        return [([random.randint(10, 10000)
                  for _ in range(r["prompt_len"])], r["output_len"])
                for r in recs]
    return [([random.randint(10, 10000) for _ in range(args.input_len)],
             args.output_len) for _ in range(args.num_prompts)]


async def run_one_rate(args, rate: float):
    requests = _workload(args)
    arrivals = sample_arrivals(args.num_prompts, rate,
                               args.arrival_distribution, args.seed,
                               args.cv)
    results = []
    conn = aiohttp.TCPConnector(limit=0)
    async with aiohttp.ClientSession(connector=conn) as session:
        start = time.time()
        tasks = []
        for (prompt_ids, out_len), offset in zip(requests, arrivals):
            delay = start + offset - time.time()
            if delay > 0:
                await asyncio.sleep(delay)
            r = RequestResult(prompt_len=len(prompt_ids),
                              output_len=out_len, start_time=0.0,
                              end_time=0.0)
            results.append(r)
            tasks.append(
                asyncio.create_task(
                    send_request(session, args.api_url, args.model,
                                 prompt_ids, out_len, r)))
        await asyncio.gather(*tasks)

    summary = summarize(results)
    summary["rate"] = rate
    summary["slo_attainment"] = slo_attainment(results, args.ttft_slo,
                                               args.tpot_slo)
    print(json.dumps(summary, indent=2))
    if args.exp_prefix:
        dump_results(
            results, f"{args.exp_prefix}-{args.num_prompts}-{rate}.exp")
    return summary


async def main(args):
    for rate in args.request_rates:
        await run_one_rate(args, rate)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--api-url", type=str,
                        default="http://localhost:8000/v1/completions")
    parser.add_argument("--model", type=str, default="default")
    parser.add_argument("--num-prompts", type=int, default=100)
    parser.add_argument("--input-len", type=int, default=768)
    parser.add_argument("--output-len", type=int, default=170)
    parser.add_argument("--request-rates", type=float, nargs="+",
                        default=[0.25, 0.5, 1.0, 2.0])
    parser.add_argument("--arrival-distribution",
                        choices=["poisson", "gamma", "uniform", "burst"],
                        default="poisson")
    parser.add_argument("--cv", type=float, default=1.0,
                        help="coefficient of variation (gamma arrivals)")
    parser.add_argument("--ttft-slo", type=float, default=0.5,
                        help="TTFT SLO seconds")
    parser.add_argument("--tpot-slo", type=float, default=0.05,
                        help="TPOT SLO seconds")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--exp-prefix", type=str, default=None)
    parser.add_argument("--replay-workload", type=str, default=None,
                        help="replay the (prompt_len, output_len) mix of "
                        "a reference .exp dump instead of fixed shapes")
    asyncio.run(main(parser.parse_args()))
