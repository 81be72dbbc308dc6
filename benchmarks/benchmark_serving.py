"""Online serving benchmark (reference role:
benchmarks/benchmark_serving.py:136-217): async client firing requests at
a live server, reporting TTFT/TPOT percentiles + token throughput."""
import argparse
import asyncio
import json
import random
import time

import aiohttp

from benchmark_utils import (RequestResult, dump_results, sample_arrivals,
                             summarize)


async def send_request(session: aiohttp.ClientSession, api_url: str,
                       backend: str, model: str, prompt_ids, output_len,
                       result: RequestResult) -> None:
    if backend == "openai":
        payload = {
            "model": model,
            "prompt": prompt_ids,
            "max_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
            "stream": True,
        }
        result.start_time = time.time()
        async with session.post(api_url, json=payload) as resp:
            async for line in resp.content:
                line = line.strip()
                if not line or not line.startswith(b"data: "):
                    continue
                if line == b"data: [DONE]":
                    break
                result.token_timestamps.append(time.time())
    else:  # demo /generate server
        payload = {
            "prompt_token_ids": prompt_ids,
            "max_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
            "stream": True,
        }
        result.start_time = time.time()
        async with session.post(api_url, json=payload) as resp:
            async for chunk, _ in resp.content.iter_chunks():
                if chunk:
                    result.token_timestamps.append(time.time())
    result.end_time = time.time()


async def run(args):
    random.seed(args.seed)
    requests = [
        ([random.randint(10, 10000) for _ in range(args.input_len)],
         args.output_len) for _ in range(args.num_prompts)
    ]
    arrivals = sample_arrivals(args.num_prompts, args.request_rate,
                               args.arrival_distribution, args.seed)

    results = []
    conn = aiohttp.TCPConnector(limit=0)
    async with aiohttp.ClientSession(conn_timeout=None,
                                     connector=conn) as session:
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
                    send_request(session, args.api_url, args.backend,
                                 args.model, prompt_ids, out_len, r)))
        await asyncio.gather(*tasks)

    summary = summarize(results)
    print(json.dumps(summary, indent=2))
    if args.output:
        dump_results(results, args.output)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--backend", choices=["openai", "generate"],
                        default="openai")
    parser.add_argument("--api-url", type=str,
                        default="http://localhost:8000/v1/completions")
    parser.add_argument("--model", type=str, default="default")
    parser.add_argument("--num-prompts", type=int, default=100)
    parser.add_argument("--input-len", type=int, default=256)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--request-rate", type=float, default=1.0,
                        help="req/s; <=0 = burst")
    parser.add_argument("--arrival-distribution",
                        choices=["poisson", "gamma", "uniform", "burst"],
                        default="poisson")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", type=str, default=None,
                        help=".exp dump path")
    asyncio.run(run(parser.parse_args()))
