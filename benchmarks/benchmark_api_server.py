"""Data-parallel serving launcher + round-robin proxy (reference role:
benchmarks/benchmark_api_server.py:1-127 — the reference achieves data
parallelism by running several API servers behind a proxy; same here,
one engine process per replica).

Usage:
  python benchmark_api_server.py --model <m> --num-replicas 2 \
      --base-port 8100 --proxy-port 8000 [engine args...]
"""
from __future__ import annotations

import argparse
import itertools
import subprocess
import sys
import time

from aiohttp import ClientSession, web


def launch_servers(args, passthrough) -> list:
    procs = []
    for i in range(args.num_replicas):
        port = args.base_port + i
        cmd = [
            sys.executable, "-m",
            "vllm_splitwise_tpu.entrypoints.openai.api_server", "--model",
            args.model, "--port", str(port), *passthrough
        ]
        procs.append(subprocess.Popen(cmd))
        time.sleep(args.stagger_s)
    return procs


def build_proxy(upstreams: list) -> web.Application:
    rr = itertools.cycle(upstreams)

    async def proxy(request: web.Request) -> web.StreamResponse:
        upstream = next(rr)
        url = f"{upstream}{request.rel_url}"
        async with ClientSession() as session:
            async with session.request(request.method, url,
                                       headers=request.headers,
                                       data=await request.read()) as r:
                resp = web.StreamResponse(status=r.status,
                                          headers=r.headers)
                await resp.prepare(request)
                async for chunk in r.content.iter_any():
                    await resp.write(chunk)
                await resp.write_eof()
                return resp

    app = web.Application()
    app.router.add_route("*", "/{tail:.*}", proxy)
    return app


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--num-replicas", type=int, default=2)
    parser.add_argument("--base-port", type=int, default=8100)
    parser.add_argument("--proxy-port", type=int, default=8000)
    parser.add_argument("--stagger-s", type=float, default=5.0)
    args, passthrough = parser.parse_known_args()

    procs = launch_servers(args, passthrough)
    upstreams = [
        f"http://localhost:{args.base_port + i}"
        for i in range(args.num_replicas)
    ]
    try:
        web.run_app(build_proxy(upstreams), port=args.proxy_port)
    finally:
        for p in procs:
            p.terminate()


if __name__ == "__main__":
    main()
