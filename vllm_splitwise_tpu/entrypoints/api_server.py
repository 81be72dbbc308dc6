"""Demo HTTP server (reference role: vllm/entrypoints/api_server.py).

POST /generate {"prompt": ..., "stream": bool, **sampling} -> text
GET  /health

Built on aiohttp (the HTTP stack available in the TPU image); the
production OpenAI-compatible surface lives in
``vllm_splitwise_tpu.entrypoints.openai.api_server``.
"""
from __future__ import annotations

import argparse
import json

from aiohttp import web

from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.utils import random_uuid


async def health(request: web.Request) -> web.Response:
    return web.Response(status=200)


async def generate(request: web.Request) -> web.StreamResponse:
    """Generate completion for the request.

    JSON body fields:
    - prompt: the prompt to use for the generation.
    - stream: whether to stream the results or not.
    - other fields: the sampling parameters (see SamplingParams).
    """
    engine: AsyncLLMEngine = request.app["engine"]
    request_dict = await request.json()
    prompt = request_dict.pop("prompt")
    stream = request_dict.pop("stream", False)
    sampling_params = SamplingParams(**request_dict)
    request_id = random_uuid()

    results_generator = engine.generate(prompt, sampling_params, request_id)

    if stream:
        response = web.StreamResponse(
            headers={"Content-Type": "application/json"})
        await response.prepare(request)
        async for request_output in results_generator:
            text_outputs = [
                prompt + output.text for output in request_output.outputs
            ]
            await response.write(
                (json.dumps({"text": text_outputs}) + "\0").encode("utf-8"))
        await response.write_eof()
        return response

    final_output = None
    try:
        async for request_output in results_generator:
            final_output = request_output
    except ConnectionResetError:
        await engine.abort(request_id)
        return web.Response(status=499)

    assert final_output is not None
    text_outputs = [prompt + output.text for output in final_output.outputs]
    # Request-lifetime timing (the fork's benchmark harness consumes these;
    # reference benchmarks/benchmark_utils.py).
    metrics = final_output.metrics
    ret = {
        "text": text_outputs,
        "timings": {
            "arrival": metrics.arrival_time,
            "first_scheduled": metrics.first_scheduled_time,
            "first_token": metrics.first_token_time,
            "finished": metrics.finished_time,
        } if metrics is not None else None,
    }
    return web.json_response(ret)


def build_app(engine: AsyncLLMEngine) -> web.Application:
    app = web.Application()
    app["engine"] = engine
    app.router.add_get("/health", health)
    app.router.add_post("/generate", generate)
    return app


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser = AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    web.run_app(build_app(engine), host=args.host, port=args.port)
