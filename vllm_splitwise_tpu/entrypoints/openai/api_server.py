"""OpenAI-compatible server (reference role:
vllm/entrypoints/openai/api_server.py): /v1/completions,
/v1/chat/completions, /v1/models, /health, /metrics; API-key auth;
LoRA modules as extra models.  Built on aiohttp.
"""
from __future__ import annotations

import argparse
import asyncio
import inspect
import json
from http import HTTPStatus
from typing import Optional

from aiohttp import web

from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_splitwise_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, ErrorResponse)
from vllm_splitwise_tpu.entrypoints.openai.serving_chat import (
    OpenAIServingChat)
from vllm_splitwise_tpu.entrypoints.openai.serving_completion import (
    OpenAIServingCompletion)
from vllm_splitwise_tpu.entrypoints.openai.serving_engine import LoRA
from vllm_splitwise_tpu.logger import init_logger

logger = init_logger(__name__)


class LoRAParserAction(argparse.Action):

    def __call__(self, parser, namespace, values, option_string=None):
        lora_list = []
        for item in values:
            name, path = item.split("=")
            lora_list.append(LoRA(name, path))
        setattr(namespace, self.dest, lora_list)


def make_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="vllm-splitwise-tpu OpenAI-compatible server")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--allow-credentials", action="store_true")
    parser.add_argument("--allowed-origins", type=json.loads, default=["*"])
    parser.add_argument("--allowed-methods", type=json.loads, default=["*"])
    parser.add_argument("--allowed-headers", type=json.loads, default=["*"])
    parser.add_argument("--api-key", type=str, default=None,
                        help="require this API key in Authorization headers")
    parser.add_argument("--served-model-name", type=str, default=None,
                        help="model name used in the API; defaults to the "
                        "HF model name")
    parser.add_argument("--lora-modules", type=str, default=None, nargs="+",
                        action=LoRAParserAction,
                        help="LoRA modules as name=path pairs")
    parser.add_argument("--chat-template", type=str, default=None,
                        help="file path or literal jinja chat template")
    parser.add_argument("--response-role", type=str, default="assistant")
    parser = AsyncEngineArgs.add_cli_args(parser)
    return parser


def _json_error(err: ErrorResponse) -> web.Response:
    return web.json_response(err.model_dump(), status=err.code)


async def _sse_response(request: web.Request, generator) -> web.StreamResponse:
    response = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
    })
    await response.prepare(request)
    async for chunk in generator:
        await response.write(chunk.encode("utf-8"))
    await response.write_eof()
    return response


def build_app(openai_serving_chat: OpenAIServingChat,
              openai_serving_completion: OpenAIServingCompletion,
              engine: AsyncLLMEngine,
              api_key: Optional[str] = None) -> web.Application:
    app = web.Application(middlewares=[])

    if api_key is not None:
        @web.middleware
        async def auth(request: web.Request, handler):
            if not request.path.startswith("/v1"):
                return await handler(request)
            if request.headers.get(
                    "Authorization") != "Bearer " + api_key:
                return web.json_response({"error": "Unauthorized"},
                                         status=401)
            return await handler(request)

        app.middlewares.append(auth)

    async def health(request: web.Request) -> web.Response:
        await engine.check_health()
        return web.Response(status=200)

    async def show_available_models(request: web.Request) -> web.Response:
        models = await openai_serving_chat.show_available_models()
        return web.json_response(models.model_dump())

    async def metrics(request: web.Request) -> web.Response:
        try:
            from prometheus_client import (CONTENT_TYPE_LATEST,
                                           generate_latest)
            return web.Response(body=generate_latest(),
                                content_type=CONTENT_TYPE_LATEST.split(";")[0])
        except ImportError:
            return web.Response(status=501, text="prometheus_client missing")

    async def create_chat_completion(request: web.Request):
        try:
            body = ChatCompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(openai_serving_chat.create_error_response(
                str(e)))
        generator = await openai_serving_chat.create_chat_completion(
            body, request)
        if isinstance(generator, ErrorResponse):
            return _json_error(generator)
        if body.stream and inspect.isasyncgen(generator):
            return await _sse_response(request, generator)
        return web.json_response(generator.model_dump())

    async def create_completion(request: web.Request):
        try:
            body = CompletionRequest(**await request.json())
        except Exception as e:  # noqa: BLE001
            return _json_error(
                openai_serving_completion.create_error_response(str(e)))
        generator = await openai_serving_completion.create_completion(
            body, request)
        if isinstance(generator, ErrorResponse):
            return _json_error(generator)
        if inspect.isasyncgen(generator):
            return await _sse_response(request, generator)
        return web.json_response(generator.model_dump())

    app.router.add_get("/health", health)
    app.router.add_get("/v1/models", show_available_models)
    app.router.add_get("/metrics", metrics)
    app.router.add_post("/v1/chat/completions", create_chat_completion)
    app.router.add_post("/v1/completions", create_completion)
    return app


async def init_app(args) -> web.Application:
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served_model = args.served_model_name or args.model

    openai_serving_chat = OpenAIServingChat(engine, served_model,
                                            args.response_role,
                                            args.lora_modules,
                                            args.chat_template)
    openai_serving_completion = OpenAIServingCompletion(
        engine, served_model, args.lora_modules)
    await openai_serving_chat.post_init()
    await openai_serving_completion.post_init()
    return build_app(openai_serving_chat, openai_serving_completion, engine,
                     args.api_key)


def main():
    args = make_arg_parser().parse_args()
    logger.info("vllm-splitwise-tpu OpenAI server args: %s", args)
    loop = asyncio.new_event_loop()
    app = loop.run_until_complete(init_app(args))
    web.run_app(app, host=args.host, port=args.port, loop=loop)


if __name__ == "__main__":
    main()
