"""AsyncLLMEngine unit tests with a mock engine (reference pattern:
tests/async_engine/test_async_llm_engine.py — no model, just the loop)."""
import asyncio

import pytest

from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine


class _MockEngine:
    """Stands in for _AsyncLLMEngine: counts steps, echoes requests."""

    def __init__(self):
        self.step_calls = 0
        self.add_calls = 0
        self.abort_calls = 0
        self.requests = []

    async def step_async(self):
        self.step_calls += 1
        await asyncio.sleep(0)
        return []

    async def add_request_async(self, request_id, prompt, sampling_params,
                                prompt_token_ids=None, arrival_time=None,
                                lora_request=None):
        self.add_calls += 1
        self.requests.append(request_id)

    def add_request(self, *a, **kw):
        self.add_calls += 1

    def abort_request(self, request_id):
        self.abort_calls += 1

    def has_unfinished_requests(self):
        return self.step_calls < 3

    async def check_health_async(self):
        pass


class _MockAsyncLLMEngine(AsyncLLMEngine):

    def _init_engine(self, *args, **kwargs):
        return _MockEngine()


def test_new_requests_notify_the_loop():
    async def run():
        engine = _MockAsyncLLMEngine(worker_use_ray=False,
                                     start_engine_loop=False,
                                     log_requests=False)
        engine.start_background_loop()
        await asyncio.sleep(0.05)
        assert engine.is_running
        before = engine.engine.step_calls

        await engine.add_request("r0", "prompt", None)
        await asyncio.sleep(0.05)
        assert engine.engine.add_calls >= 1
        assert engine.engine.step_calls > before

    asyncio.run(run())


def test_abort_propagates():
    async def run():
        engine = _MockAsyncLLMEngine(worker_use_ray=False,
                                     start_engine_loop=False,
                                     log_requests=False)
        engine.start_background_loop()
        stream = await engine.add_request("r1", "prompt", None)
        await asyncio.sleep(0.02)
        engine._abort("r1")
        await asyncio.sleep(0.02)
        assert stream.finished

    asyncio.run(run())
