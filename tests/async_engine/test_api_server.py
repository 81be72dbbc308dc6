"""Demo /generate API server tests (reference pattern:
tests/async_engine/test_api_server.py — HTTP probes of health and
generate, streaming and non-streaming — via aiohttp's in-process
client)."""
import asyncio
import json

import pytest


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_llama_api"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d


def test_api_server_surface(tiny_checkpoint):
    asyncio.run(_scenario(tiny_checkpoint))


async def _scenario(model_dir):
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_splitwise_tpu.entrypoints.api_server import build_app

    engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs(
        model=model_dir, dtype="float32", max_model_len=256,
        num_gpu_blocks_override=64, max_num_seqs=8, max_paddings=512,
        disable_log_stats=True, disable_log_requests=True))
    app = build_app(engine)
    client = TestClient(TestServer(app))
    await client.start_server()

    r = await client.get("/health")
    assert r.status == 200

    # Non-streaming: echoes prompt + completion, carries the fork's
    # request-lifetime timings.
    r = await client.post("/generate", json={
        "prompt": "t5 t6 t7", "max_tokens": 5, "temperature": 0.0,
        "ignore_eos": True})
    assert r.status == 200
    body = await r.json()
    assert len(body["text"]) == 1
    assert body["text"][0].startswith("t5 t6 t7")
    t = body["timings"]
    assert t["arrival"] <= t["first_scheduled"] <= t["first_token"] \
        <= t["finished"]

    # n > 1 returns one text per sample.
    r = await client.post("/generate", json={
        "prompt": "t9 t10", "max_tokens": 3, "temperature": 1.0,
        "n": 2, "seed": 3, "ignore_eos": True})
    assert r.status == 200
    body = await r.json()
    assert len(body["text"]) == 2

    # Streaming: NUL-delimited JSON chunks, each a growing prefix.
    r = await client.post("/generate", json={
        "prompt": "t5 t6", "max_tokens": 4, "temperature": 0.0,
        "stream": True, "ignore_eos": True})
    assert r.status == 200
    raw = await r.read()
    chunks = [json.loads(c) for c in raw.split(b"\0") if c]
    assert len(chunks) >= 2
    texts = [c["text"][0] for c in chunks]
    for prev, cur in zip(texts, texts[1:]):
        assert cur.startswith("t5 t6")
        assert len(cur) >= len(prev)

    await client.close()
