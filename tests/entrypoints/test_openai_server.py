"""OpenAI-compatible server surface tests (reference pattern:
tests/entrypoints/test_openai_server.py) against a tiny local model,
driven through aiohttp's in-process test client."""
import asyncio
import json

import pytest

CHAT_TEMPLATE = ("{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}"
                 "\n{% endfor %}assistant:")


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_llama_srv"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d


def test_openai_server_surface(tiny_checkpoint):
    asyncio.run(_scenario(tiny_checkpoint))


async def _scenario(model_dir):
    from aiohttp.test_utils import TestClient, TestServer

    from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
    from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
    from vllm_splitwise_tpu.entrypoints.openai.api_server import build_app
    from vllm_splitwise_tpu.entrypoints.openai.serving_chat import \
        OpenAIServingChat
    from vllm_splitwise_tpu.entrypoints.openai.serving_completion import \
        OpenAIServingCompletion

    engine_args = AsyncEngineArgs(model=model_dir, dtype="float32",
                                  max_model_len=256,
                                  num_gpu_blocks_override=64,
                                  max_num_seqs=8, max_paddings=512,
                                  disable_log_stats=True,
                                  disable_log_requests=True)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    chat = OpenAIServingChat(engine, "tiny", "assistant", None,
                             CHAT_TEMPLATE)
    completion = OpenAIServingCompletion(engine, "tiny", None)
    await chat.post_init()
    await completion.post_init()
    app = build_app(chat, completion, engine, api_key="sekrit")

    client = TestClient(TestServer(app))
    await client.start_server()
    auth = {"Authorization": "Bearer sekrit"}

    # health (no auth needed)
    r = await client.get("/health")
    assert r.status == 200

    # auth required on /v1
    r = await client.get("/v1/models")
    assert r.status == 401

    # /v1/models
    r = await client.get("/v1/models", headers=auth)
    assert r.status == 200
    models = await r.json()
    assert models["data"][0]["id"] == "tiny"

    # completions (string prompt)
    r = await client.post("/v1/completions", headers=auth, json={
        "model": "tiny", "prompt": "t5 t6 t7", "max_tokens": 6,
        "temperature": 0.0, "ignore_eos": True})
    assert r.status == 200
    body = await r.json()
    assert body["object"] == "text_completion"
    assert len(body["choices"]) == 1
    assert body["usage"]["completion_tokens"] == 6
    assert body["choices"][0]["finish_reason"] == "length"

    # completions (batched token-ids prompts, n=2, logprobs, echo)
    r = await client.post("/v1/completions", headers=auth, json={
        "model": "tiny", "prompt": [[5, 6, 7], [9, 10]], "max_tokens": 4,
        "temperature": 1.0, "n": 2, "seed": 7, "logprobs": 3,
        "echo": True, "ignore_eos": True})
    assert r.status == 200
    body = await r.json()
    assert len(body["choices"]) == 4
    lp = body["choices"][0]["logprobs"]
    assert lp is not None and len(lp["tokens"]) == 3 + 4  # echo + gen
    assert lp["token_logprobs"][0] is None  # prompt tokens have no logprob

    # unknown model -> 404
    r = await client.post("/v1/completions", headers=auth, json={
        "model": "nope", "prompt": "x", "max_tokens": 2})
    assert r.status == 404

    # streaming completions (SSE)
    r = await client.post("/v1/completions", headers=auth, json={
        "model": "tiny", "prompt": "t5 t6", "max_tokens": 4,
        "temperature": 0.0, "stream": True, "ignore_eos": True})
    assert r.status == 200
    text = (await r.read()).decode()
    events = [l[len("data: "):] for l in text.splitlines()
              if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    payloads = [json.loads(e) for e in events[:-1]]
    got_text = "".join(p["choices"][0]["text"] for p in payloads)
    assert len(got_text) > 0
    assert any(p["choices"][0].get("finish_reason") == "length"
               for p in payloads)

    # chat completions
    r = await client.post("/v1/chat/completions", headers=auth, json={
        "model": "tiny",
        "messages": [{"role": "user", "content": "t5 t6"}],
        "max_tokens": 4, "temperature": 0.0, "ignore_eos": True})
    assert r.status == 200
    body = await r.json()
    assert body["object"] == "chat.completion"
    assert body["choices"][0]["message"]["role"] == "assistant"
    assert body["usage"]["completion_tokens"] == 4

    # chat streaming
    r = await client.post("/v1/chat/completions", headers=auth, json={
        "model": "tiny",
        "messages": [{"role": "user", "content": "t5 t6"}],
        "max_tokens": 3, "temperature": 0.0, "stream": True,
        "ignore_eos": True})
    assert r.status == 200
    text = (await r.read()).decode()
    events = [l[len("data: "):] for l in text.splitlines()
              if l.startswith("data: ")]
    assert events[-1] == "[DONE]"
    first = json.loads(events[0])
    assert first["choices"][0]["delta"]["role"] == "assistant"

    # /metrics exposes prometheus text
    r = await client.get("/metrics")
    assert r.status in (200, 501)

    await client.close()
