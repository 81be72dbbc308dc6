"""OpenAI-compatible server surface tests (reference scope:
tests/entrypoints/test_openai_server.py's 15 scenarios) against a tiny
local model, driven through aiohttp's in-process test client.

One AsyncLLMEngine + app is built per module; every test coroutine runs
on the module's event loop (the engine's background loop is bound to
it)."""
import asyncio
import json
import re

import pytest

CHAT_TEMPLATE = ("{% for m in messages %}{{ m['role'] }}: {{ m['content'] }}"
                 "\n{% endfor %}assistant:")


class _Server:
    """Shared loop + in-process client wrapper."""

    def __init__(self, model_dir):
        self.loop = asyncio.new_event_loop()
        self.model_dir = model_dir
        self.client = self.loop.run_until_complete(self._start())
        self.auth = {"Authorization": "Bearer sekrit"}

    async def _start(self):
        from aiohttp.test_utils import TestClient, TestServer

        from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
        from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
        from vllm_splitwise_tpu.entrypoints.openai.api_server import build_app
        from vllm_splitwise_tpu.entrypoints.openai.serving_chat import \
            OpenAIServingChat
        from vllm_splitwise_tpu.entrypoints.openai.serving_completion import \
            OpenAIServingCompletion

        engine_args = AsyncEngineArgs(model=self.model_dir, dtype="float32",
                                      max_model_len=256,
                                      num_gpu_blocks_override=64,
                                      max_num_seqs=8, max_paddings=512,
                                      max_logprobs=8,
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
        return client

    def run(self, coro):
        return self.loop.run_until_complete(coro)

    async def post(self, path, **payload):
        r = await self.client.post(path, headers=self.auth, json=payload)
        return r.status, (await r.json() if
                          r.content_type == "application/json"
                          else (await r.read()).decode())

    async def sse(self, path, **payload):
        """POST a streaming request; returns the decoded event payloads."""
        r = await self.client.post(path, headers=self.auth,
                                   json=dict(payload, stream=True))
        assert r.status == 200
        text = (await r.read()).decode()
        events = [ln[len("data: "):] for ln in text.splitlines()
                  if ln.startswith("data: ")]
        assert events[-1] == "[DONE]"
        return [json.loads(e) for e in events[:-1]]

    def close(self):
        self.loop.run_until_complete(self.client.close())
        self.loop.close()


@pytest.fixture(scope="module")
def srv(tmp_path_factory):
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_llama_srv"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    server = _Server(d)
    yield server
    server.close()


def test_health_auth_models(srv):
    async def go():
        r = await srv.client.get("/health")
        assert r.status == 200
        r = await srv.client.get("/v1/models")
        assert r.status == 401  # auth required
        r = await srv.client.get("/v1/models", headers=srv.auth)
        assert r.status == 200
        models = await r.json()
        assert models["data"][0]["id"] == "tiny"
        r = await srv.client.get("/metrics")
        assert r.status in (200, 501)
    srv.run(go())


def test_single_completion(srv):
    async def go():
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6 t7",
            max_tokens=6, temperature=0.0, ignore_eos=True)
        assert status == 200
        assert body["object"] == "text_completion"
        assert len(body["choices"]) == 1
        assert body["usage"]["completion_tokens"] == 6
        assert body["choices"][0]["finish_reason"] == "length"
    srv.run(go())


def test_batch_completions_n_logprobs_echo(srv):
    async def go():
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt=[[5, 6, 7], [9, 10]],
            max_tokens=4, temperature=1.0, n=2, seed=7, logprobs=3,
            echo=True, ignore_eos=True)
        assert status == 200
        assert len(body["choices"]) == 4
        lp = body["choices"][0]["logprobs"]
        assert lp is not None and len(lp["tokens"]) == 3 + 4  # echo + gen
        assert lp["token_logprobs"][0] is None  # prompt head: no logprob
    srv.run(go())


def test_unknown_model_404(srv):
    async def go():
        status, _ = await srv.post("/v1/completions", model="nope",
                                   prompt="x", max_tokens=2)
        assert status == 404
    srv.run(go())


def test_too_many_logprobs_rejected(srv):
    async def go():
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5", max_tokens=2,
            logprobs=50)
        assert status == 400
        assert "logprobs" in json.dumps(body)
    srv.run(go())


def test_completion_streaming_matches_nonstream(srv):
    async def go():
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=5, temperature=0.0, ignore_eos=True)
        assert status == 200
        full = body["choices"][0]["text"]
        payloads = await srv.sse(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=5, temperature=0.0, ignore_eos=True)
        got = "".join(p["choices"][0]["text"] for p in payloads)
        assert got == full
        assert any(p["choices"][0].get("finish_reason") == "length"
                   for p in payloads)
    srv.run(go())


def test_completion_streaming_n2(srv):
    async def go():
        payloads = await srv.sse(
            "/v1/completions", model="tiny", prompt="t5 t6 t7",
            max_tokens=4, temperature=1.0, seed=3, n=2, ignore_eos=True)
        texts = {0: "", 1: ""}
        finished = set()
        for p in payloads:
            for c in p["choices"]:
                texts[c["index"]] += c["text"]
                if c.get("finish_reason"):
                    finished.add(c["index"])
        assert finished == {0, 1}
        assert all(len(t) > 0 for t in texts.values())
    srv.run(go())


def test_logit_bias_forces_and_bans(srv):
    async def go():
        # +100 on one token makes greedy pick it every step.
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt=[[5, 6, 7]],
            max_tokens=4, temperature=0.0, ignore_eos=True,
            logit_bias={"42": 100.0})
        assert status == 200
        forced = body["choices"][0]["text"]
        assert forced.split() == ["t42"] * 4

        # Baseline greedy pick, then ban it: the first token must change.
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt=[[5, 6, 7]],
            max_tokens=1, temperature=0.0, ignore_eos=True, logprobs=1)
        first_tok = body["choices"][0]["logprobs"]["tokens"][0]
        tok_id = int(first_tok.lstrip("t"))
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt=[[5, 6, 7]],
            max_tokens=1, temperature=0.0, ignore_eos=True, logprobs=1,
            logit_bias={str(tok_id): -100.0})
        assert body["choices"][0]["logprobs"]["tokens"][0] != first_tok
    srv.run(go())


def test_chat_session_and_streaming(srv):
    async def go():
        status, body = await srv.post(
            "/v1/chat/completions", model="tiny",
            messages=[{"role": "user", "content": "t5 t6"}],
            max_tokens=4, temperature=0.0, ignore_eos=True)
        assert status == 200
        assert body["object"] == "chat.completion"
        assert body["choices"][0]["message"]["role"] == "assistant"
        assert body["usage"]["completion_tokens"] == 4
        full = body["choices"][0]["message"]["content"]

        payloads = await srv.sse(
            "/v1/chat/completions", model="tiny",
            messages=[{"role": "user", "content": "t5 t6"}],
            max_tokens=4, temperature=0.0, ignore_eos=True)
        assert payloads[0]["choices"][0]["delta"]["role"] == "assistant"
        got = "".join(p["choices"][0]["delta"].get("content", "")
                      for p in payloads)
        assert got == full
    srv.run(go())


def test_guided_regex_completion(srv):
    async def go():
        # NB: the tiny tokenizer's vocab is t3..t255 (0-2 are specials).
        pattern = r"t3 t4 t[0-9]"
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=12, temperature=0.0, guided_regex=pattern)
        assert status == 200
        assert re.fullmatch(pattern, body["choices"][0]["text"].strip())
    srv.run(go())


def test_guided_untokenizable_pattern_stops_empty(srv):
    async def go():
        # "t1"/"t2" are not in the vocab: no token can advance the FSM,
        # so the processor must force EOS at step 0 -> empty completion,
        # not unguided text.
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=12, temperature=0.0, guided_regex=r"t1 t2")
        assert status == 200
        assert body["choices"][0]["text"] == ""
        assert body["choices"][0]["finish_reason"] == "stop"
    srv.run(go())


def test_guided_choice_completion_and_chat(srv):
    async def go():
        choices = ["t3 t4", "t7 t8", "t9"]
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=8, temperature=0.0, guided_choice=choices)
        assert status == 200
        assert body["choices"][0]["text"].strip() in choices

        status, body = await srv.post(
            "/v1/chat/completions", model="tiny",
            messages=[{"role": "user", "content": "t5"}],
            max_tokens=8, temperature=0.0, guided_choice=choices)
        assert status == 200
        assert body["choices"][0]["message"]["content"].strip() in choices
    srv.run(go())


@pytest.fixture()
def json_srv(tmp_path_factory):
    """A server whose tokenizer can emit JSON: the tail of the vocab is
    JSON punctuation/atom words (WordLevel decode joins words with
    spaces, which the schema regex's whitespace pattern accepts)."""
    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_llama_json"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size,
                        extra_words=("{", "}", ":", ",", '"a"', '"b"',
                                     "0", "1", "2", "3", "4", "5", "true",
                                     "false"))
    server = _Server(d)
    yield server
    server.close()


def test_guided_json_completion(json_srv):
    async def go():
        schema = {
            "type": "object",
            "properties": {
                "a": {"type": "integer"},
                "b": {"type": "boolean"},
            },
        }
        status, body = await json_srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=48, temperature=0.0, guided_json=schema)
        assert status == 200
        text = body["choices"][0]["text"]
        parsed = json.loads(text)
        assert isinstance(parsed["a"], int)
        assert isinstance(parsed["b"], bool)
    json_srv.run(go())


def test_guided_conflicting_params_rejected(srv):
    async def go():
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5",
            max_tokens=4, guided_regex="t3", guided_choice=["t4"])
        assert status == 400
    srv.run(go())


def test_stop_string(srv):
    async def go():
        # Find the greedy continuation, then use its second token as a
        # stop string: generation must end before emitting it.
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=6, temperature=0.0, ignore_eos=True, logprobs=1)
        toks = body["choices"][0]["logprobs"]["tokens"]
        stop_word = toks[1]
        status, body = await srv.post(
            "/v1/completions", model="tiny", prompt="t5 t6",
            max_tokens=6, temperature=0.0, ignore_eos=True,
            stop=[stop_word])
        assert status == 200
        assert body["choices"][0]["finish_reason"] == "stop"
        assert stop_word not in body["choices"][0]["text"]
    srv.run(go())
