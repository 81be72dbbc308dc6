"""/v1/chat/completions endpoint.

Role parity with the reference's
``vllm/entrypoints/openai/serving_chat.py``: jinja chat templates, a
role-bearing first stream frame, optional echo of the trailing message,
incremental content deltas, and usage accounting on the terminal frame.

Structured like its sibling ``serving_completion.py`` rather than the
reference: one local ``frame()`` emitter owns the SSE wire format, each
choice's streaming state lives in a ``_Progress`` record (not parallel
lists), and the echoed text rides the first content delta instead of a
dedicated echo frame.
"""
from __future__ import annotations

import codecs
import time
from dataclasses import dataclass
from typing import AsyncGenerator, List, Optional, Union

from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_splitwise_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, ChatCompletionResponse,
    ChatCompletionResponseChoice, ChatCompletionResponseStreamChoice,
    ChatCompletionStreamResponse, ChatMessage, DeltaMessage, ErrorResponse,
    UsageInfo)
from vllm_splitwise_tpu.entrypoints.openai.serving_engine import (
    LoRA, OpenAIServing)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.outputs import RequestOutput
from vllm_splitwise_tpu.utils import random_uuid

logger = init_logger(__name__)


@dataclass
class _Progress:
    """Streaming progress of one chat choice."""
    chars: int = 0
    toks: int = 0
    opened: bool = False  # role frame sent
    closed: bool = False  # finish_reason sent


def _usage(num_prompt: int, num_out: int) -> UsageInfo:
    return UsageInfo(prompt_tokens=num_prompt,
                     completion_tokens=num_out,
                     total_tokens=num_prompt + num_out)


class OpenAIServingChat(OpenAIServing):

    def __init__(self,
                 engine: AsyncLLMEngine,
                 served_model: str,
                 response_role: str = "assistant",
                 lora_modules: Optional[List[LoRA]] = None,
                 chat_template: Optional[str] = None):
        super().__init__(engine=engine,
                         served_model=served_model,
                         lora_modules=lora_modules)
        self.response_role = response_role
        self._chat_template = chat_template

    async def post_init(self):
        await super().post_init()
        self._install_chat_template(self._chat_template)

    def _install_chat_template(self, source: Optional[str]) -> None:
        """Accepts a template file path or a literal jinja string (with
        escaped newlines, as the CLI passes them)."""
        if source is None:
            if getattr(self.tokenizer, "chat_template", None) is None:
                logger.warning("Tokenizer ships no chat template and none "
                               "was supplied; /v1/chat/completions will "
                               "reject requests.")
            return
        try:
            with open(source) as f:
                template = f.read()
        except OSError:
            template = codecs.decode(source, "unicode_escape")
        self.tokenizer.chat_template = template
        logger.info("Installed chat template (%d chars)", len(template))

    # ---- request plumbing --------------------------------------------------

    def _reply_role(self, request: ChatCompletionRequest) -> str:
        """Role attributed to the generated message: the configured
        response role normally; the trailing message's role when the
        client asked to continue it (add_generation_prompt=False)."""
        if request.add_generation_prompt:
            return self.response_role
        return request.messages[-1]["role"]

    def _echo_text(self, request: ChatCompletionRequest) -> str:
        """Text prepended when echo is on: the trailing message's content,
        provided it is already attributed to the reply role (i.e. the
        model is continuing that message)."""
        if not request.echo or not request.messages:
            return ""
        tail = request.messages[-1]
        if tail.get("role") == self._reply_role(request):
            return tail.get("content") or ""
        return ""

    async def create_chat_completion(self, request: ChatCompletionRequest,
                                     raw_request=None):
        """Returns ChatCompletionResponse | ErrorResponse | an async
        generator of SSE strings (when streaming)."""
        error = await self._check_model(request)
        if error is not None:
            return error

        try:
            prompt = self.tokenizer.apply_chat_template(
                conversation=request.messages,
                tokenize=False,
                add_generation_prompt=request.add_generation_prompt)
        except Exception as e:  # noqa: BLE001 - template errors -> 400
            logger.error("chat template failed: %s", e)
            return self.create_error_response(str(e))

        request_id = f"chatcmpl-{random_uuid()}"
        try:
            token_ids = self._validate_prompt_and_tokenize(request,
                                                           prompt=prompt)
            sampling_params = request.to_sampling_params()
            lora_request = self._maybe_get_lora(request)
            from vllm_splitwise_tpu.layers.guided_decoding import \
                get_guided_decoding_logits_processor
            guided = await get_guided_decoding_logits_processor(
                request, self.tokenizer)
            if guided is not None:
                sampling_params.logits_processors.append(guided)
        except ValueError as e:
            return self.create_error_response(str(e))

        results = self.engine.generate(prompt, sampling_params, request_id,
                                       token_ids, lora_request)
        if request.stream:
            return self._stream_response(request, results, request_id)
        return await self._full_response(request, results, request_id,
                                         raw_request)

    # ---- streaming path ----------------------------------------------------

    async def _stream_response(
            self, request: ChatCompletionRequest,
            results: AsyncGenerator[RequestOutput, None],
            request_id: str) -> AsyncGenerator[str, None]:
        created = int(time.time())
        model_name = request.model
        role = self._reply_role(request)
        echo_text = self._echo_text(request)

        def frame(index: int, delta: DeltaMessage,
                  finish_reason: Optional[str] = None,
                  usage: Optional[UsageInfo] = None) -> str:
            payload = ChatCompletionStreamResponse(
                id=request_id,
                object="chat.completion.chunk",
                created=created,
                model=model_name,
                choices=[
                    ChatCompletionResponseStreamChoice(
                        index=index, delta=delta,
                        finish_reason=finish_reason)
                ],
                **({"usage": usage} if usage is not None else {}),
            ).model_dump_json(exclude_unset=True, exclude_none=True)
            return f"data: {payload}\n\n"

        progress = [_Progress() for _ in range(request.n)]
        # Role frames lead, one per choice (OpenAI stream shape).
        for i, cur in enumerate(progress):
            cur.opened = True
            yield frame(i, DeltaMessage(role=role))

        try:
            async for res in results:
                for output in res.outputs:
                    cur = progress[output.index]
                    if cur.closed:
                        continue
                    delta_text = output.text[cur.chars:]
                    if not cur.toks and echo_text:
                        # Echo rides the first content delta.
                        delta_text = echo_text + delta_text
                    cur.chars = len(output.text)
                    cur.toks = len(output.token_ids)
                    if output.finish_reason is None:
                        yield frame(output.index,
                                    DeltaMessage(content=delta_text))
                        continue
                    cur.closed = True
                    yield frame(
                        output.index, DeltaMessage(content=delta_text),
                        finish_reason=output.finish_reason,
                        usage=_usage(len(res.prompt_token_ids), cur.toks))
        except ValueError as e:
            data = self.create_error_response(str(e)).model_dump_json()
            yield f"data: {data}\n\n"
        yield "data: [DONE]\n\n"

    # ---- buffered path -----------------------------------------------------

    async def _full_response(
            self, request: ChatCompletionRequest,
            results: AsyncGenerator[RequestOutput, None], request_id: str,
            raw_request) -> Union[ErrorResponse, ChatCompletionResponse]:
        final: Optional[RequestOutput] = None
        async for res in results:
            if (raw_request is not None
                    and getattr(raw_request, "transport", True) is None):
                await self.engine.abort(request_id)
                return self.create_error_response("Client disconnected")
            final = res
        assert final is not None

        role = self._reply_role(request)
        echo_text = self._echo_text(request)
        choices = [
            ChatCompletionResponseChoice(
                index=output.index,
                message=ChatMessage(role=role,
                                    content=echo_text + (output.text or "")),
                finish_reason=output.finish_reason)
            for output in final.outputs
        ]
        num_out = sum(len(o.token_ids) for o in final.outputs)
        return ChatCompletionResponse(
            id=request_id,
            created=int(time.time()),
            model=request.model,
            choices=choices,
            usage=_usage(len(final.prompt_token_ids), num_out))
