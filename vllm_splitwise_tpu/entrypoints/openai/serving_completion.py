"""/v1/completions endpoint.

Role parity with the reference's
``vllm/entrypoints/openai/serving_completion.py``: batched prompts, n>1
candidates, SSE streaming, echo, logprobs, guided decoding.

Structure: echo/delta assembly is ONE function (``_segment``) shared by
the streaming and full-response paths — the wire formats differ but what
to emit for an output does not.  Per-choice streaming state lives in a
``_Cursor`` record rather than parallel lists.
"""
from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass
from typing import AsyncGenerator, AsyncIterator, List, Optional, Tuple

from vllm_splitwise_tpu.entrypoints.openai.protocol import (
    CompletionRequest, CompletionResponse, CompletionResponseChoice,
    CompletionResponseStreamChoice, CompletionStreamResponse, LogProbs,
    UsageInfo)
from vllm_splitwise_tpu.entrypoints.openai.serving_engine import OpenAIServing
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.outputs import CompletionOutput, RequestOutput
from vllm_splitwise_tpu.utils import random_uuid

logger = init_logger(__name__)


def parse_prompt_format(prompt) -> Tuple[bool, list]:
    """Normalise the four accepted prompt shapes (str, [str], [int],
    [[int]]) to (prompt_is_tokens, list_of_prompts)."""
    if isinstance(prompt, str):
        return False, [prompt]
    if isinstance(prompt, list):
        if not prompt:
            raise ValueError("please provide at least one prompt")
        head = prompt[0]
        if isinstance(head, str):
            return False, prompt
        if isinstance(head, int):
            return True, [prompt]
        if isinstance(head, list) and head and isinstance(head[0], int):
            return True, prompt
    raise ValueError("prompt must be a string, array of strings, array of "
                     "tokens, or array of token arrays")


_STREAM_DONE = object()


def _fan_in(streams) -> AsyncIterator[Tuple[int, RequestOutput]]:
    """Interleave several request streams into one, tagging each item
    with its source index.  Ends when every source ends; a source error
    surfaces on the merged stream."""
    funnel: asyncio.Queue = asyncio.Queue()

    async def pour(idx, stream):
        try:
            async for item in stream:
                funnel.put_nowait((idx, item))
        except Exception as exc:  # noqa: BLE001 - re-raised at consumer
            funnel.put_nowait(exc)
        finally:
            funnel.put_nowait(_STREAM_DONE)

    for idx, stream in enumerate(streams):
        asyncio.get_event_loop().create_task(pour(idx, stream))

    async def merged():
        open_sources = len(streams)
        while open_sources:
            item = await funnel.get()
            if item is _STREAM_DONE:
                open_sources -= 1
            elif isinstance(item, Exception):
                raise item
            else:
                yield item

    return merged()


@dataclass
class _Cursor:
    """Streaming progress of one choice slot."""
    chars: int = 0
    toks: int = 0
    echoed: bool = False


class OpenAIServingCompletion(OpenAIServing):

    async def create_completion(self, request: CompletionRequest,
                                raw_request=None):
        """Returns CompletionResponse | ErrorResponse | an async generator
        of SSE strings (when streaming)."""
        error = await self._check_model(request)
        if error is not None:
            return error
        if request.suffix is not None:
            return self.create_error_response(
                "suffix is not currently supported")
        request_id = f"cmpl-{random_uuid()}"
        created_time = int(time.time())

        try:
            sampling_params = request.to_sampling_params()
            lora_request = self._maybe_get_lora(request)
            from vllm_splitwise_tpu.layers.guided_decoding import \
                get_guided_decoding_logits_processor
            guided = await get_guided_decoding_logits_processor(
                request, self.tokenizer)
            if guided is not None:
                sampling_params.logits_processors.append(guided)

            is_tokens, prompts = parse_prompt_format(request.prompt)
            streams = []
            for idx, one_prompt in enumerate(prompts):
                kwargs = ({"prompt_ids": one_prompt} if is_tokens else
                          {"prompt": one_prompt})
                input_ids = self._validate_prompt_and_tokenize(
                    request, **kwargs)
                streams.append(
                    self.engine.generate(None,
                                         sampling_params,
                                         f"{request_id}-{idx}",
                                         prompt_token_ids=input_ids,
                                         lora_request=lora_request))
        except ValueError as e:
            return self.create_error_response(str(e))

        merged = _fan_in(streams)

        # Beam search and best_of>n buffer candidates until the end, so
        # only plain sampling streams incrementally.
        can_stream = (request.stream and not request.use_beam_search
                      and (request.best_of is None
                           or request.n == request.best_of))
        if can_stream:
            return self._stream_response(request, merged, request_id,
                                         created_time, request.model,
                                         len(prompts))
        return await self._full_response(request, merged, request_id,
                                         created_time, request.model,
                                         len(prompts), raw_request)

    # ---- shared assembly -------------------------------------------------

    @staticmethod
    def _segment(request: CompletionRequest, res: RequestOutput,
                 output: CompletionOutput, *, from_text: int = 0,
                 from_token: int = 0, echo_now: bool = False):
        """(text, token_ids, logprob dicts) to emit for this output.

        ``echo_now`` prepends the prompt (first frame of an echo stream,
        or any echoed full response); prompt positions without computed
        logprobs surface as nulls.
        """
        if echo_now:
            prompt_lps = (res.prompt_logprobs
                          or [None] * len(res.prompt_token_ids))
            if request.max_tokens == 0:
                return res.prompt, res.prompt_token_ids, res.prompt_logprobs
            return ((res.prompt or "") + output.text,
                    res.prompt_token_ids + output.token_ids,
                    prompt_lps + (output.logprobs or []))
        return (output.text[from_text:], output.token_ids[from_token:],
                output.logprobs[from_token:] if output.logprobs else None)

    def _maybe_logprobs(self, request: CompletionRequest, token_ids, lps,
                        text_offset: int = 0) -> Optional[LogProbs]:
        if request.logprobs is None:
            return None
        return self._create_logprobs(token_ids=token_ids,
                                     top_logprobs=lps,
                                     num_output_top_logprobs=request.logprobs,
                                     initial_text_offset=text_offset)

    # ---- streaming path ---------------------------------------------------

    async def _stream_response(
            self, request: CompletionRequest,
            merged: AsyncIterator[Tuple[int, RequestOutput]],
            request_id: str, created_time: int, model_name: str,
            num_prompts: int) -> AsyncGenerator[str, None]:

        def frame(slot: int, text: str, logprobs, finish_reason,
                  usage=None) -> str:
            payload = CompletionStreamResponse(
                id=request_id,
                created=created_time,
                model=model_name,
                choices=[
                    CompletionResponseStreamChoice(
                        index=slot,
                        text=text,
                        logprobs=logprobs,
                        finish_reason=finish_reason)
                ],
                **({"usage": usage} if usage is not None else {}),
            ).model_dump_json(exclude_unset=True)
            return f"data: {payload}\n\n"

        cursors = [_Cursor() for _ in range(request.n * num_prompts)]
        try:
            async for prompt_idx, res in merged:
                for output in res.outputs:
                    slot = prompt_idx * request.n + output.index
                    cur = cursors[slot]
                    text, ids, lps = self._segment(
                        request, res, output,
                        from_text=cur.chars, from_token=cur.toks,
                        echo_now=request.echo and not cur.echoed)
                    logprobs = self._maybe_logprobs(request, ids, lps,
                                                    cur.chars)
                    cur.echoed = True
                    cur.chars = len(output.text)
                    cur.toks = len(output.token_ids)
                    yield frame(slot, text, logprobs, output.finish_reason)

                    if output.finish_reason is not None:
                        # Terminal frame carries usage accounting.
                        n_prompt = len(res.prompt_token_ids)
                        n_out = len(output.token_ids)
                        yield frame(
                            slot, "",
                            LogProbs() if request.logprobs is not None
                            else None,
                            output.finish_reason,
                            usage=UsageInfo(
                                prompt_tokens=n_prompt,
                                completion_tokens=n_out,
                                total_tokens=n_prompt + n_out))
        except ValueError as e:
            data = self.create_error_response(str(e)).model_dump_json()
            yield f"data: {data}\n\n"
        yield "data: [DONE]\n\n"

    # ---- buffered path ------------------------------------------------------

    async def _full_response(self, request, merged, request_id, created_time,
                             model_name, num_prompts, raw_request):
        results: List[Optional[RequestOutput]] = [None] * num_prompts
        try:
            async for idx, res in merged:
                if (raw_request is not None
                        and getattr(raw_request, "transport", True) is None):
                    # Client hung up; stop burning TPU time on it.
                    await self.engine.abort(f"{request_id}-{idx}")
                    return self.create_error_response("Client disconnected")
                results[idx] = res
            return self.request_output_to_completion_response(
                results, request, request_id, created_time, model_name)
        except ValueError as e:
            return self.create_error_response(str(e))

    def request_output_to_completion_response(
            self, results: List[RequestOutput], request: CompletionRequest,
            request_id: str, created_time: int,
            model_name: str) -> CompletionResponse:
        choices: List[CompletionResponseChoice] = []
        prompt_total = 0
        output_total = 0
        for res in results:
            assert res is not None
            for output in res.outputs:
                text, ids, lps = self._segment(request, res, output,
                                               echo_now=request.echo)
                choices.append(
                    CompletionResponseChoice(
                        index=len(choices),
                        text=text,
                        logprobs=self._maybe_logprobs(request, ids, lps),
                        finish_reason=output.finish_reason))
            prompt_total += len(res.prompt_token_ids)
            output_total += sum(len(o.token_ids) for o in res.outputs)

        return CompletionResponse(
            id=request_id,
            created=created_time,
            model=model_name,
            choices=choices,
            usage=UsageInfo(prompt_tokens=prompt_total,
                            completion_tokens=output_total,
                            total_tokens=prompt_total + output_total))
