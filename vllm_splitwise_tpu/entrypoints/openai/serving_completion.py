"""/v1/completions implementation (reference role:
vllm/entrypoints/openai/serving_completion.py): batched prompts, n>1,
streaming SSE, echo, logprobs."""
from __future__ import annotations

import time
from typing import (AsyncGenerator, AsyncIterator, Dict, List, Optional,
                    Tuple)

from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_splitwise_tpu.entrypoints.openai.protocol import (
    CompletionRequest, CompletionResponse, CompletionResponseChoice,
    CompletionResponseStreamChoice, CompletionStreamResponse, LogProbs,
    UsageInfo)
from vllm_splitwise_tpu.entrypoints.openai.serving_engine import (
    LoRA, OpenAIServing)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.outputs import RequestOutput
from vllm_splitwise_tpu.utils import random_uuid

logger = init_logger(__name__)

TypeTokenIDs = List[int]
TypeTopLogProbs = List[Optional[Dict[int, float]]]
TypeCreateLogProbs = Tuple[TypeTokenIDs, List[str], TypeTopLogProbs, int]


def parse_prompt_format(prompt) -> Tuple[bool, list]:
    """Returns (prompt_is_tokens, prompts): str | List[str] | List[int] |
    List[List[int]] normalised to a list."""
    prompt_is_tokens = False
    prompts = [prompt]
    if isinstance(prompt, list):
        if len(prompt) == 0:
            raise ValueError("please provide at least one prompt")
        elif isinstance(prompt[0], str):
            prompt_is_tokens = False
            prompts = prompt
        elif isinstance(prompt[0], int):
            prompt_is_tokens = True
            prompts = [prompt]
        elif isinstance(prompt[0], list) and isinstance(prompt[0][0], int):
            prompt_is_tokens = True
            prompts = prompt
        else:
            raise ValueError(
                "prompt must be a string, array of strings, array of "
                "tokens, or array of token arrays")
    return prompt_is_tokens, prompts


def merge_async_iterators(*iterators) -> AsyncIterator[Tuple[int, object]]:
    """Round-robin merge tagged with the iterator index."""
    import asyncio
    queue: asyncio.Queue = asyncio.Queue()
    finished = [False] * len(iterators)

    async def producer(i, iterator):
        try:
            async for item in iterator:
                await queue.put((i, item))
        except Exception as e:  # noqa: BLE001
            await queue.put(e)
        finished[i] = True

    _tasks = [
        asyncio.get_event_loop().create_task(producer(i, it))
        for i, it in enumerate(iterators)
    ]

    async def consumer():
        while not all(finished) or not queue.empty():
            item = await queue.get()
            if isinstance(item, Exception):
                raise item
            yield item

    return consumer()


class OpenAIServingCompletion(OpenAIServing):

    def __init__(self,
                 engine: AsyncLLMEngine,
                 served_model: str,
                 lora_modules: Optional[List[LoRA]] = None):
        super().__init__(engine=engine,
                         served_model=served_model,
                         lora_modules=lora_modules)

    async def create_completion(self, request: CompletionRequest,
                                raw_request=None):
        """Returns CompletionResponse | ErrorResponse | async generator of
        SSE strings (when streaming)."""
        error_check_ret = await self._check_model(request)
        if error_check_ret is not None:
            return error_check_ret

        if request.suffix is not None:
            return self.create_error_response(
                "suffix is not currently supported")
        if request.logit_bias is not None and len(request.logit_bias) > 0:
            return self.create_error_response(
                "logit_bias is not currently supported")

        model_name = request.model
        request_id = f"cmpl-{random_uuid()}"
        created_time = int(time.time())

        generators = []
        try:
            sampling_params = request.to_sampling_params()
            lora_request = self._maybe_get_lora(request)
            from vllm_splitwise_tpu.layers.guided_decoding import \
                get_guided_decoding_logits_processor
            guided_processor = await get_guided_decoding_logits_processor(
                request, self.tokenizer)
            if guided_processor is not None:
                sampling_params.logits_processors.append(guided_processor)
            prompt_is_tokens, prompts = parse_prompt_format(request.prompt)

            for i, prompt in enumerate(prompts):
                if prompt_is_tokens:
                    input_ids = self._validate_prompt_and_tokenize(
                        request, prompt_ids=prompt)
                else:
                    input_ids = self._validate_prompt_and_tokenize(
                        request, prompt=prompt)
                generators.append(
                    self.engine.generate(None,
                                         sampling_params,
                                         f"{request_id}-{i}",
                                         prompt_token_ids=input_ids,
                                         lora_request=lora_request))
        except ValueError as e:
            return self.create_error_response(str(e))

        result_generator = merge_async_iterators(*generators)

        stream = (request.stream
                  and (request.best_of is None or request.n == request.best_of)
                  and not request.use_beam_search)
        if stream:
            return self.completion_stream_generator(request,
                                                    result_generator,
                                                    request_id, created_time,
                                                    model_name,
                                                    num_prompts=len(prompts))

        final_res_batch: List[Optional[RequestOutput]] = [None] * len(prompts)
        try:
            async for i, res in result_generator:
                if raw_request is not None and hasattr(
                        raw_request, "transport") and \
                        raw_request.transport is None:
                    await self.engine.abort(f"{request_id}-{i}")
                    return self.create_error_response(
                        "Client disconnected")
                final_res_batch[i] = res
            response = self.request_output_to_completion_response(
                final_res_batch, request, request_id, created_time,
                model_name)
        except ValueError as e:
            return self.create_error_response(str(e))
        return response

    async def completion_stream_generator(
        self,
        request: CompletionRequest,
        result_generator: AsyncIterator[Tuple[int, RequestOutput]],
        request_id: str,
        created_time: int,
        model_name: str,
        num_prompts: int,
    ) -> AsyncGenerator[str, None]:
        previous_texts = [""] * request.n * num_prompts
        previous_num_tokens = [0] * request.n * num_prompts
        has_echoed = [False] * request.n * num_prompts

        try:
            async for prompt_idx, res in result_generator:
                for output in res.outputs:
                    i = output.index + prompt_idx * request.n

                    if request.echo and request.max_tokens == 0:
                        delta_text = res.prompt
                        delta_token_ids = res.prompt_token_ids
                        top_logprobs = res.prompt_logprobs
                        has_echoed[i] = True
                    elif request.echo and request.max_tokens > 0 and \
                            not has_echoed[i]:
                        delta_text = res.prompt + output.text
                        delta_token_ids = (res.prompt_token_ids +
                                           output.token_ids)
                        top_logprobs = (
                            (res.prompt_logprobs
                             or [None] * len(res.prompt_token_ids)) +
                            (output.logprobs or []))
                        has_echoed[i] = True
                    else:
                        delta_text = output.text[len(previous_texts[i]):]
                        delta_token_ids = output.token_ids[
                            previous_num_tokens[i]:]
                        top_logprobs = output.logprobs[
                            previous_num_tokens[i]:] if output.logprobs \
                            else None

                    if request.logprobs is not None:
                        logprobs = self._create_logprobs(
                            token_ids=delta_token_ids,
                            top_logprobs=top_logprobs,
                            num_output_top_logprobs=request.logprobs,
                            initial_text_offset=len(previous_texts[i]),
                        )
                    else:
                        logprobs = None

                    previous_texts[i] = output.text
                    previous_num_tokens[i] = len(output.token_ids)
                    finish_reason = output.finish_reason
                    response_json = CompletionStreamResponse(
                        id=request_id,
                        created=created_time,
                        model=model_name,
                        choices=[
                            CompletionResponseStreamChoice(
                                index=i,
                                text=delta_text,
                                logprobs=logprobs,
                                finish_reason=finish_reason,
                            )
                        ]).model_dump_json(exclude_unset=True)
                    yield f"data: {response_json}\n\n"

                    if output.finish_reason is not None:
                        logprobs = (LogProbs()
                                    if request.logprobs is not None else None)
                        prompt_tokens = len(res.prompt_token_ids)
                        completion_tokens = len(output.token_ids)
                        final_usage = UsageInfo(
                            prompt_tokens=prompt_tokens,
                            completion_tokens=completion_tokens,
                            total_tokens=prompt_tokens + completion_tokens,
                        )
                        response_json = CompletionStreamResponse(
                            id=request_id,
                            created=created_time,
                            model=model_name,
                            choices=[
                                CompletionResponseStreamChoice(
                                    index=i,
                                    text="",
                                    logprobs=logprobs,
                                    finish_reason=output.finish_reason,
                                )
                            ],
                            usage=final_usage,
                        ).model_dump_json(exclude_unset=True)
                        yield f"data: {response_json}\n\n"
        except ValueError as e:
            data = self.create_error_response(str(e)).model_dump_json()
            yield f"data: {data}\n\n"
        yield "data: [DONE]\n\n"

    def request_output_to_completion_response(
        self,
        final_res_batch: List[RequestOutput],
        request: CompletionRequest,
        request_id: str,
        created_time: int,
        model_name: str,
    ) -> CompletionResponse:
        choices = []
        num_prompt_tokens = 0
        num_generated_tokens = 0
        for final_res in final_res_batch:
            assert final_res is not None
            prompt_token_ids = final_res.prompt_token_ids
            prompt_logprobs = final_res.prompt_logprobs
            prompt_text = final_res.prompt

            for output in final_res.outputs:
                if request.echo and request.max_tokens == 0:
                    token_ids = prompt_token_ids
                    top_logprobs = prompt_logprobs
                    output_text = prompt_text
                elif request.echo and request.max_tokens > 0:
                    token_ids = prompt_token_ids + output.token_ids
                    # Prompt positions without computed logprobs render as
                    # null entries (OpenAI semantics for the first token).
                    top_logprobs = (
                        (prompt_logprobs
                         or [None] * len(prompt_token_ids)) +
                        (output.logprobs or []))
                    output_text = (prompt_text or "") + output.text
                else:
                    token_ids = output.token_ids
                    top_logprobs = output.logprobs
                    output_text = output.text

                if request.logprobs is not None:
                    logprobs = self._create_logprobs(
                        token_ids=token_ids,
                        top_logprobs=top_logprobs,
                        num_output_top_logprobs=request.logprobs,
                    )
                else:
                    logprobs = None
                choice_data = CompletionResponseChoice(
                    index=len(choices),
                    text=output_text,
                    logprobs=logprobs,
                    finish_reason=output.finish_reason,
                )
                choices.append(choice_data)

            num_prompt_tokens += len(prompt_token_ids)
            num_generated_tokens += sum(
                len(output.token_ids) for output in final_res.outputs)

        usage = UsageInfo(
            prompt_tokens=num_prompt_tokens,
            completion_tokens=num_generated_tokens,
            total_tokens=num_prompt_tokens + num_generated_tokens,
        )
        return CompletionResponse(
            id=request_id,
            created=created_time,
            model=model_name,
            choices=choices,
            usage=usage,
        )
