"""/v1/chat/completions implementation (reference role:
vllm/entrypoints/openai/serving_chat.py): jinja chat templates, streaming
deltas, usage accounting."""
from __future__ import annotations

import codecs
import time
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
        self._load_chat_template(self._chat_template)

    def _load_chat_template(self, chat_template: Optional[str]) -> None:
        if chat_template is not None:
            try:
                with open(chat_template, "r") as f:
                    self.tokenizer.chat_template = f.read()
            except OSError:
                # A literal jinja template string (possibly with escaped \n).
                self.tokenizer.chat_template = codecs.decode(
                    chat_template, "unicode_escape")
            logger.info("Using supplied chat template")
        elif getattr(self.tokenizer, "chat_template", None) is not None:
            logger.info("Using default chat template")
        else:
            logger.warning(
                "No chat template provided. Chat API will not work.")

    async def create_chat_completion(self, request: ChatCompletionRequest,
                                     raw_request=None):
        """Returns ChatCompletionResponse | ErrorResponse | SSE generator."""
        error_check_ret = await self._check_model(request)
        if error_check_ret is not None:
            return error_check_ret
        try:
            prompt = self.tokenizer.apply_chat_template(
                conversation=request.messages,
                tokenize=False,
                add_generation_prompt=request.add_generation_prompt)
        except Exception as e:  # noqa: BLE001
            logger.error("Error in applying chat template: %s", e)
            return self.create_error_response(str(e))

        request_id = f"chatcmpl-{random_uuid()}"
        try:
            token_ids = self._validate_prompt_and_tokenize(request,
                                                           prompt=prompt)
            sampling_params = request.to_sampling_params()
            lora_request = self._maybe_get_lora(request)
            from vllm_splitwise_tpu.layers.guided_decoding import \
                get_guided_decoding_logits_processor
            guided_processor = await get_guided_decoding_logits_processor(
                request, self.tokenizer)
            if guided_processor is not None:
                sampling_params.logits_processors.append(guided_processor)
        except ValueError as e:
            return self.create_error_response(str(e))

        result_generator = self.engine.generate(prompt, sampling_params,
                                                request_id, token_ids,
                                                lora_request)
        if request.stream:
            return self.chat_completion_stream_generator(
                request, result_generator, request_id)
        return await self.chat_completion_full_generator(
            request, raw_request, result_generator, request_id)

    def get_chat_request_role(self, request: ChatCompletionRequest) -> str:
        if request.add_generation_prompt:
            return self.response_role
        return request.messages[-1]["role"]

    async def chat_completion_stream_generator(
            self, request: ChatCompletionRequest,
            result_generator: AsyncGenerator[RequestOutput, None],
            request_id: str) -> AsyncGenerator[str, None]:
        model_name = request.model
        created_time = int(time.time())
        chunk_object_type = "chat.completion.chunk"

        # First chunk: the role.
        role = self.get_chat_request_role(request)
        for i in range(request.n):
            choice_data = ChatCompletionResponseStreamChoice(
                index=i, delta=DeltaMessage(role=role), finish_reason=None)
            chunk = ChatCompletionStreamResponse(id=request_id,
                                                 object=chunk_object_type,
                                                 created=created_time,
                                                 choices=[choice_data],
                                                 model=model_name)
            yield f"data: {chunk.model_dump_json(exclude_unset=True)}\n\n"

        # Echo the last message if requested (extension parity).
        if request.echo:
            last_msg_content = ""
            if (request.messages
                    and request.messages[-1].get("content")
                    and request.messages[-1].get("role") == role):
                last_msg_content = request.messages[-1]["content"]
            if last_msg_content:
                for i in range(request.n):
                    choice_data = ChatCompletionResponseStreamChoice(
                        index=i,
                        delta=DeltaMessage(content=last_msg_content),
                        finish_reason=None)
                    chunk = ChatCompletionStreamResponse(
                        id=request_id,
                        object=chunk_object_type,
                        created=created_time,
                        choices=[choice_data],
                        model=model_name)
                    yield (f"data: "
                           f"{chunk.model_dump_json(exclude_unset=True)}\n\n")

        previous_texts = [""] * request.n
        previous_num_tokens = [0] * request.n
        finish_reason_sent = [False] * request.n
        try:
            async for res in result_generator:
                for output in res.outputs:
                    i = output.index
                    if finish_reason_sent[i]:
                        continue
                    delta_text = output.text[len(previous_texts[i]):]
                    previous_texts[i] = output.text
                    previous_num_tokens[i] = len(output.token_ids)
                    if output.finish_reason is None:
                        choice_data = ChatCompletionResponseStreamChoice(
                            index=i,
                            delta=DeltaMessage(content=delta_text),
                            finish_reason=None)
                        chunk = ChatCompletionStreamResponse(
                            id=request_id,
                            object=chunk_object_type,
                            created=created_time,
                            choices=[choice_data],
                            model=model_name)
                        yield (f"data: "
                               f"{chunk.model_dump_json(exclude_unset=True)}"
                               "\n\n")
                    else:
                        prompt_tokens = len(res.prompt_token_ids)
                        final_usage = UsageInfo(
                            prompt_tokens=prompt_tokens,
                            completion_tokens=previous_num_tokens[i],
                            total_tokens=prompt_tokens +
                            previous_num_tokens[i],
                        )
                        choice_data = ChatCompletionResponseStreamChoice(
                            index=i,
                            delta=DeltaMessage(content=delta_text),
                            finish_reason=output.finish_reason)
                        chunk = ChatCompletionStreamResponse(
                            id=request_id,
                            object=chunk_object_type,
                            created=created_time,
                            choices=[choice_data],
                            model=model_name,
                            usage=final_usage)
                        yield (f"data: "
                               f"{chunk.model_dump_json(exclude_unset=True,exclude_none=True)}"
                               "\n\n")
                        finish_reason_sent[i] = True
        except ValueError as e:
            data = self.create_error_response(str(e)).model_dump_json()
            yield f"data: {data}\n\n"
        yield "data: [DONE]\n\n"

    async def chat_completion_full_generator(
            self, request: ChatCompletionRequest, raw_request,
            result_generator: AsyncGenerator[RequestOutput, None],
            request_id: str
    ) -> Union[ErrorResponse, ChatCompletionResponse]:
        model_name = request.model
        created_time = int(time.time())
        final_res: Optional[RequestOutput] = None

        async for res in result_generator:
            final_res = res
        assert final_res is not None

        choices = []
        role = self.get_chat_request_role(request)
        for output in final_res.outputs:
            choice_data = ChatCompletionResponseChoice(
                index=output.index,
                message=ChatMessage(role=role, content=output.text),
                finish_reason=output.finish_reason,
            )
            choices.append(choice_data)

        if request.echo:
            last_msg_content = ""
            if (request.messages
                    and request.messages[-1].get("content")
                    and request.messages[-1].get("role") == role):
                last_msg_content = request.messages[-1]["content"]
            for choice in choices:
                choice.message.content = (last_msg_content +
                                          (choice.message.content or ""))

        num_prompt_tokens = len(final_res.prompt_token_ids)
        num_generated_tokens = sum(
            len(output.token_ids) for output in final_res.outputs)
        usage = UsageInfo(
            prompt_tokens=num_prompt_tokens,
            completion_tokens=num_generated_tokens,
            total_tokens=num_prompt_tokens + num_generated_tokens,
        )
        return ChatCompletionResponse(
            id=request_id,
            created=created_time,
            model=model_name,
            choices=choices,
            usage=usage,
        )
