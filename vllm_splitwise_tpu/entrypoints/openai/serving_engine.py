"""Shared machinery of the OpenAI-compatible endpoints (reference role:
vllm/entrypoints/openai/serving_engine.py): model-name validation,
LoRA-adapters-as-models, logprob formatting, prompt validation."""
from __future__ import annotations

from dataclasses import dataclass
from http import HTTPStatus
from typing import Dict, List, Optional, Tuple, Union

from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_splitwise_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, ErrorResponse, LogProbs,
    ModelCard, ModelList, ModelPermission)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.sequence import Logprob

logger = init_logger(__name__)


@dataclass
class LoRA:
    name: str
    local_path: str


class OpenAIServing:

    def __init__(self,
                 engine: AsyncLLMEngine,
                 served_model: str,
                 lora_modules: Optional[List[LoRA]] = None):
        self.engine = engine
        self.served_model = served_model
        if lora_modules is None:
            self.lora_requests = []
        else:
            try:
                from vllm_splitwise_tpu.lora.request import LoRARequest
                self.lora_requests = [
                    LoRARequest(lora_name=lora.name,
                                lora_int_id=i,
                                lora_local_path=lora.local_path)
                    for i, lora in enumerate(lora_modules, start=1)
                ]
            except ImportError:
                self.lora_requests = []
        self.max_model_len = 0
        self.tokenizer = None

    async def post_init(self):
        engine_model_config = await self.engine.get_model_config()
        self.max_model_len = engine_model_config.max_model_len
        self.tokenizer = await self.engine.get_tokenizer()

    async def show_available_models(self) -> ModelList:
        model_cards = [
            ModelCard(id=self.served_model,
                      root=self.served_model,
                      permission=[ModelPermission()])
        ]
        lora_cards = [
            ModelCard(id=lora.lora_name,
                      root=self.served_model,
                      permission=[ModelPermission()])
            for lora in self.lora_requests
        ]
        model_cards.extend(lora_cards)
        return ModelList(data=model_cards)

    def _create_logprobs(
        self,
        token_ids: List[int],
        top_logprobs: Optional[List[Optional[Dict[int, Logprob]]]] = None,
        num_output_top_logprobs: Optional[int] = None,
        initial_text_offset: int = 0,
    ) -> LogProbs:
        """Convert internal logprob dicts to the OpenAI response format."""
        logprobs = LogProbs()
        last_token_len = 0
        if num_output_top_logprobs:
            logprobs.top_logprobs = []
        for i, token_id in enumerate(token_ids):
            step_top_logprobs = top_logprobs[i] if top_logprobs else None
            if step_top_logprobs is None:
                token = self.tokenizer.decode(token_id)
                logprobs.tokens.append(token)
                logprobs.token_logprobs.append(None)
                if logprobs.top_logprobs is not None:
                    logprobs.top_logprobs.append(None)
            else:
                entry = step_top_logprobs[token_id]
                token = entry.decoded_token or self.tokenizer.decode(token_id)
                logprobs.tokens.append(token)
                logprobs.token_logprobs.append(entry.logprob)
                if logprobs.top_logprobs is not None:
                    logprobs.top_logprobs.append({
                        (lp.decoded_token
                         or self.tokenizer.decode(tid)): lp.logprob
                        for tid, lp in step_top_logprobs.items()
                    })
            if len(logprobs.text_offset) == 0:
                logprobs.text_offset.append(initial_text_offset)
            else:
                logprobs.text_offset.append(logprobs.text_offset[-1] +
                                            last_token_len)
            last_token_len = len(token)
        return logprobs

    def create_error_response(
            self,
            message: str,
            err_type: str = "BadRequestError",
            status_code: HTTPStatus = HTTPStatus.BAD_REQUEST
    ) -> ErrorResponse:
        return ErrorResponse(message=message,
                             type=err_type,
                             code=status_code.value)

    async def _check_model(
            self, request: Union[CompletionRequest, ChatCompletionRequest]
    ) -> Optional[ErrorResponse]:
        if request.model == self.served_model:
            return None
        if request.model in (lora.lora_name for lora in self.lora_requests):
            return None
        return self.create_error_response(
            message=f"The model `{request.model}` does not exist.",
            err_type="NotFoundError",
            status_code=HTTPStatus.NOT_FOUND)

    def _maybe_get_lora(
            self, request: Union[CompletionRequest, ChatCompletionRequest]):
        if request.model == self.served_model:
            return None
        for lora in self.lora_requests:
            if request.model == lora.lora_name:
                return lora
        raise ValueError(f"The model `{request.model}` does not exist.")

    def _validate_prompt_and_tokenize(
            self,
            request: Union[ChatCompletionRequest, CompletionRequest],
            prompt: Optional[str] = None,
            prompt_ids: Optional[List[int]] = None) -> List[int]:
        if not (prompt or prompt_ids):
            raise ValueError("Either prompt or prompt_ids should be provided.")
        if prompt and prompt_ids:
            raise ValueError(
                "Only one of prompt or prompt_ids should be provided.")
        input_ids = prompt_ids if prompt_ids is not None else \
            self.tokenizer(prompt).input_ids
        token_num = len(input_ids)

        if request.max_tokens is None:
            request.max_tokens = self.max_model_len - token_num

        if token_num + request.max_tokens > self.max_model_len:
            raise ValueError(
                f"This model's maximum context length is "
                f"{self.max_model_len} tokens. However, you requested "
                f"{request.max_tokens + token_num} tokens "
                f"({token_num} in the messages, "
                f"{request.max_tokens} in the completion). "
                f"Please reduce the length of the messages or completion.")
        return input_ids
