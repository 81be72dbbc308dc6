"""Common base of the OpenAI-compatible endpoints.

Role parity with the reference's ``vllm/entrypoints/openai/serving_engine.py``:
served-model / LoRA-adapter name resolution, prompt validation against the
model context, and conversion of internal logprob dicts into the OpenAI
wire shape.  Endpoint classes (completions, chat) subclass this.
"""
from __future__ import annotations

from dataclasses import dataclass
from http import HTTPStatus
from typing import Dict, Iterator, List, Optional, Union

from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
from vllm_splitwise_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, ErrorResponse, LogProbs,
    ModelCard, ModelList, ModelPermission)
from vllm_splitwise_tpu.logger import init_logger
from vllm_splitwise_tpu.sequence import Logprob

logger = init_logger(__name__)

AnyRequest = Union[ChatCompletionRequest, CompletionRequest]


@dataclass
class LoRA:
    name: str
    local_path: str


class OpenAIServing:

    def __init__(self, engine: AsyncLLMEngine, served_model: str,
                 lora_modules: Optional[List[LoRA]] = None):
        self.engine = engine
        self.served_model = served_model
        self.lora_requests = self._load_lora_adapters(lora_modules)
        # Filled by post_init once the engine is up.
        self.max_model_len = 0
        self.tokenizer = None

    @staticmethod
    def _load_lora_adapters(modules: Optional[List[LoRA]]):
        if not modules:
            return []
        from vllm_splitwise_tpu.lora.request import LoRARequest
        return [
            LoRARequest(lora_name=m.name,
                        lora_int_id=idx,
                        lora_local_path=m.local_path)
            for idx, m in enumerate(modules, start=1)
        ]

    async def post_init(self):
        model_config = await self.engine.get_model_config()
        self.max_model_len = model_config.max_model_len
        self.tokenizer = await self.engine.get_tokenizer()

    # ---- model registry ------------------------------------------------

    def _served_names(self) -> Iterator[str]:
        yield self.served_model
        for lora in self.lora_requests:
            yield lora.lora_name

    async def show_available_models(self) -> ModelList:
        return ModelList(data=[
            ModelCard(id=name,
                      root=self.served_model,
                      permission=[ModelPermission()])
            for name in self._served_names()
        ])

    async def _check_model(self,
                           request: AnyRequest) -> Optional[ErrorResponse]:
        if request.model in self._served_names():
            return None
        return self.create_error_response(
            message=f"The model `{request.model}` does not exist.",
            err_type="NotFoundError",
            status_code=HTTPStatus.NOT_FOUND)

    def _maybe_get_lora(self, request: AnyRequest):
        """None for the base model, the matching LoRARequest otherwise."""
        if request.model == self.served_model:
            return None
        for lora in self.lora_requests:
            if request.model == lora.lora_name:
                return lora
        raise ValueError(f"The model `{request.model}` does not exist.")

    # ---- responses -------------------------------------------------------

    def create_error_response(
            self,
            message: str,
            err_type: str = "BadRequestError",
            status_code: HTTPStatus = HTTPStatus.BAD_REQUEST
    ) -> ErrorResponse:
        return ErrorResponse(message=message,
                             type=err_type,
                             code=status_code.value)

    def _create_logprobs(self, token_ids: List[int],
                         top_logprobs: Optional[List[Optional[Dict[
                             int, Logprob]]]] = None,
                         num_output_top_logprobs: Optional[int] = None,
                         initial_text_offset: int = 0) -> LogProbs:
        """Render engine logprobs in the OpenAI response shape.

        Positions with no computed logprobs (e.g. echoed prompt heads)
        emit null score entries, per OpenAI semantics.
        """
        wire = LogProbs()
        if num_output_top_logprobs:
            wire.top_logprobs = []
        offset = initial_text_offset
        for pos, token_id in enumerate(token_ids):
            step = top_logprobs[pos] if top_logprobs else None
            if step is None:
                piece = self.tokenizer.decode(token_id)
                score = None
                alternatives = None
            else:
                chosen = step[token_id]
                piece = (chosen.decoded_token
                         or self.tokenizer.decode(token_id))
                score = chosen.logprob
                alternatives = {
                    (lp.decoded_token or self.tokenizer.decode(tid)):
                    lp.logprob
                    for tid, lp in step.items()
                }
            wire.tokens.append(piece)
            wire.token_logprobs.append(score)
            if wire.top_logprobs is not None:
                wire.top_logprobs.append(alternatives)
            wire.text_offset.append(offset)
            offset += len(piece)
        return wire

    # ---- prompt validation -------------------------------------------------

    def _validate_prompt_and_tokenize(
            self,
            request: AnyRequest,
            prompt: Optional[str] = None,
            prompt_ids: Optional[List[int]] = None) -> List[int]:
        if (prompt is None) == (prompt_ids is None):
            raise ValueError(
                "Exactly one of prompt or prompt_ids should be provided.")
        input_ids = (prompt_ids if prompt_ids is not None else
                     self.tokenizer(prompt).input_ids)
        prompt_len = len(input_ids)

        if request.max_tokens is None:
            request.max_tokens = self.max_model_len - prompt_len
        if prompt_len + request.max_tokens > self.max_model_len:
            raise ValueError(
                f"This model's maximum context length is "
                f"{self.max_model_len} tokens. However, you requested "
                f"{request.max_tokens + prompt_len} tokens "
                f"({prompt_len} in the messages, "
                f"{request.max_tokens} in the completion). "
                f"Please reduce the length of the messages or completion.")
        return input_ids
