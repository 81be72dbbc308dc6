"""Offline batched-generation API.

Role-parity with the reference's ``vllm/entrypoints/llm.py:14`` (LLM,
LLM.generate): wraps LLMEngine with request intake + a drain loop.
"""
from __future__ import annotations

from typing import List, Optional, Union

from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
from vllm_splitwise_tpu.engine.llm_engine import LLMEngine
from vllm_splitwise_tpu.outputs import RequestOutput
from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.utils import Counter

try:
    from tqdm import tqdm
    _HAS_TQDM = True
except ImportError:  # pragma: no cover
    _HAS_TQDM = False


class LLM:
    """An LLM for offline batched generation over a TPU mesh."""

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        trust_remote_code: bool = False,
        tensor_parallel_size: int = 1,
        sep_prompt_token: bool = False,
        dtype: str = "auto",
        quantization: Optional[str] = None,
        revision: Optional[str] = None,
        tokenizer_revision: Optional[str] = None,
        seed: int = 0,
        gpu_memory_utilization: float = 0.9,
        swap_space: float = 4.0,
        enforce_eager: bool = False,
        max_context_len_to_capture: int = 8192,
        disable_custom_all_reduce: bool = True,
        **kwargs,
    ) -> None:
        if "disable_log_stats" not in kwargs:
            kwargs["disable_log_stats"] = True
        engine_args = EngineArgs(
            model=model,
            tokenizer=tokenizer,
            tokenizer_mode=tokenizer_mode,
            trust_remote_code=trust_remote_code,
            tensor_parallel_size=tensor_parallel_size,
            sep_prompt_token=sep_prompt_token,
            dtype=dtype,
            quantization=quantization,
            revision=revision,
            tokenizer_revision=tokenizer_revision,
            seed=seed,
            gpu_memory_utilization=gpu_memory_utilization,
            swap_space=swap_space,
            enforce_eager=enforce_eager,
            max_context_len_to_capture=max_context_len_to_capture,
            disable_custom_all_reduce=disable_custom_all_reduce,
            **kwargs,
        )
        self.llm_engine = LLMEngine.from_engine_args(engine_args)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer.tokenizer

    def set_tokenizer(self, tokenizer) -> None:
        self.llm_engine.tokenizer.tokenizer = tokenizer

    def generate(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[SamplingParams,
                                        List[SamplingParams]]] = None,
        prompt_token_ids: Optional[List[List[int]]] = None,
        use_tqdm: bool = True,
        lora_request=None,
    ) -> List[RequestOutput]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError("Either prompts or prompt_token_ids must be "
                             "provided.")
        if isinstance(prompts, str):
            prompts = [prompts]
        if (prompts is not None and prompt_token_ids is not None
                and len(prompts) != len(prompt_token_ids)):
            raise ValueError("The lengths of prompts and prompt_token_ids "
                             "must be the same.")
        if sampling_params is None:
            sampling_params = SamplingParams()

        num_requests = len(prompts) if prompts is not None else len(
            prompt_token_ids)
        if isinstance(sampling_params, list):
            if len(sampling_params) != num_requests:
                raise ValueError("The lengths of prompts and "
                                 "sampling_params must be the same.")
            params_list = sampling_params
        else:
            params_list = [sampling_params] * num_requests

        for i in range(num_requests):
            prompt = prompts[i] if prompts is not None else None
            token_ids = None if prompt_token_ids is None else \
                prompt_token_ids[i]
            self._add_request(prompt, params_list[i], token_ids,
                              lora_request)
        return self._run_engine(use_tqdm)

    def _add_request(
        self,
        prompt: Optional[str],
        sampling_params: SamplingParams,
        prompt_token_ids: Optional[List[int]],
        lora_request=None,
    ) -> None:
        request_id = str(next(self.request_counter))
        self.llm_engine.add_request(request_id, prompt, sampling_params,
                                    prompt_token_ids,
                                    lora_request=lora_request)

    def _run_engine(self, use_tqdm: bool) -> List[RequestOutput]:
        pbar = None
        if use_tqdm and _HAS_TQDM:
            num_requests = self.llm_engine.get_num_unfinished_requests()
            pbar = tqdm(total=num_requests, desc="Processed prompts")
        outputs: List[RequestOutput] = []
        while self.llm_engine.has_unfinished_requests():
            step_outputs = self.llm_engine.step()
            for output in step_outputs:
                if output.finished:
                    outputs.append(output)
                    if pbar is not None:
                        pbar.update(1)
        if pbar is not None:
            pbar.close()
        # Restore submission order (steps complete out of order).
        outputs = sorted(outputs, key=lambda x: int(x.request_id))
        return outputs
