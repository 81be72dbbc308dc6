"""Offline batched-generation API.

Role parity with the reference's ``vllm/entrypoints/llm.py`` (LLM,
LLM.generate): a synchronous convenience wrapper that queues a batch of
requests into an LLMEngine and drains the step loop to completion.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

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

# One (prompt text | None, prompt token ids | None) pair per request.
_PromptPair = Tuple[Optional[str], Optional[List[int]]]


class LLM:
    """An LLM for offline batched generation over a TPU mesh."""

    def __init__(self, model: str, tokenizer: Optional[str] = None,
                 tokenizer_mode: str = "auto",
                 trust_remote_code: bool = False,
                 tensor_parallel_size: int = 1,
                 sep_prompt_token: bool = False, dtype: str = "auto",
                 quantization: Optional[str] = None,
                 revision: Optional[str] = None,
                 tokenizer_revision: Optional[str] = None, seed: int = 0,
                 gpu_memory_utilization: float = 0.9,
                 swap_space: float = 4.0, enforce_eager: bool = False,
                 max_context_len_to_capture: int = 8192,
                 disable_custom_all_reduce: bool = True, **kwargs) -> None:
        # Every named parameter above is an EngineArgs field; forward the
        # lot without spelling each one twice.
        spec = {k: v for k, v in locals().items()
                if k not in ("self", "kwargs")}
        kwargs.setdefault("disable_log_stats", True)
        self.llm_engine = LLMEngine.from_engine_args(
            EngineArgs(**spec, **kwargs))
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
        """Queue the whole batch, then run the engine until it drains.
        Outputs come back in submission order."""
        batch = self._pair_prompts(prompts, prompt_token_ids)
        params = self._per_request_params(sampling_params, len(batch))
        for (text, token_ids), sp in zip(batch, params):
            request_id = str(next(self.request_counter))
            self.llm_engine.add_request(request_id, text, sp, token_ids,
                                        lora_request=lora_request)
        return self._drain(use_tqdm)

    @staticmethod
    def _pair_prompts(prompts, prompt_token_ids) -> List[_PromptPair]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError(
                "Either prompts or prompt_token_ids must be provided.")
        if isinstance(prompts, str):
            prompts = [prompts]
        if (prompts is not None and prompt_token_ids is not None
                and len(prompts) != len(prompt_token_ids)):
            raise ValueError("The lengths of prompts and prompt_token_ids "
                             "must be the same.")
        n = len(prompts) if prompts is not None else len(prompt_token_ids)
        return [(prompts[i] if prompts is not None else None,
                 prompt_token_ids[i] if prompt_token_ids is not None
                 else None) for i in range(n)]

    @staticmethod
    def _per_request_params(sampling_params,
                            n: int) -> Sequence[SamplingParams]:
        if sampling_params is None:
            return [SamplingParams()] * n
        if isinstance(sampling_params, list):
            if len(sampling_params) != n:
                raise ValueError("The lengths of prompts and "
                                 "sampling_params must be the same.")
            return sampling_params
        return [sampling_params] * n

    def _drain(self, use_tqdm: bool) -> List[RequestOutput]:
        progress = None
        if use_tqdm and _HAS_TQDM:
            progress = tqdm(
                total=self.llm_engine.get_num_unfinished_requests(),
                desc="Processed prompts")
        done: List[RequestOutput] = []
        while self.llm_engine.has_unfinished_requests():
            for out in self.llm_engine.step():
                if out.finished:
                    done.append(out)
                    if progress is not None:
                        progress.update(1)
        if progress is not None:
            progress.close()
        # Requests finish out of order; hand back submission order.
        done.sort(key=lambda out: int(out.request_id))
        return done
