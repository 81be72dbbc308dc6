"""vllm_splitwise_tpu: a TPU-native continuous-batching LLM inference and
serving engine with paged KV-cache attention and Splitwise-style
prefill/decode phase disaggregation.

Built from scratch for TPU (JAX/XLA/Pallas/pjit) with the capability
surface of vLLM v0.3.3 + the Splitwise fork (reference:
melissadu-db/vllm-splitwise).
"""

__version__ = "0.1.0"

from vllm_splitwise_tpu.sampling_params import SamplingParams
from vllm_splitwise_tpu.outputs import CompletionOutput, RequestOutput

__all__ = [
    "__version__",
    "SamplingParams",
    "CompletionOutput",
    "RequestOutput",
    "LLM",
    "LLMEngine",
    "AsyncLLMEngine",
    "EngineArgs",
    "AsyncEngineArgs",
]


def __getattr__(name):
    # Lazy imports: keep `import vllm_splitwise_tpu` cheap and avoid
    # pulling JAX into pure-CPU scheduler tests.
    if name == "LLM":
        from vllm_splitwise_tpu.entrypoints.llm import LLM
        return LLM
    if name == "LLMEngine":
        from vllm_splitwise_tpu.engine.llm_engine import LLMEngine
        return LLMEngine
    if name == "AsyncLLMEngine":
        from vllm_splitwise_tpu.engine.async_llm_engine import AsyncLLMEngine
        return AsyncLLMEngine
    if name == "EngineArgs":
        from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
        return EngineArgs
    if name == "AsyncEngineArgs":
        from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs
        return AsyncEngineArgs
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
