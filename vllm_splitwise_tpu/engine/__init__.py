from vllm_splitwise_tpu.engine.arg_utils import AsyncEngineArgs, EngineArgs
from vllm_splitwise_tpu.engine.llm_engine import LLMEngine

__all__ = ["EngineArgs", "AsyncEngineArgs", "LLMEngine"]
