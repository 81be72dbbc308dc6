from vllm_splitwise_tpu.entrypoints.llm import LLM

__all__ = ["LLM"]
