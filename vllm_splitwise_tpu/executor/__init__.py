from vllm_splitwise_tpu.executor.executor_base import ExecutorBase
from vllm_splitwise_tpu.executor.tpu_executor import TPUExecutor

__all__ = ["ExecutorBase", "TPUExecutor"]
