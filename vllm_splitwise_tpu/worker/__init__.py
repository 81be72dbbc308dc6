from vllm_splitwise_tpu.worker.worker import Worker

__all__ = ["Worker"]
