from vllm_splitwise_tpu.lora.request import LoRARequest

__all__ = ["LoRARequest"]
