"""Qwen2 causal LM (reference role: vllm/model_executor/models/qwen2.py):
Llama structure with attention QKV biases and optional tied embeddings."""
from __future__ import annotations

from vllm_splitwise_tpu.models.llama import LlamaForCausalLM


class Qwen2ForCausalLM(LlamaForCausalLM):
    qkv_bias = True
