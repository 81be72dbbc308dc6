"""Gemma causal LM (reference role: vllm/model_executor/models/gemma.py):
Llama structure with sqrt(hidden) embedding scaling, (1 + w) RMSNorm
weights (folded in at load time), GeLU-tanh GLU, always-tied lm_head."""
from __future__ import annotations

import math

import jax.numpy as jnp

from vllm_splitwise_tpu.models.llama import LlamaForCausalLM


class GemmaForCausalLM(LlamaForCausalLM):
    tie_word_embeddings_default = True
    norm_weight_offset = 1.0

    def __init__(self, config, dtype=jnp.bfloat16, **kwargs) -> None:
        # Gemma checkpoints name the activation inconsistently across
        # transformers versions; geglu == gelu_pytorch_tanh.
        act = (getattr(config, "hidden_activation", None)
               or getattr(config, "hidden_act", None) or "gelu_pytorch_tanh")
        if act in ("gelu", "geglu"):
            act = "gelu_pytorch_tanh"
        config.hidden_act = act
        super().__init__(config, dtype=dtype, **kwargs)
        self.embed_multiplier = math.sqrt(config.hidden_size)
