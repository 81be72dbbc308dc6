"""DeciLM causal LM (reference role:
vllm/model_executor/models/decilm.py): Llama with VARIABLE grouped-query
attention — each layer has its own KV head count
(config.num_key_value_heads_per_layer).  The KV cache is allocated at the
max head count; narrower layers use a prefix of the head dimension.
"""
from __future__ import annotations

import jax.numpy as jnp

from vllm_splitwise_tpu.layers.attention import Attention
from vllm_splitwise_tpu.models.llama import LlamaForCausalLM


class DeciLMForCausalLM(LlamaForCausalLM):

    def __init__(self, config, dtype=jnp.bfloat16, **kwargs) -> None:
        per_layer = list(
            getattr(config, "num_key_value_heads_per_layer",
                    [getattr(config, "num_key_value_heads",
                             config.num_attention_heads)] *
                    config.num_hidden_layers))
        config.num_key_value_heads = max(per_layer)
        super().__init__(config, dtype=dtype, **kwargs)
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale, per_layer[i],
                      self.sliding_window)
            for i in range(self.num_layers)
        ]
