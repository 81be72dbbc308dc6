"""Qwen-1 causal LM (reference role: vllm/model_executor/models/qwen.py,
``QWenLMHeadModel``): Llama math with a fused-with-bias ``c_attn`` QKV
projection, SwiGLU MLP stored as (w2=gate, w1=up), and GPT-style
``transformer.h.N`` checkpoint naming.  The QWenConfig field names
(layer_norm_epsilon, rotary_emb_base, seq_length, intermediate_size =
2x the real FFN width) are normalized here so the Llama body serves."""
from __future__ import annotations

from types import SimpleNamespace
from typing import Any, Dict, Iterable, Tuple

import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.models.llama import LlamaForCausalLM


def _normalize_config(config) -> SimpleNamespace:
    return SimpleNamespace(
        vocab_size=config.vocab_size,
        hidden_size=config.hidden_size,
        num_hidden_layers=config.num_hidden_layers,
        num_attention_heads=config.num_attention_heads,
        num_key_value_heads=config.num_attention_heads,   # MHA
        intermediate_size=config.intermediate_size // 2,
        rms_norm_eps=getattr(config, "layer_norm_epsilon", 1e-6),
        rope_theta=getattr(config, "rotary_emb_base", 10000.0),
        max_position_embeddings=getattr(config, "seq_length", 8192),
        rope_scaling=None,
        hidden_act="silu",
        tie_word_embeddings=False,
        head_dim=None,
        sliding_window=None,
    )


class QWenLMHeadModel(LlamaForCausalLM):
    qkv_bias = True

    def __init__(self, config, dtype=jnp.bfloat16, **kw) -> None:
        super().__init__(_normalize_config(config), dtype=dtype, **kw)

    def load_weights(
        self,
        weights: Iterable[Tuple[str, np.ndarray]],
    ) -> Dict[str, Any]:
        """Rename transformer.h.* tensors (splitting the fused c_attn)
        into the Llama layout, then defer to the Llama loader."""
        h = self.hidden_size

        def rename():
            for name, w in weights:
                if name.startswith("transformer."):
                    name = name[len("transformer."):]
                if name == "wte.weight":
                    yield "embed_tokens.weight", w
                elif name == "ln_f.weight":
                    yield "norm.weight", w
                elif name == "lm_head.weight":
                    yield "lm_head.weight", w
                elif name.startswith("h."):
                    _, idx, rest = name.split(".", 2)
                    pre = f"layers.{idx}."
                    if rest == "ln_1.weight":
                        yield pre + "input_layernorm.weight", w
                    elif rest == "ln_2.weight":
                        yield pre + "post_attention_layernorm.weight", w
                    elif rest in ("attn.c_attn.weight", "attn.c_attn.bias"):
                        kind = "weight" if rest.endswith("weight") else \
                            "bias"
                        arr = np.asarray(w, dtype=np.float32)
                        q, k, v = arr[:h], arr[h:2 * h], arr[2 * h:]
                        yield pre + f"self_attn.q_proj.{kind}", q
                        yield pre + f"self_attn.k_proj.{kind}", k
                        yield pre + f"self_attn.v_proj.{kind}", v
                    elif rest == "attn.c_proj.weight":
                        yield pre + "self_attn.o_proj.weight", w
                    elif rest == "mlp.w2.weight":
                        yield pre + "mlp.gate_proj.weight", w
                    elif rest == "mlp.w1.weight":
                        yield pre + "mlp.up_proj.weight", w
                    elif rest == "mlp.c_proj.weight":
                        yield pre + "mlp.down_proj.weight", w

        return super().load_weights(rename())
