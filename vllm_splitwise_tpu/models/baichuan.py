"""Baichuan(-2) causal LM (reference role:
vllm/model_executor/models/baichuan.py): fused W_pack QKV (straight
concat), RMSNorm + SwiGLU; 7B uses RoPE (`BaiChuanForCausalLM`), 13B uses
ALiBi (`BaichuanForCausalLM`) — same split the reference keys off the
architecture string."""
from __future__ import annotations

import math
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.attention import (Attention, KVCache,
                                                 get_alibi_slopes)
from vllm_splitwise_tpu.layers.layernorm import rms_norm
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class BaseBaichuanForCausalLM:

    position_embedding: str = "ROPE"

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_hidden_layers
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = self.num_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.inner = config.intermediate_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.rms_eps = getattr(config, "rms_norm_eps", 1e-6)

        self.rope = None
        slopes = None
        if self.position_embedding == "ROPE":
            self.rope = get_rope(
                self.head_dim,
                rotary_dim=self.head_dim,
                max_position=getattr(config, "max_position_embeddings",
                                     4096),
                base=getattr(config, "rope_theta", 10000),
                is_neox_style=True,
            )
        else:
            slopes = get_alibi_slopes(self.num_heads)
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads, alibi_slopes=slopes)
            for _ in range(self.num_layers)
        ]

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f = self.hidden_size, self.inner

        def make(key, shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    (1.0 / np.sqrt(shape[0]))).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 5)
            layers.append({
                "input_layernorm": jnp.ones((h, ), self.dtype),
                "W_pack": make(lk[0], (h, 3 * h)),
                "o_proj": make(lk[1], (h, h)),
                "post_attention_layernorm": jnp.ones((h, ), self.dtype),
                "gate_proj": make(lk[2], (h, f)),
                "up_proj": make(lk[3], (h, f)),
                "down_proj": make(lk[4], (f, h)),
            })
        return {
            "embed_tokens": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "norm": jnp.ones((h, ), self.dtype),
            "lm_head": make(keys[-1], (h, self.padded_vocab)),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "input_layernorm": P(),
            "W_pack": P(),
            "o_proj": P("model", None),
            "post_attention_layernorm": P(),
            "gate_proj": P(None, "model"),
            "up_proj": P(None, "model"),
            "down_proj": P("model", None),
        }
        return {
            "embed_tokens": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "norm": P(),
            "lm_head": P(None, "model"),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["embed_tokens"], input_ids, axis=0,
                          mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        h = self.hidden_size
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = rms_norm(hidden, lp["input_layernorm"], self.rms_eps)
            qkv = dense(x, lp["W_pack"])
            q, k, v = qkv[..., :h], qkv[..., h:2 * h], qkv[..., 2 * h:]
            if self.rope is not None:
                q = q.reshape(b, t, self.num_heads, self.head_dim)
                k = k.reshape(b, t, self.num_kv_heads, self.head_dim)
                q, k = self.rope(positions, q, k)
                q = q.reshape(b, t, -1)
                k = k.reshape(b, t, -1)
            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["o_proj"])
            residual = hidden
            x = rms_norm(hidden, lp["post_attention_layernorm"],
                         self.rms_eps)
            hidden = residual + dense(
                jax.nn.silu(dense(x, lp["gate_proj"])) *
                dense(x, lp["up_proj"]), lp["down_proj"])
        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["lm_head"],
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    _MAP = {
        "input_layernorm.weight": "input_layernorm",
        "self_attn.W_pack.weight": "W_pack",
        "self_attn.o_proj.weight": "o_proj",
        "post_attention_layernorm.weight": "post_attention_layernorm",
        "mlp.gate_proj.weight": "gate_proj",
        "mlp.up_proj.weight": "up_proj",
        "mlp.down_proj.weight": "down_proj",
    }

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        for name, w in weights:
            if name.startswith("model."):
                name = name[len("model."):]
            if "rotary_emb" in name:
                continue
            if name == "embed_tokens.weight":
                w = np.asarray(w, dtype=np.float32)
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w, ((0, self.padded_vocab - w.shape[0]),
                                   (0, 0)))
                params["embed_tokens"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "lm_head.weight":
                w = np.asarray(w, dtype=np.float32)
                # Baichuan-2 normalizes the output head at load time
                # (reference models/baichuan.py NormHead handling).
                norms = np.linalg.norm(w, axis=1, keepdims=True)
                if getattr(self.config, "vocab_size", 0) == 125696:
                    w = w / np.maximum(norms, 1e-7)
                w = w.T
                if w.shape[1] < self.padded_vocab:
                    w = np.pad(w, ((0, 0),
                                   (0, self.padded_vocab - w.shape[1])))
                params["lm_head"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "norm.weight":
                params["norm"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".", 2)
                li = int(parts[1])
                sub = parts[2]
                if sub not in self._MAP:
                    continue
                our = self._MAP[sub]
                if isinstance(w, dict):
                    layers[li][our] = {k: jnp.asarray(v)
                                       for k, v in w.items()}
                    continue
                layers[li][our] = jnp.asarray(
                    np.asarray(w, dtype=np.float32).T, dtype=self.dtype)
        return params


class BaichuanForCausalLM(BaseBaichuanForCausalLM):
    """baichuan-13b (ALiBi)."""
    position_embedding = "ALIBI"


class BaiChuanForCausalLM(BaseBaichuanForCausalLM):
    """baichuan-7b (RoPE)."""
    position_embedding = "ROPE"
