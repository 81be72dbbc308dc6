"""BLOOM causal LM (reference role: vllm/model_executor/models/bloom.py):
ALiBi position bias (no RoPE), embedding layernorm, per-head-interleaved
fused QKV, GeLU MLP, tied lm_head."""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.attention import (Attention, KVCache,
                                                 get_alibi_slopes)
from vllm_splitwise_tpu.layers.layernorm import layer_norm
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class BloomForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.n_layer
        self.num_heads = config.n_head
        self.head_dim = self.hidden_size // self.num_heads
        self.inner = 4 * self.hidden_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.eps = getattr(config, "layer_norm_epsilon", 1e-5)
        slopes = get_alibi_slopes(self.num_heads)
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale, self.num_heads,
                      alibi_slopes=slopes)
            for _ in range(self.num_layers)
        ]

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f = self.hidden_size, self.inner

        def make(key, shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    0.02).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 1)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 4)
            layers.append({
                "ln_1_w": jnp.ones((h, ), self.dtype),
                "ln_1_b": jnp.zeros((h, ), self.dtype),
                "qkv": make(lk[0], (h, 3 * h)),
                "qkv_b": jnp.zeros((3 * h, ), self.dtype),
                "dense": make(lk[1], (h, h)),
                "dense_b": jnp.zeros((h, ), self.dtype),
                "ln_2_w": jnp.ones((h, ), self.dtype),
                "ln_2_b": jnp.zeros((h, ), self.dtype),
                "fc_in": make(lk[2], (h, f)),
                "fc_in_b": jnp.zeros((f, ), self.dtype),
                "fc_out": make(lk[3], (f, h)),
                "fc_out_b": jnp.zeros((h, ), self.dtype),
            })
        return {
            "word_embeddings": make(keys[-1], (self.padded_vocab, h)),
            "emb_ln_w": jnp.ones((h, ), self.dtype),
            "emb_ln_b": jnp.zeros((h, ), self.dtype),
            "layers": layers,
            "ln_f_w": jnp.ones((h, ), self.dtype),
            "ln_f_b": jnp.zeros((h, ), self.dtype),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "ln_1_w": P(), "ln_1_b": P(),
            "qkv": P(None, "model"), "qkv_b": P("model"),
            "dense": P("model", None), "dense_b": P(),
            "ln_2_w": P(), "ln_2_b": P(),
            "fc_in": P(None, "model"), "fc_in_b": P("model"),
            "fc_out": P("model", None), "fc_out_b": P(),
        }
        return {
            "word_embeddings": P("model", None),
            "emb_ln_w": P(), "emb_ln_b": P(),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "ln_f_w": P(), "ln_f_b": P(),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["word_embeddings"], input_ids, axis=0,
                          mode="clip")
        hidden = layer_norm(hidden, params["emb_ln_w"], params["emb_ln_b"],
                            self.eps)
        new_caches: List[KVCache] = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = layer_norm(hidden, lp["ln_1_w"], lp["ln_1_b"], self.eps)
            qkv = dense(x, lp["qkv"], lp["qkv_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["dense"], lp["dense_b"])
            residual = hidden
            x = layer_norm(hidden, lp["ln_2_w"], lp["ln_2_b"], self.eps)
            x = jax.nn.gelu(dense(x, lp["fc_in"], lp["fc_in_b"]),
                            approximate=True)
            hidden = residual + dense(x, lp["fc_out"], lp["fc_out_b"])
        hidden = layer_norm(hidden, params["ln_f_w"], params["ln_f_b"],
                            self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["word_embeddings"].T,
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def _split_qkv_weight(self, w: np.ndarray) -> np.ndarray:
        h = self.hidden_size
        w = w.reshape(self.num_heads, 3, self.head_dim, h)
        return np.concatenate([w[:, j].reshape(h, h) for j in range(3)],
                              axis=0).T

    def _split_qkv_bias(self, b: np.ndarray) -> np.ndarray:
        b = b.reshape(self.num_heads, 3, self.head_dim)
        return np.concatenate([b[:, j].reshape(-1) for j in range(3)])

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        simple = {
            "input_layernorm.weight": ("ln_1_w", False),
            "input_layernorm.bias": ("ln_1_b", False),
            "self_attention.dense.weight": ("dense", True),
            "self_attention.dense.bias": ("dense_b", False),
            "post_attention_layernorm.weight": ("ln_2_w", False),
            "post_attention_layernorm.bias": ("ln_2_b", False),
            "mlp.dense_h_to_4h.weight": ("fc_in", True),
            "mlp.dense_h_to_4h.bias": ("fc_in_b", False),
            "mlp.dense_4h_to_h.weight": ("fc_out", True),
            "mlp.dense_4h_to_h.bias": ("fc_out_b", False),
        }
        for name, w in weights:
            if name == "lm_head.weight":
                continue  # tied
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if name == "word_embeddings.weight":
                w = np.asarray(w, dtype=np.float32)
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w, ((0, self.padded_vocab - w.shape[0]),
                                   (0, 0)))
                params["word_embeddings"] = jnp.asarray(w,
                                                        dtype=self.dtype)
            elif name == "word_embeddings_layernorm.weight":
                params["emb_ln_w"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "word_embeddings_layernorm.bias":
                params["emb_ln_b"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "ln_f.weight":
                params["ln_f_w"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "ln_f.bias":
                params["ln_f_b"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("h."):
                parts = name.split(".", 2)
                li = int(parts[1])
                sub = parts[2]
                if sub == "self_attention.query_key_value.weight":
                    layers[li]["qkv"] = jnp.asarray(
                        self._split_qkv_weight(np.asarray(w, np.float32)),
                        dtype=self.dtype)
                elif sub == "self_attention.query_key_value.bias":
                    layers[li]["qkv_b"] = jnp.asarray(
                        self._split_qkv_bias(np.asarray(w, np.float32)),
                        dtype=self.dtype)
                elif sub in simple:
                    our, transpose = simple[sub]
                    wv = np.asarray(w, dtype=np.float32)
                    if transpose:
                        wv = wv.T
                    layers[li][our] = jnp.asarray(wv, dtype=self.dtype)
        return params
