"""Falcon causal LM (reference role: vllm/model_executor/models/falcon.py).

Covers the three Falcon generations: rw-1b (sequential residual, MHA),
7b (parallel attn, multi-query), 40b/180b (new_decoder_architecture:
grouped KV, separate ln_attn/ln_mlp).  RoPE by default; ALiBi when
``config.alibi``.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.attention import (Attention, KVCache,
                                                 get_alibi_slopes)
from vllm_splitwise_tpu.layers.layernorm import layer_norm
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class FalconForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_hidden_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.new_arch = getattr(config, "new_decoder_architecture", False)
        if self.new_arch:
            self.num_kv_heads = config.num_kv_heads
        elif getattr(config, "multi_query", True):
            self.num_kv_heads = 1
        else:
            self.num_kv_heads = self.num_heads
        self.parallel_attn = getattr(config, "parallel_attn", True)
        self.inner = getattr(config, "ffn_hidden_size", None) or \
            4 * self.hidden_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.eps = getattr(config, "layer_norm_epsilon", 1e-5)
        self.use_alibi = bool(getattr(config, "alibi", False))
        self.bias = bool(getattr(config, "bias", False))

        self.rope = None
        slopes = None
        if self.use_alibi:
            # HF Falcon scales ALiBi slopes by 1/sqrt(head_dim) on top of
            # the shared schedule (modeling_falcon builds them against
            # pre-scaled scores).
            slopes = get_alibi_slopes(self.num_heads) * \
                (self.head_dim**-0.5)
        else:
            self.rope = get_rope(
                self.head_dim,
                rotary_dim=self.head_dim,
                max_position=getattr(config, "max_position_embeddings",
                                     2048),
                base=getattr(config, "rope_theta", 10000),
                is_neox_style=True,
            )
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads, alibi_slopes=slopes)
            for _ in range(self.num_layers)
        ]

    @property
    def _qkv_out(self) -> int:
        return (self.num_heads + 2 * self.num_kv_heads) * self.head_dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f = self.hidden_size, self.inner

        def make(key, shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    0.02).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 1)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 4)
            layer = {
                "ln_attn_w": jnp.ones((h, ), self.dtype),
                "ln_attn_b": jnp.zeros((h, ), self.dtype),
                "qkv": make(lk[0], (h, self._qkv_out)),
                "dense": make(lk[1], (h, h)),
                "fc_in": make(lk[2], (h, f)),
                "fc_out": make(lk[3], (f, h)),
            }
            if self.new_arch or not self.parallel_attn:
                layer["ln_mlp_w"] = jnp.ones((h, ), self.dtype)
                layer["ln_mlp_b"] = jnp.zeros((h, ), self.dtype)
            if self.bias:
                layer.update({
                    "qkv_b": jnp.zeros((self._qkv_out, ), self.dtype),
                    "dense_b": jnp.zeros((h, ), self.dtype),
                    "fc_in_b": jnp.zeros((f, ), self.dtype),
                    "fc_out_b": jnp.zeros((h, ), self.dtype),
                })
            layers.append(layer)
        return {
            "word_embeddings": make(keys[-1], (self.padded_vocab, h)),
            "layers": layers,
            "ln_f_w": jnp.ones((h, ), self.dtype),
            "ln_f_b": jnp.zeros((h, ), self.dtype),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "ln_attn_w": P(), "ln_attn_b": P(),
            "qkv": P(), "dense": P(),
            "fc_in": P(None, "model"), "fc_out": P("model", None),
        }
        specs = {
            "word_embeddings": P("model", None),
            "layers": [],
            "ln_f_w": P(), "ln_f_b": P(),
        }
        for _ in range(self.num_layers):
            s = dict(layer_spec)
            if self.new_arch or not self.parallel_attn:
                s.update({"ln_mlp_w": P(), "ln_mlp_b": P()})
            if self.bias:
                s.update({"qkv_b": P(), "dense_b": P(),
                          "fc_in_b": P("model"), "fc_out_b": P()})
            specs["layers"].append(s)
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["word_embeddings"], input_ids, axis=0,
                          mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        qd = self.num_heads * self.head_dim
        kvd = self.num_kv_heads * self.head_dim
        for i in range(self.num_layers):
            lp = params["layers"][i]
            x_attn = layer_norm(hidden, lp["ln_attn_w"], lp["ln_attn_b"],
                                self.eps)
            qkv = dense(x_attn, lp["qkv"], lp.get("qkv_b"))
            q = qkv[..., :qd]
            k = qkv[..., qd:qd + kvd]
            v = qkv[..., qd + kvd:]
            if self.rope is not None:
                q = q.reshape(b, t, self.num_heads, self.head_dim)
                k = k.reshape(b, t, self.num_kv_heads, self.head_dim)
                q, k = self.rope(positions, q, k)
                q = q.reshape(b, t, -1)
                k = k.reshape(b, t, -1)
            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            attn_out = dense(attn_out, lp["dense"], lp.get("dense_b"))

            if self.new_arch:
                x_mlp = layer_norm(hidden, lp["ln_mlp_w"], lp["ln_mlp_b"],
                                   self.eps)
            elif self.parallel_attn:
                x_mlp = x_attn
            else:
                hidden = hidden + attn_out
                x_mlp = layer_norm(hidden, lp["ln_mlp_w"], lp["ln_mlp_b"],
                                   self.eps)
            mlp_out = dense(
                jax.nn.gelu(dense(x_mlp, lp["fc_in"], lp.get("fc_in_b")),
                            approximate=False),
                lp["fc_out"], lp.get("fc_out_b"))
            if self.new_arch or self.parallel_attn:
                hidden = hidden + attn_out + mlp_out
            else:
                hidden = hidden + mlp_out
        hidden = layer_norm(hidden, params["ln_f_w"], params["ln_f_b"],
                            self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["word_embeddings"].T,
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def _split_qkv(self, w: np.ndarray) -> np.ndarray:
        """HF groups the fused QKV per KV group: [kv, q_per_kv + 2, hd, H]
        -> straight [q; k; v] concat, transposed to [H, qkv_out]."""
        h = self.hidden_size
        group = self.num_heads // self.num_kv_heads
        if self.new_arch or self.num_kv_heads == 1:
            w = w.reshape(self.num_kv_heads, group + 2, self.head_dim, h)
            q = w[:, :group].reshape(-1, h)
            k = w[:, group:group + 1].reshape(-1, h)
            v = w[:, group + 1:].reshape(-1, h)
        else:
            # MHA falcon (rw-1b): per-head [heads, 3, hd, H] interleave.
            w = w.reshape(self.num_heads, 3, self.head_dim, h)
            q = w[:, 0].reshape(-1, h)
            k = w[:, 1].reshape(-1, h)
            v = w[:, 2].reshape(-1, h)
        return np.concatenate([q, k, v], axis=0).T

    def _split_qkv_bias(self, b: np.ndarray) -> np.ndarray:
        group = self.num_heads // self.num_kv_heads
        if self.new_arch or self.num_kv_heads == 1:
            b = b.reshape(self.num_kv_heads, group + 2, self.head_dim)
            q = b[:, :group].reshape(-1)
            k = b[:, group:group + 1].reshape(-1)
            v = b[:, group + 1:].reshape(-1)
        else:
            b = b.reshape(self.num_heads, 3, self.head_dim)
            q, k, v = (b[:, j].reshape(-1) for j in range(3))
        return np.concatenate([q, k, v])

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        simple = {
            "self_attention.dense.weight": ("dense", True),
            "self_attention.dense.bias": ("dense_b", False),
            "mlp.dense_h_to_4h.weight": ("fc_in", True),
            "mlp.dense_h_to_4h.bias": ("fc_in_b", False),
            "mlp.dense_4h_to_h.weight": ("fc_out", True),
            "mlp.dense_4h_to_h.bias": ("fc_out_b", False),
            "input_layernorm.weight": ("ln_attn_w", False),
            "input_layernorm.bias": ("ln_attn_b", False),
            "ln_attn.weight": ("ln_attn_w", False),
            "ln_attn.bias": ("ln_attn_b", False),
            "ln_mlp.weight": ("ln_mlp_w", False),
            "ln_mlp.bias": ("ln_mlp_b", False),
            "post_attention_layernorm.weight": ("ln_mlp_w", False),
            "post_attention_layernorm.bias": ("ln_mlp_b", False),
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
                        self._split_qkv(np.asarray(w, np.float32)),
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
