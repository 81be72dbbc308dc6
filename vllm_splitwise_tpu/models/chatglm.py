"""ChatGLM2/3 causal LM (reference role:
vllm/model_executor/models/chatglm.py): GLM block — fused biased QKV
(straight concat, grouped KV), half-dim interleaved rotary, RMSNorm,
SwiGLU packed as one dense_h_to_4h, untied output_layer."""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.attention import Attention, KVCache
from vllm_splitwise_tpu.layers.layernorm import rms_norm
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope
from vllm_splitwise_tpu.ops.kv_cache import write_to_kv_cache  # noqa: F401
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class ChatGLMForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = getattr(config, "num_layers",
                                  getattr(config, "num_hidden_layers", 28))
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = (config.multi_query_group_num
                             if getattr(config, "multi_query_attention",
                                        False) else self.num_heads)
        self.head_dim = self.hidden_size // self.num_heads
        self.inner = config.ffn_hidden_size
        self.vocab_size = getattr(config, "padded_vocab_size",
                                  config.vocab_size)
        self.padded_vocab = round_up(self.vocab_size, VOCAB_ALIGN)
        self.rms_eps = getattr(config, "layernorm_epsilon", 1e-5)
        self.qkv_bias = getattr(config, "add_qkv_bias", True)
        # GLM applies rotary to HALF the head dim, interleaved pairs.
        rope_ratio = getattr(config, "rope_ratio", 1.0)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.head_dim // 2,
            max_position=getattr(config, "seq_length", 8192),
            base=10000 * rope_ratio,
            is_neox_style=False,
        )
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads)
            for _ in range(self.num_layers)
        ]

    @property
    def _qkv_out(self) -> int:
        return (self.num_heads + 2 * self.num_kv_heads) * self.head_dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f = self.hidden_size, self.inner

        def make(key, shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    (1.0 / np.sqrt(shape[0]))).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 4)
            layer = {
                "input_layernorm": jnp.ones((h, ), self.dtype),
                "qkv": make(lk[0], (h, self._qkv_out)),
                "dense": make(lk[1], (h, h)),
                "post_layernorm": jnp.ones((h, ), self.dtype),
                "h_to_4h": make(lk[2], (h, 2 * f)),
                "4h_to_h": make(lk[3], (f, h)),
            }
            if self.qkv_bias:
                layer["qkv_b"] = jnp.zeros((self._qkv_out, ), self.dtype)
            layers.append(layer)
        return {
            "word_embeddings": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "final_layernorm": jnp.ones((h, ), self.dtype),
            "output_layer": make(keys[-1], (h, self.padded_vocab)),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "input_layernorm": P(),
            "qkv": P(),
            "dense": P(),
            "post_layernorm": P(),
            "h_to_4h": P(None, "model"),
            "4h_to_h": P("model", None),
        }
        if self.qkv_bias:
            layer_spec["qkv_b"] = P()
        return {
            "word_embeddings": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "final_layernorm": P(),
            "output_layer": P(None, "model"),
        }

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
            residual = hidden
            x = rms_norm(hidden, lp["input_layernorm"], self.rms_eps)
            qkv = dense(x, lp["qkv"], lp.get("qkv_b"))
            q = qkv[..., :qd]
            k = qkv[..., qd:qd + kvd]
            v = qkv[..., qd + kvd:]
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, self.num_kv_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, cache = self.attn[i](q.reshape(b, t, -1),
                                           k.reshape(b, t, -1), v,
                                           kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["dense"])
            residual = hidden
            x = rms_norm(hidden, lp["post_layernorm"], self.rms_eps)
            up = dense(x, lp["h_to_4h"])
            gate, val = jnp.split(up, 2, axis=-1)
            hidden = residual + dense(jax.nn.silu(gate) * val,
                                      lp["4h_to_h"])
        hidden = rms_norm(hidden, params["final_layernorm"], self.rms_eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["output_layer"],
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        for name, w in weights:
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if "rotary_pos_emb" in name:
                continue
            if name == "embedding.word_embeddings.weight":
                wv = np.asarray(w, dtype=np.float32)
                if wv.shape[0] < self.padded_vocab:
                    wv = np.pad(wv, ((0, self.padded_vocab - wv.shape[0]),
                                     (0, 0)))
                params["word_embeddings"] = jnp.asarray(wv,
                                                        dtype=self.dtype)
            elif name == "output_layer.weight":
                wv = np.asarray(w, dtype=np.float32).T
                if wv.shape[1] < self.padded_vocab:
                    wv = np.pad(wv, ((0, 0), (0, self.padded_vocab -
                                              wv.shape[1])))
                params["output_layer"] = jnp.asarray(wv, dtype=self.dtype)
            elif name == "encoder.final_layernorm.weight":
                params["final_layernorm"] = jnp.asarray(w,
                                                        dtype=self.dtype)
            elif name.startswith("encoder.layers."):
                parts = name.split(".")
                li = int(parts[2])
                rest = ".".join(parts[3:])
                m = {
                    "input_layernorm.weight": ("input_layernorm", False),
                    "self_attention.query_key_value.weight": ("qkv", True),
                    "self_attention.query_key_value.bias": ("qkv_b",
                                                            False),
                    "self_attention.dense.weight": ("dense", True),
                    "post_attention_layernorm.weight": ("post_layernorm",
                                                        False),
                    "mlp.dense_h_to_4h.weight": ("h_to_4h", True),
                    "mlp.dense_4h_to_h.weight": ("4h_to_h", True),
                }
                if rest not in m:
                    continue
                our, transpose = m[rest]
                wv = np.asarray(w, dtype=np.float32)
                if transpose:
                    wv = wv.T
                layers[li][our] = jnp.asarray(wv, dtype=self.dtype)
        return params
