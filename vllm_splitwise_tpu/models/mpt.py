"""MPT causal LM (reference role: vllm/model_executor/models/mpt.py):
ALiBi (no position embeddings), bias-free LayerNorm, straight-concat
fused Wqkv with optional grouped KV, GeLU MLP, tied lm_head."""
from __future__ import annotations

import math
from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.attention import Attention, KVCache
from vllm_splitwise_tpu.layers.layernorm import layer_norm
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


def _mpt_alibi_slopes(num_heads: int, alibi_bias_max: int = 8) -> np.ndarray:
    """MPT's schedule (modeling_mpt build_mpt_alibi_tensor): computed on
    the next power of two then subsampled."""
    next_pow2 = 2**math.ceil(math.log2(num_heads))
    base = np.arange(1, next_pow2 + 1, dtype=np.float32)
    base = base * (alibi_bias_max / next_pow2)
    slopes = 1.0 / np.power(2.0, base)
    if next_pow2 != num_heads:
        slopes = np.concatenate([slopes[1::2], slopes[::2]])[:num_heads]
    return slopes.astype(np.float32)


class MPTForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.d_model
        self.num_layers = config.n_layers
        self.num_heads = config.n_heads
        self.head_dim = self.hidden_size // self.num_heads
        attn_config = getattr(config, "attn_config", None)
        if attn_config is None:
            kv_heads = self.num_heads
        elif isinstance(attn_config, dict):
            kv_heads = attn_config.get("kv_n_heads", self.num_heads)
        else:
            kv_heads = getattr(attn_config, "kv_n_heads", self.num_heads)
        self.num_kv_heads = kv_heads
        self.inner = getattr(config, "expansion_ratio", 4) * \
            self.hidden_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.eps = 1e-5
        self.no_bias = getattr(config, "no_bias", True)
        slopes = _mpt_alibi_slopes(self.num_heads)
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
            layers.append({
                "norm_1": jnp.ones((h, ), self.dtype),
                "qkv": make(lk[0], (h, self._qkv_out)),
                "out_proj": make(lk[1], (h, h)),
                "norm_2": jnp.ones((h, ), self.dtype),
                "up_proj": make(lk[2], (h, f)),
                "down_proj": make(lk[3], (f, h)),
            })
        return {
            "wte": make(keys[-1], (self.padded_vocab, h)),
            "layers": layers,
            "norm_f": jnp.ones((h, ), self.dtype),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "norm_1": P(),
            "qkv": P(),
            "out_proj": P(),
            "norm_2": P(),
            "up_proj": P(None, "model"),
            "down_proj": P("model", None),
        }
        return {
            "wte": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "norm_f": P(),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["wte"], input_ids, axis=0, mode="clip")
        new_caches: List[KVCache] = []
        qd = self.num_heads * self.head_dim
        kvd = self.num_kv_heads * self.head_dim
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = layer_norm(hidden, lp["norm_1"], None, self.eps)
            qkv = dense(x, lp["qkv"])
            q = qkv[..., :qd]
            k = qkv[..., qd:qd + kvd]
            v = qkv[..., qd + kvd:]
            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["out_proj"])
            residual = hidden
            x = layer_norm(hidden, lp["norm_2"], None, self.eps)
            hidden = residual + dense(
                jax.nn.gelu(dense(x, lp["up_proj"]), approximate=False),
                lp["down_proj"])
        hidden = layer_norm(hidden, params["norm_f"], None, self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["wte"].T,
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    _MAP = {
        "norm_1.weight": ("norm_1", False),
        "attn.Wqkv.weight": ("qkv", True),
        "attn.out_proj.weight": ("out_proj", True),
        "norm_2.weight": ("norm_2", False),
        "ffn.up_proj.weight": ("up_proj", True),
        "ffn.down_proj.weight": ("down_proj", True),
    }

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        for name, w in weights:
            if name == "lm_head.weight":
                continue
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if name == "wte.weight":
                w = np.asarray(w, dtype=np.float32)
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w, ((0, self.padded_vocab - w.shape[0]),
                                   (0, 0)))
                params["wte"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "norm_f.weight":
                params["norm_f"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("blocks."):
                parts = name.split(".", 2)
                li = int(parts[1])
                sub = parts[2]
                if sub not in self._MAP:
                    continue
                our, transpose = self._MAP[sub]
                if isinstance(w, dict):
                    layers[li][our] = {k: jnp.asarray(v)
                                       for k, v in w.items()}
                    continue
                w = np.asarray(w, dtype=np.float32)
                if transpose:
                    w = w.T
                layers[li][our] = jnp.asarray(w, dtype=self.dtype)
        return params
