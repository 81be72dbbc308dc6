"""Phi (1/1.5/2) causal LM (reference role:
vllm/model_executor/models/phi.py): parallel attention+MLP residual from
one LN, partial rotary, biased projections and lm_head."""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.activation import get_act_fn
from vllm_splitwise_tpu.layers.attention import Attention, KVCache
from vllm_splitwise_tpu.layers.layernorm import layer_norm
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class PhiForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_hidden_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.inner = config.intermediate_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.eps = getattr(config, "layer_norm_eps", 1e-5)
        self.act_fn = get_act_fn(getattr(config, "hidden_act", "gelu_new"))
        rotary_frac = getattr(config, "partial_rotary_factor", 0.5)
        self.rotary_dim = int(self.head_dim * rotary_frac)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.rotary_dim,
            max_position=config.max_position_embeddings,
            base=getattr(config, "rope_theta", 10000),
            is_neox_style=True,
        )
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale, self.num_heads)
            for _ in range(self.num_layers)
        ]

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f = self.hidden_size, self.inner

        def make(key, shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    0.02).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 6)
            layers.append({
                "ln_w": jnp.ones((h, ), self.dtype),
                "ln_b": jnp.zeros((h, ), self.dtype),
                "q_proj": make(lk[0], (h, h)),
                "q_bias": jnp.zeros((h, ), self.dtype),
                "k_proj": make(lk[1], (h, h)),
                "k_bias": jnp.zeros((h, ), self.dtype),
                "v_proj": make(lk[2], (h, h)),
                "v_bias": jnp.zeros((h, ), self.dtype),
                "dense": make(lk[3], (h, h)),
                "dense_b": jnp.zeros((h, ), self.dtype),
                "fc1": make(lk[4], (h, f)),
                "fc1_b": jnp.zeros((f, ), self.dtype),
                "fc2": make(lk[5], (f, h)),
                "fc2_b": jnp.zeros((h, ), self.dtype),
            })
        return {
            "embed_tokens": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "final_ln_w": jnp.ones((h, ), self.dtype),
            "final_ln_b": jnp.zeros((h, ), self.dtype),
            "lm_head": make(keys[-1], (h, self.padded_vocab)),
            "lm_head_b": jnp.zeros((self.padded_vocab, ), self.dtype),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "ln_w": P(), "ln_b": P(),
            "q_proj": P(None, "model"), "q_bias": P("model"),
            "k_proj": P(None, "model"), "k_bias": P("model"),
            "v_proj": P(None, "model"), "v_bias": P("model"),
            "dense": P("model", None), "dense_b": P(),
            "fc1": P(None, "model"), "fc1_b": P("model"),
            "fc2": P("model", None), "fc2_b": P(),
        }
        return {
            "embed_tokens": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "final_ln_w": P(), "final_ln_b": P(),
            "lm_head": P(None, "model"), "lm_head_b": P("model"),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["embed_tokens"], input_ids, axis=0,
                          mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        for i in range(self.num_layers):
            lp = params["layers"][i]
            x = layer_norm(hidden, lp["ln_w"], lp["ln_b"], self.eps)
            q = dense(x, lp["q_proj"], lp["q_bias"])
            k = dense(x, lp["k_proj"], lp["k_bias"])
            v = dense(x, lp["v_proj"], lp["v_bias"])
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, self.num_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, cache = self.attn[i](q.reshape(b, t, -1),
                                           k.reshape(b, t, -1), v,
                                           kv_caches[i], metadata)
            new_caches.append(cache)
            attn_out = dense(attn_out, lp["dense"], lp["dense_b"])
            mlp_out = dense(self.act_fn(dense(x, lp["fc1"], lp["fc1_b"])),
                            lp["fc2"], lp["fc2_b"])
            hidden = hidden + attn_out + mlp_out
        hidden = layer_norm(hidden, params["final_ln_w"],
                            params["final_ln_b"], self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["lm_head"],
                         preferred_element_type=jnp.float32)
        logits = logits + params["lm_head_b"].astype(logits.dtype)
        return logits[..., :self.vocab_size]

    _MAP = {
        "input_layernorm.weight": ("ln_w", False),
        "input_layernorm.bias": ("ln_b", False),
        "self_attn.q_proj.weight": ("q_proj", True),
        "self_attn.q_proj.bias": ("q_bias", False),
        "self_attn.k_proj.weight": ("k_proj", True),
        "self_attn.k_proj.bias": ("k_bias", False),
        "self_attn.v_proj.weight": ("v_proj", True),
        "self_attn.v_proj.bias": ("v_bias", False),
        "self_attn.dense.weight": ("dense", True),
        "self_attn.dense.bias": ("dense_b", False),
        "mlp.fc1.weight": ("fc1", True),
        "mlp.fc1.bias": ("fc1_b", False),
        "mlp.fc2.weight": ("fc2", True),
        "mlp.fc2.bias": ("fc2_b", False),
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
                w = np.asarray(w, dtype=np.float32).T
                if w.shape[1] < self.padded_vocab:
                    w = np.pad(w, ((0, 0),
                                   (0, self.padded_vocab - w.shape[1])))
                params["lm_head"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "lm_head.bias":
                w = np.asarray(w, dtype=np.float32)
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w, (0, self.padded_vocab - w.shape[0]))
                params["lm_head_b"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "final_layernorm.weight":
                params["final_ln_w"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "final_layernorm.bias":
                params["final_ln_b"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("layers."):
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
