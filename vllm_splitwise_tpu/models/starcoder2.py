"""Starcoder2 causal LM (reference role:
vllm/model_executor/models/starcoder2.py): GQA + RoPE, LayerNorm with
bias, biased projections, GeLU-tanh MLP (c_fc/c_proj), optional sliding
window, tied embeddings by default."""
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


class Starcoder2ForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16,
                 sliding_window=None) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_hidden_layers
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = getattr(config, "num_key_value_heads",
                                    self.num_heads)
        self.head_dim = self.hidden_size // self.num_heads
        self.inner = config.intermediate_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.eps = getattr(config, "norm_epsilon", 1e-5)
        self.tie = getattr(config, "tie_word_embeddings", True)
        self.use_bias = getattr(config, "use_bias", True)
        self.act_fn = get_act_fn(
            getattr(config, "hidden_act", "gelu_pytorch_tanh"))
        self.sliding_window = sliding_window if sliding_window is not None \
            else getattr(config, "sliding_window", None)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.head_dim,
            max_position=config.max_position_embeddings,
            base=getattr(config, "rope_theta", 10000),
            is_neox_style=True,
        )
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads, self.sliding_window)
            for _ in range(self.num_layers)
        ]

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f = self.hidden_size, self.inner
        nh, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim

        def make(key, shape):
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    0.02).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 6)
            layers.append({
                "ln_1_w": jnp.ones((h, ), self.dtype),
                "ln_1_b": jnp.zeros((h, ), self.dtype),
                "q_proj": make(lk[0], (h, nh * hd)),
                "q_bias": jnp.zeros((nh * hd, ), self.dtype),
                "k_proj": make(lk[1], (h, nkv * hd)),
                "k_bias": jnp.zeros((nkv * hd, ), self.dtype),
                "v_proj": make(lk[2], (h, nkv * hd)),
                "v_bias": jnp.zeros((nkv * hd, ), self.dtype),
                "o_proj": make(lk[3], (nh * hd, h)),
                "o_bias": jnp.zeros((h, ), self.dtype),
                "ln_2_w": jnp.ones((h, ), self.dtype),
                "ln_2_b": jnp.zeros((h, ), self.dtype),
                "c_fc": make(lk[4], (h, f)),
                "c_fc_b": jnp.zeros((f, ), self.dtype),
                "c_proj": make(lk[5], (f, h)),
                "c_proj_b": jnp.zeros((h, ), self.dtype),
            })
        params = {
            "embed_tokens": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "norm_w": jnp.ones((h, ), self.dtype),
            "norm_b": jnp.zeros((h, ), self.dtype),
        }
        if not self.tie:
            params["lm_head"] = make(keys[-1], (h, self.padded_vocab))
        return params

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "ln_1_w": P(), "ln_1_b": P(),
            "q_proj": P(None, "model"), "q_bias": P("model"),
            "k_proj": P(None, "model"), "k_bias": P("model"),
            "v_proj": P(None, "model"), "v_bias": P("model"),
            "o_proj": P("model", None), "o_bias": P(),
            "ln_2_w": P(), "ln_2_b": P(),
            "c_fc": P(None, "model"), "c_fc_b": P("model"),
            "c_proj": P("model", None), "c_proj_b": P(),
        }
        specs = {
            "embed_tokens": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "norm_w": P(), "norm_b": P(),
        }
        if not self.tie:
            specs["lm_head"] = P(None, "model")
        return specs

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["embed_tokens"], input_ids, axis=0,
                          mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = layer_norm(hidden, lp["ln_1_w"], lp["ln_1_b"], self.eps)
            q = dense(x, lp["q_proj"], lp["q_bias"])
            k = dense(x, lp["k_proj"], lp["k_bias"])
            v = dense(x, lp["v_proj"], lp["v_bias"])
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, self.num_kv_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, cache = self.attn[i](q.reshape(b, t, -1),
                                           k.reshape(b, t, -1), v,
                                           kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["o_proj"], lp["o_bias"])
            residual = hidden
            x = layer_norm(hidden, lp["ln_2_w"], lp["ln_2_b"], self.eps)
            hidden = residual + dense(
                self.act_fn(dense(x, lp["c_fc"], lp["c_fc_b"])),
                lp["c_proj"], lp["c_proj_b"])
        hidden = layer_norm(hidden, params["norm_w"], params["norm_b"],
                            self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        head = params["embed_tokens"].T if self.tie else params["lm_head"]
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    _MAP = {
        "input_layernorm.weight": ("ln_1_w", False),
        "input_layernorm.bias": ("ln_1_b", False),
        "self_attn.q_proj.weight": ("q_proj", True),
        "self_attn.q_proj.bias": ("q_bias", False),
        "self_attn.k_proj.weight": ("k_proj", True),
        "self_attn.k_proj.bias": ("k_bias", False),
        "self_attn.v_proj.weight": ("v_proj", True),
        "self_attn.v_proj.bias": ("v_bias", False),
        "self_attn.o_proj.weight": ("o_proj", True),
        "self_attn.o_proj.bias": ("o_bias", False),
        "post_attention_layernorm.weight": ("ln_2_w", False),
        "post_attention_layernorm.bias": ("ln_2_b", False),
        "mlp.c_fc.weight": ("c_fc", True),
        "mlp.c_fc.bias": ("c_fc_b", False),
        "mlp.c_proj.weight": ("c_proj", True),
        "mlp.c_proj.bias": ("c_proj_b", False),
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
                if not self.tie:
                    w = np.asarray(w, dtype=np.float32).T
                    if w.shape[1] < self.padded_vocab:
                        w = np.pad(w, ((0, 0), (0, self.padded_vocab -
                                                w.shape[1])))
                    params["lm_head"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "norm.weight":
                params["norm_w"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "norm.bias":
                params["norm_b"] = jnp.asarray(w, dtype=self.dtype)
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
