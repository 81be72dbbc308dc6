"""GPT-J causal LM (reference role: vllm/model_executor/models/gpt_j.py):
interleaved (non-NeoX) partial rotary, single pre-LN with parallel
attention+MLP residual, biased lm_head."""
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


class GPTJForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.n_embd
        self.num_layers = config.n_layer
        self.num_heads = config.n_head
        self.head_dim = self.hidden_size // self.num_heads
        self.inner = getattr(config, "n_inner", None) or \
            4 * self.hidden_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.eps = getattr(config, "layer_norm_epsilon", 1e-5)
        self.act_fn = get_act_fn(
            getattr(config, "activation_function", "gelu_new"))
        self.rotary_dim = getattr(config, "rotary_dim", None) or \
            self.head_dim
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.rotary_dim,
            max_position=config.n_positions,
            base=10000,
            is_neox_style=False,
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
                "ln_1_w": jnp.ones((h, ), self.dtype),
                "ln_1_b": jnp.zeros((h, ), self.dtype),
                "q_proj": make(lk[0], (h, h)),
                "k_proj": make(lk[1], (h, h)),
                "v_proj": make(lk[2], (h, h)),
                "out_proj": make(lk[3], (h, h)),
                "fc_in": make(lk[4], (h, f)),
                "fc_in_b": jnp.zeros((f, ), self.dtype),
                "fc_out": make(lk[5], (f, h)),
                "fc_out_b": jnp.zeros((h, ), self.dtype),
            })
        return {
            "wte": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "ln_f_w": jnp.ones((h, ), self.dtype),
            "ln_f_b": jnp.zeros((h, ), self.dtype),
            "lm_head": make(keys[-1], (h, self.padded_vocab)),
            "lm_head_b": jnp.zeros((self.padded_vocab, ), self.dtype),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "ln_1_w": P(), "ln_1_b": P(),
            "q_proj": P(None, "model"), "k_proj": P(None, "model"),
            "v_proj": P(None, "model"), "out_proj": P("model", None),
            "fc_in": P(None, "model"), "fc_in_b": P("model"),
            "fc_out": P("model", None), "fc_out_b": P(),
        }
        return {
            "wte": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "ln_f_w": P(), "ln_f_b": P(),
            "lm_head": P(None, "model"), "lm_head_b": P("model"),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["wte"], input_ids, axis=0, mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        for i in range(self.num_layers):
            lp = params["layers"][i]
            x = layer_norm(hidden, lp["ln_1_w"], lp["ln_1_b"], self.eps)
            q = dense(x, lp["q_proj"])
            k = dense(x, lp["k_proj"])
            v = dense(x, lp["v_proj"])
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, self.num_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, cache = self.attn[i](q.reshape(b, t, -1),
                                           k.reshape(b, t, -1), v,
                                           kv_caches[i], metadata)
            new_caches.append(cache)
            attn_out = dense(attn_out, lp["out_proj"])
            mlp_out = dense(self.act_fn(dense(x, lp["fc_in"],
                                              lp["fc_in_b"])),
                            lp["fc_out"], lp["fc_out_b"])
            hidden = hidden + attn_out + mlp_out
        hidden = layer_norm(hidden, params["ln_f_w"], params["ln_f_b"],
                            self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["lm_head"],
                         preferred_element_type=jnp.float32)
        logits = logits + params["lm_head_b"].astype(logits.dtype)
        return logits[..., :self.vocab_size]

    _MAP = {
        "ln_1.weight": ("ln_1_w", False),
        "ln_1.bias": ("ln_1_b", False),
        "attn.q_proj.weight": ("q_proj", True),
        "attn.k_proj.weight": ("k_proj", True),
        "attn.v_proj.weight": ("v_proj", True),
        "attn.out_proj.weight": ("out_proj", True),
        "mlp.fc_in.weight": ("fc_in", True),
        "mlp.fc_in.bias": ("fc_in_b", False),
        "mlp.fc_out.weight": ("fc_out", True),
        "mlp.fc_out.bias": ("fc_out_b", False),
    }

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        for name, w in weights:
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if ".attn.bias" in name or ".attn.masked_bias" in name:
                continue
            if name == "wte.weight":
                w = np.asarray(w, dtype=np.float32)
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w, ((0, self.padded_vocab - w.shape[0]),
                                   (0, 0)))
                params["wte"] = jnp.asarray(w, dtype=self.dtype)
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
            elif name == "ln_f.weight":
                params["ln_f_w"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "ln_f.bias":
                params["ln_f_b"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("h."):
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
