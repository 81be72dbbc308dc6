"""OPT causal LM (reference role: vllm/model_executor/models/opt.py).

The CPU-runnable end-to-end reference model (BASELINE config #1 uses
OPT-125M).  Learned absolute position embeddings (offset 2), pre-layernorm
decoder, biased projections, ReLU MLP, tied lm_head.
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.activation import get_act_fn
from vllm_splitwise_tpu.layers.attention import Attention, KVCache
from vllm_splitwise_tpu.layers.layernorm import layer_norm
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128
# OPT's learned position table is offset by 2 (HF quirk).
POSITION_OFFSET = 2


class OPTForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        if getattr(config, "word_embed_proj_dim", config.hidden_size) != \
                config.hidden_size:
            raise NotImplementedError(
                "OPT project_in/out (word_embed_proj_dim != hidden_size) "
                "is not supported yet.")
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_hidden_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.ffn_dim = config.ffn_dim
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.max_positions = config.max_position_embeddings
        self.do_layer_norm_before = getattr(config, "do_layer_norm_before",
                                            True)
        self.act_fn = get_act_fn(
            getattr(config, "activation_function", "relu"))
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale, self.num_heads)
            for _ in range(self.num_layers)
        ]

    # ---- parameters ----

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f = self.hidden_size, self.ffn_dim

        def make(key, shape):
            if len(shape) == 1:
                return jnp.zeros(shape, dtype=self.dtype)
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    0.02).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 12)
            layers.append({
                "self_attn_layer_norm_w": jnp.ones((h, ), self.dtype),
                "self_attn_layer_norm_b": jnp.zeros((h, ), self.dtype),
                "q_proj": make(lk[0], (h, h)),
                "q_bias": jnp.zeros((h, ), self.dtype),
                "k_proj": make(lk[1], (h, h)),
                "k_bias": jnp.zeros((h, ), self.dtype),
                "v_proj": make(lk[2], (h, h)),
                "v_bias": jnp.zeros((h, ), self.dtype),
                "out_proj": make(lk[3], (h, h)),
                "out_bias": jnp.zeros((h, ), self.dtype),
                "final_layer_norm_w": jnp.ones((h, ), self.dtype),
                "final_layer_norm_b": jnp.zeros((h, ), self.dtype),
                "fc1": make(lk[4], (h, f)),
                "fc1_bias": jnp.zeros((f, ), self.dtype),
                "fc2": make(lk[5], (f, h)),
                "fc2_bias": jnp.zeros((h, ), self.dtype),
            })
        return {
            "embed_tokens": make(keys[-2], (self.padded_vocab, h)),
            "embed_positions": make(keys[-1],
                                    (self.max_positions + POSITION_OFFSET, h)),
            "layers": layers,
            "final_layer_norm_w": jnp.ones((h, ), self.dtype),
            "final_layer_norm_b": jnp.zeros((h, ), self.dtype),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "self_attn_layer_norm_w": P(),
            "self_attn_layer_norm_b": P(),
            "q_proj": P(None, "model"),
            "q_bias": P("model"),
            "k_proj": P(None, "model"),
            "k_bias": P("model"),
            "v_proj": P(None, "model"),
            "v_bias": P("model"),
            "out_proj": P("model", None),
            "out_bias": P(),
            "final_layer_norm_w": P(),
            "final_layer_norm_b": P(),
            "fc1": P(None, "model"),
            "fc1_bias": P("model"),
            "fc2": P("model", None),
            "fc2_bias": P(),
        }
        return {
            "embed_tokens": P("model", None),
            "embed_positions": P(),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "final_layer_norm_w": P(),
            "final_layer_norm_b": P(),
        }

    # ---- forward ----

    def __call__(
        self,
        params: Dict[str, Any],
        input_ids: jax.Array,
        positions: jax.Array,
        kv_caches: List[KVCache],
        metadata,
    ) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["embed_tokens"], input_ids, axis=0,
                          mode="clip")
        pos_emb = jnp.take(params["embed_positions"],
                           positions + POSITION_OFFSET, axis=0, mode="clip")
        hidden = hidden + pos_emb

        new_caches: List[KVCache] = []
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = hidden
            if self.do_layer_norm_before:
                x = layer_norm(x, lp["self_attn_layer_norm_w"],
                               lp["self_attn_layer_norm_b"])
            q = jnp.dot(x, lp["q_proj"]) + lp["q_bias"]
            k = jnp.dot(x, lp["k_proj"]) + lp["k_bias"]
            v = jnp.dot(x, lp["v_proj"]) + lp["v_bias"]
            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + jnp.dot(attn_out,
                                        lp["out_proj"]) + lp["out_bias"]
            if not self.do_layer_norm_before:
                hidden = layer_norm(hidden, lp["self_attn_layer_norm_w"],
                                    lp["self_attn_layer_norm_b"])

            residual = hidden
            x = hidden
            if self.do_layer_norm_before:
                x = layer_norm(x, lp["final_layer_norm_w"],
                               lp["final_layer_norm_b"])
            x = self.act_fn(jnp.dot(x, lp["fc1"]) + lp["fc1_bias"])
            hidden = residual + jnp.dot(x, lp["fc2"]) + lp["fc2_bias"]
            if not self.do_layer_norm_before:
                hidden = layer_norm(hidden, lp["final_layer_norm_w"],
                                    lp["final_layer_norm_b"])

        hidden = layer_norm(hidden, params["final_layer_norm_w"],
                            params["final_layer_norm_b"])
        return hidden, new_caches

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array) -> jax.Array:
        logits = jnp.dot(hidden, params["embed_tokens"].T,
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    # ---- HF loading ----

    _LAYER_MAP = {
        "self_attn.q_proj.weight": ("q_proj", True),
        "self_attn.q_proj.bias": ("q_bias", False),
        "self_attn.k_proj.weight": ("k_proj", True),
        "self_attn.k_proj.bias": ("k_bias", False),
        "self_attn.v_proj.weight": ("v_proj", True),
        "self_attn.v_proj.bias": ("v_bias", False),
        "self_attn.out_proj.weight": ("out_proj", True),
        "self_attn.out_proj.bias": ("out_bias", False),
        "self_attn_layer_norm.weight": ("self_attn_layer_norm_w", False),
        "self_attn_layer_norm.bias": ("self_attn_layer_norm_b", False),
        "fc1.weight": ("fc1", True),
        "fc1.bias": ("fc1_bias", False),
        "fc2.weight": ("fc2", True),
        "fc2.bias": ("fc2_bias", False),
        "final_layer_norm.weight": ("final_layer_norm_w", False),
        "final_layer_norm.bias": ("final_layer_norm_b", False),
    }

    def load_weights(
        self,
        weights: Iterable[Tuple[str, np.ndarray]],
    ) -> Dict[str, Any]:
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}

        for name, w in weights:
            for prefix in ("model.decoder.", "decoder."):
                if name.startswith(prefix):
                    name = name[len(prefix):]
                    break
            if name.startswith("lm_head"):
                continue  # tied to embed_tokens
            w = np.asarray(w, dtype=np.float32)
            if name == "embed_tokens.weight":
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w,
                               ((0, self.padded_vocab - w.shape[0]), (0, 0)))
                params["embed_tokens"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "embed_positions.weight":
                params["embed_positions"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "final_layer_norm.weight":
                params["final_layer_norm_w"] = jnp.asarray(w, self.dtype)
            elif name == "final_layer_norm.bias":
                params["final_layer_norm_b"] = jnp.asarray(w, self.dtype)
            elif name.startswith("layers."):
                _, idx, sub = name.split(".", 2)
                if sub not in self._LAYER_MAP:
                    continue
                our, transpose = self._LAYER_MAP[sub]
                if transpose:
                    w = w.T
                layers[int(idx)][our] = jnp.asarray(w, dtype=self.dtype)
        return params
