"""GPT-NeoX causal LM (reference role:
vllm/model_executor/models/gpt_neox.py): per-head-interleaved fused QKV,
partial rotary, parallel (or sequential) residual, untied embed_out."""
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


class GPTNeoXForCausalLM:

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
        self.parallel = getattr(config, "use_parallel_residual", True)
        self.act_fn = get_act_fn(getattr(config, "hidden_act", "gelu"))
        rotary_pct = getattr(config, "rotary_pct", 1.0)
        self.rotary_dim = int(self.head_dim * rotary_pct)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.rotary_dim,
            max_position=config.max_position_embeddings,
            base=getattr(config, "rotary_emb_base", 10000),
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
            "embed_in": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "final_norm_w": jnp.ones((h, ), self.dtype),
            "final_norm_b": jnp.zeros((h, ), self.dtype),
            "embed_out": make(keys[-1], (h, self.padded_vocab)),
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
            "embed_in": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "final_norm_w": P(), "final_norm_b": P(),
            "embed_out": P(None, "model"),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["embed_in"], input_ids, axis=0,
                          mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        for i in range(self.num_layers):
            lp = params["layers"][i]
            x = layer_norm(hidden, lp["ln_1_w"], lp["ln_1_b"], self.eps)
            qkv = dense(x, lp["qkv"], lp["qkv_b"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, self.num_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, cache = self.attn[i](q.reshape(b, t, -1),
                                           k.reshape(b, t, -1), v,
                                           kv_caches[i], metadata)
            new_caches.append(cache)
            attn_out = dense(attn_out, lp["dense"], lp["dense_b"])

            if self.parallel:
                x2 = layer_norm(hidden, lp["ln_2_w"], lp["ln_2_b"],
                                self.eps)
                mlp_out = dense(
                    self.act_fn(dense(x2, lp["fc_in"], lp["fc_in_b"])),
                    lp["fc_out"], lp["fc_out_b"])
                hidden = hidden + attn_out + mlp_out
            else:
                hidden = hidden + attn_out
                x2 = layer_norm(hidden, lp["ln_2_w"], lp["ln_2_b"],
                                self.eps)
                hidden = hidden + dense(
                    self.act_fn(dense(x2, lp["fc_in"], lp["fc_in_b"])),
                    lp["fc_out"], lp["fc_out_b"])
        hidden = layer_norm(hidden, params["final_norm_w"],
                            params["final_norm_b"], self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["embed_out"],
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def _split_qkv_weight(self, w: np.ndarray) -> np.ndarray:
        """HF fuses QKV per head: [heads*3*hd, H].  Regroup to straight
        [q; k; v] concat and transpose to [H, 3H]."""
        h = self.hidden_size
        w = w.reshape(self.num_heads, 3, self.head_dim, h)
        w = np.concatenate([w[:, j].reshape(h, h) for j in range(3)],
                           axis=0)  # [3H, H]
        return w.T

    def _split_qkv_bias(self, b: np.ndarray) -> np.ndarray:
        b = b.reshape(self.num_heads, 3, self.head_dim)
        return np.concatenate([b[:, j].reshape(-1) for j in range(3)])

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        simple = {
            "input_layernorm.weight": ("ln_1_w", False),
            "input_layernorm.bias": ("ln_1_b", False),
            "attention.dense.weight": ("dense", True),
            "attention.dense.bias": ("dense_b", False),
            "post_attention_layernorm.weight": ("ln_2_w", False),
            "post_attention_layernorm.bias": ("ln_2_b", False),
            "mlp.dense_h_to_4h.weight": ("fc_in", True),
            "mlp.dense_h_to_4h.bias": ("fc_in_b", False),
            "mlp.dense_4h_to_h.weight": ("fc_out", True),
            "mlp.dense_4h_to_h.bias": ("fc_out_b", False),
        }
        for name, w in weights:
            if name.startswith("gpt_neox."):
                name = name[len("gpt_neox."):]
            if "rotary_emb" in name or "attention.bias" in name or \
                    "attention.masked_bias" in name:
                continue
            if name == "embed_in.weight":
                w = np.asarray(w, dtype=np.float32)
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w, ((0, self.padded_vocab - w.shape[0]),
                                   (0, 0)))
                params["embed_in"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "embed_out.weight":
                w = np.asarray(w, dtype=np.float32).T
                if w.shape[1] < self.padded_vocab:
                    w = np.pad(w, ((0, 0),
                                   (0, self.padded_vocab - w.shape[1])))
                params["embed_out"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "final_layer_norm.weight":
                params["final_norm_w"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "final_layer_norm.bias":
                params["final_norm_b"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".", 2)
                li = int(parts[1])
                sub = parts[2]
                if sub == "attention.query_key_value.weight":
                    layers[li]["qkv"] = jnp.asarray(
                        self._split_qkv_weight(np.asarray(w, np.float32)),
                        dtype=self.dtype)
                elif sub == "attention.query_key_value.bias":
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
