"""OLMo causal LM (reference role: vllm/model_executor/models/olmo.py):
Llama structure with NON-parametric LayerNorm (no scale/bias), optional
QKV clipping, optional tied embeddings."""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.attention import Attention, KVCache
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


def _ln(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(orig)


class OlmoForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
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
        self.clip_qkv = getattr(config, "clip_qkv", None)
        self.tie = getattr(config, "tie_word_embeddings", False)
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
                      self.num_kv_heads)
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
            lk = jax.random.split(keys[i], 7)
            layers.append({
                "q_proj": make(lk[0], (h, nh * hd)),
                "k_proj": make(lk[1], (h, nkv * hd)),
                "v_proj": make(lk[2], (h, nkv * hd)),
                "o_proj": make(lk[3], (nh * hd, h)),
                "gate_proj": make(lk[4], (h, f)),
                "up_proj": make(lk[5], (h, f)),
                "down_proj": make(lk[6], (f, h)),
            })
        params = {
            "embed_tokens": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
        }
        if not self.tie:
            params["lm_head"] = make(keys[-1], (h, self.padded_vocab))
        return params

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "q_proj": P(None, "model"), "k_proj": P(None, "model"),
            "v_proj": P(None, "model"), "o_proj": P("model", None),
            "gate_proj": P(None, "model"), "up_proj": P(None, "model"),
            "down_proj": P("model", None),
        }
        specs = {
            "embed_tokens": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
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
            x = _ln(hidden)
            q = dense(x, lp["q_proj"])
            k = dense(x, lp["k_proj"])
            v = dense(x, lp["v_proj"])
            if self.clip_qkv is not None:
                q = jnp.clip(q, -self.clip_qkv, self.clip_qkv)
                k = jnp.clip(k, -self.clip_qkv, self.clip_qkv)
                v = jnp.clip(v, -self.clip_qkv, self.clip_qkv)
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, self.num_kv_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, cache = self.attn[i](q.reshape(b, t, -1),
                                           k.reshape(b, t, -1), v,
                                           kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["o_proj"])
            residual = hidden
            x = _ln(hidden)
            hidden = residual + dense(
                jax.nn.silu(dense(x, lp["gate_proj"])) *
                dense(x, lp["up_proj"]), lp["down_proj"])
        hidden = _ln(hidden)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        head = params["embed_tokens"].T if self.tie else params["lm_head"]
        logits = jnp.dot(hidden, head, preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    _MAP = {
        "self_attn.q_proj.weight": "q_proj",
        "self_attn.k_proj.weight": "k_proj",
        "self_attn.v_proj.weight": "v_proj",
        "self_attn.o_proj.weight": "o_proj",
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
            elif name == "lm_head.weight" and not self.tie:
                w = np.asarray(w, dtype=np.float32).T
                if w.shape[1] < self.padded_vocab:
                    w = np.pad(w, ((0, 0),
                                   (0, self.padded_vocab - w.shape[1])))
                params["lm_head"] = jnp.asarray(w, dtype=self.dtype)
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
