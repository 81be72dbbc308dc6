"""InternLM2 causal LM (reference role:
vllm/model_executor/models/internlm2.py): Llama math under renamed
weights, with a grouped fused ``wqkv`` ([kv_groups, group+2, head_dim, H],
Falcon-new-arch-style layout)."""
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
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class InternLM2ForCausalLM:

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
        self.rms_eps = getattr(config, "rms_norm_eps", 1e-6)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.head_dim,
            max_position=getattr(config, "max_position_embeddings", 4096),
            base=getattr(config, "rope_theta", 1e6),
            is_neox_style=True,
            rope_scaling=getattr(config, "rope_scaling", None),
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
            lk = jax.random.split(keys[i], 5)
            layers.append({
                "attention_norm": jnp.ones((h, ), self.dtype),
                "wqkv": make(lk[0], (h, self._qkv_out)),
                "wo": make(lk[1], (self.num_heads * self.head_dim, h)),
                "ffn_norm": jnp.ones((h, ), self.dtype),
                "w1": make(lk[2], (h, f)),
                "w3": make(lk[3], (h, f)),
                "w2": make(lk[4], (f, h)),
            })
        return {
            "tok_embeddings": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "norm": jnp.ones((h, ), self.dtype),
            "output": make(keys[-1], (h, self.padded_vocab)),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "attention_norm": P(),
            "wqkv": P(),
            "wo": P("model", None),
            "ffn_norm": P(),
            "w1": P(None, "model"),
            "w3": P(None, "model"),
            "w2": P("model", None),
        }
        return {
            "tok_embeddings": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "norm": P(),
            "output": P(None, "model"),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["tok_embeddings"], input_ids, axis=0,
                          mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        qd = self.num_heads * self.head_dim
        kvd = self.num_kv_heads * self.head_dim
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = rms_norm(hidden, lp["attention_norm"], self.rms_eps)
            qkv = dense(x, lp["wqkv"])
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
            hidden = residual + dense(attn_out, lp["wo"])
            residual = hidden
            x = rms_norm(hidden, lp["ffn_norm"], self.rms_eps)
            hidden = residual + dense(
                jax.nn.silu(dense(x, lp["w1"])) * dense(x, lp["w3"]),
                lp["w2"])
        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["output"],
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def _split_wqkv(self, w: np.ndarray) -> np.ndarray:
        """[kv, group+2, hd, H] grouped rows -> straight [q; k; v].T"""
        h = self.hidden_size
        group = self.num_heads // self.num_kv_heads
        w = w.reshape(self.num_kv_heads, group + 2, self.head_dim, h)
        q = w[:, :group].reshape(-1, h)
        k = w[:, group:group + 1].reshape(-1, h)
        v = w[:, group + 1:].reshape(-1, h)
        return np.concatenate([q, k, v], axis=0).T

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        for name, w in weights:
            if name.startswith("model."):
                name = name[len("model."):]
            if "rotary_emb" in name:
                continue
            if name == "tok_embeddings.weight":
                wv = np.asarray(w, dtype=np.float32)
                if wv.shape[0] < self.padded_vocab:
                    wv = np.pad(wv, ((0, self.padded_vocab - wv.shape[0]),
                                     (0, 0)))
                params["tok_embeddings"] = jnp.asarray(wv,
                                                       dtype=self.dtype)
            elif name in ("output.weight", "lm_head.weight"):
                wv = np.asarray(w, dtype=np.float32).T
                if wv.shape[1] < self.padded_vocab:
                    wv = np.pad(wv, ((0, 0), (0, self.padded_vocab -
                                              wv.shape[1])))
                params["output"] = jnp.asarray(wv, dtype=self.dtype)
            elif name == "norm.weight":
                params["norm"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                rest = ".".join(parts[2:])
                if rest == "attention.wqkv.weight":
                    layers[li]["wqkv"] = jnp.asarray(
                        self._split_wqkv(np.asarray(w, np.float32)),
                        dtype=self.dtype)
                elif rest == "attention.wo.weight":
                    layers[li]["wo"] = jnp.asarray(
                        np.asarray(w, np.float32).T, dtype=self.dtype)
                elif rest == "attention_norm.weight":
                    layers[li]["attention_norm"] = jnp.asarray(
                        w, dtype=self.dtype)
                elif rest == "ffn_norm.weight":
                    layers[li]["ffn_norm"] = jnp.asarray(w,
                                                         dtype=self.dtype)
                elif rest.startswith("feed_forward."):
                    wn = parts[3]  # w1/w2/w3
                    layers[li][wn] = jnp.asarray(
                        np.asarray(w, np.float32).T, dtype=self.dtype)
        return params
