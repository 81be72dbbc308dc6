"""GPTBigCode / StarCoder(1) causal LM (reference role:
vllm/model_executor/models/gpt_bigcode.py): learned positions, MQA (one
KV head) fused c_attn, GeLU-tanh MLP, tied lm_head."""
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
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class GPTBigCodeForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_hidden_layers
        self.num_heads = config.num_attention_heads
        self.head_dim = self.hidden_size // self.num_heads
        self.multi_query = getattr(config, "multi_query", True)
        self.num_kv_heads = 1 if self.multi_query else self.num_heads
        self.inner = getattr(config, "n_inner", None) or \
            4 * self.hidden_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.max_positions = config.max_position_embeddings
        self.eps = getattr(config, "layer_norm_epsilon", 1e-5)
        self.act_fn = get_act_fn(
            getattr(config, "activation_function", "gelu_pytorch_tanh"))
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads)
            for _ in range(self.num_layers)
        ]

    @property
    def _kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h, f, kv = self.hidden_size, self.inner, self._kv_dim

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
                "c_attn": make(lk[0], (h, h + 2 * kv)),
                "c_attn_b": jnp.zeros((h + 2 * kv, ), self.dtype),
                "c_proj": make(lk[1], (h, h)),
                "c_proj_b": jnp.zeros((h, ), self.dtype),
                "ln_2_w": jnp.ones((h, ), self.dtype),
                "ln_2_b": jnp.zeros((h, ), self.dtype),
                "mlp_fc": make(lk[2], (h, f)),
                "mlp_fc_b": jnp.zeros((f, ), self.dtype),
                "mlp_proj": make(lk[3], (f, h)),
                "mlp_proj_b": jnp.zeros((h, ), self.dtype),
            })
        return {
            "wte": make(keys[-2], (self.padded_vocab, h)),
            "wpe": make(keys[-1], (self.max_positions, h)),
            "layers": layers,
            "ln_f_w": jnp.ones((h, ), self.dtype),
            "ln_f_b": jnp.zeros((h, ), self.dtype),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "ln_1_w": P(), "ln_1_b": P(),
            # MQA: KV slice replicated; shard only the query span — keep
            # the fused weight replicated for simplicity (q-heads shard
            # would split the fused matrix unevenly).
            "c_attn": P(), "c_attn_b": P(),
            "c_proj": P(), "c_proj_b": P(),
            "ln_2_w": P(), "ln_2_b": P(),
            "mlp_fc": P(None, "model"), "mlp_fc_b": P("model"),
            "mlp_proj": P("model", None), "mlp_proj_b": P(),
        }
        return {
            "wte": P("model", None),
            "wpe": P(),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "ln_f_w": P(), "ln_f_b": P(),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = (jnp.take(params["wte"], input_ids, axis=0, mode="clip") +
                  jnp.take(params["wpe"], positions, axis=0, mode="clip"))
        new_caches: List[KVCache] = []
        kv = self._kv_dim
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = layer_norm(hidden, lp["ln_1_w"], lp["ln_1_b"], self.eps)
            qkv = dense(x, lp["c_attn"], lp["c_attn_b"])
            q = qkv[..., :self.hidden_size]
            k = qkv[..., self.hidden_size:self.hidden_size + kv]
            v = qkv[..., self.hidden_size + kv:]
            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["c_proj"],
                                      lp["c_proj_b"])
            residual = hidden
            x = layer_norm(hidden, lp["ln_2_w"], lp["ln_2_b"], self.eps)
            x = self.act_fn(dense(x, lp["mlp_fc"], lp["mlp_fc_b"]))
            hidden = residual + dense(x, lp["mlp_proj"], lp["mlp_proj_b"])
        hidden = layer_norm(hidden, params["ln_f_w"], params["ln_f_b"],
                            self.eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["wte"].T,
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    _MAP = {
        "ln_1.weight": ("ln_1_w", False),
        "ln_1.bias": ("ln_1_b", False),
        "attn.c_attn.weight": ("c_attn", True),   # nn.Linear: [out, in]
        "attn.c_attn.bias": ("c_attn_b", False),
        "attn.c_proj.weight": ("c_proj", True),
        "attn.c_proj.bias": ("c_proj_b", False),
        "ln_2.weight": ("ln_2_w", False),
        "ln_2.bias": ("ln_2_b", False),
        "mlp.c_fc.weight": ("mlp_fc", True),
        "mlp.c_fc.bias": ("mlp_fc_b", False),
        "mlp.c_proj.weight": ("mlp_proj", True),
        "mlp.c_proj.bias": ("mlp_proj_b", False),
    }

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        for name, w in weights:
            if name == "lm_head.weight":
                continue  # tied
            if name.startswith("transformer."):
                name = name[len("transformer."):]
            if name.endswith(".attn.bias"):
                continue
            if name == "wte.weight":
                w = np.asarray(w, dtype=np.float32)
                if w.shape[0] < self.padded_vocab:
                    w = np.pad(w, ((0, self.padded_vocab - w.shape[0]),
                                   (0, 0)))
                params["wte"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "wpe.weight":
                params["wpe"] = jnp.asarray(np.asarray(w, np.float32),
                                            dtype=self.dtype)
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
