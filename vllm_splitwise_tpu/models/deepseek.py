"""DeepSeek (v1 MoE) causal LM (reference role:
vllm/model_executor/models/deepseek.py): Llama attention; MoE FFN with
shared experts from layer ``first_k_dense_replace`` onward (dense GLU
before), softmax top-k routing without renormalization unless
``norm_topk_prob``."""
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
from vllm_splitwise_tpu.ops.fused_moe import fused_moe
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class DeepseekForCausalLM:

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
        self.moe_inner = getattr(config, "moe_intermediate_size",
                                 self.inner)
        self.num_experts = getattr(config, "n_routed_experts", 0)
        self.num_shared = getattr(config, "n_shared_experts", 0)
        self.top_k = getattr(config, "num_experts_per_tok", 2)
        self.first_dense = getattr(config, "first_k_dense_replace", 0)
        self.moe_freq = getattr(config, "moe_layer_freq", 1)
        self.norm_topk = bool(getattr(config, "norm_topk_prob", False))
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.rms_eps = getattr(config, "rms_norm_eps", 1e-6)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.head_dim,
            max_position=getattr(config, "max_position_embeddings", 4096),
            base=getattr(config, "rope_theta", 10000),
            is_neox_style=True,
        )
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads)
            for _ in range(self.num_layers)
        ]

    def _is_moe_layer(self, i: int) -> bool:
        return (self.num_experts > 0 and i >= self.first_dense
                and i % self.moe_freq == 0)

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        h = self.hidden_size
        nh, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim

        def make(key, shape):
            fan = shape[-2] if len(shape) > 1 else h
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    (1.0 / np.sqrt(fan))).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 10)
            layer = {
                "input_layernorm": jnp.ones((h, ), self.dtype),
                "q_proj": make(lk[0], (h, nh * hd)),
                "k_proj": make(lk[1], (h, nkv * hd)),
                "v_proj": make(lk[2], (h, nkv * hd)),
                "o_proj": make(lk[3], (nh * hd, h)),
                "post_attention_layernorm": jnp.ones((h, ), self.dtype),
            }
            if self._is_moe_layer(i):
                e, f = self.num_experts, self.moe_inner
                layer.update({
                    "gate": make(lk[4], (h, e)),
                    "w1": make(lk[5], (e, h, f)),
                    "w3": make(lk[6], (e, h, f)),
                    "w2": make(lk[7], (e, f, h)),
                })
                if self.num_shared:
                    sf = self.moe_inner * self.num_shared
                    layer.update({
                        "shared_gate_proj": make(lk[8], (h, sf)),
                        "shared_up_proj": make(lk[9], (h, sf)),
                        "shared_down_proj": make(lk[8], (sf, h)),
                    })
            else:
                f = self.inner
                layer.update({
                    "gate_proj": make(lk[4], (h, f)),
                    "up_proj": make(lk[5], (h, f)),
                    "down_proj": make(lk[6], (f, h)),
                })
            layers.append(layer)
        return {
            "embed_tokens": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "norm": jnp.ones((h, ), self.dtype),
            "lm_head": make(keys[-1], (h, self.padded_vocab)),
        }

    def param_specs(self) -> Dict[str, Any]:
        specs = {
            "embed_tokens": P("model", None),
            "layers": [],
            "norm": P(),
            "lm_head": P(None, "model"),
        }
        for i in range(self.num_layers):
            s = {
                "input_layernorm": P(),
                "q_proj": P(None, "model"), "k_proj": P(None, "model"),
                "v_proj": P(None, "model"), "o_proj": P("model", None),
                "post_attention_layernorm": P(),
            }
            if self._is_moe_layer(i):
                s.update({
                    "gate": P(),
                    "w1": P(None, None, "model"),
                    "w3": P(None, None, "model"),
                    "w2": P(None, "model", None),
                })
                if self.num_shared:
                    s.update({
                        "shared_gate_proj": P(None, "model"),
                        "shared_up_proj": P(None, "model"),
                        "shared_down_proj": P("model", None),
                    })
            else:
                s.update({
                    "gate_proj": P(None, "model"),
                    "up_proj": P(None, "model"),
                    "down_proj": P("model", None),
                })
            specs["layers"].append(s)
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
            x = rms_norm(hidden, lp["input_layernorm"], self.rms_eps)
            q = dense(x, lp["q_proj"])
            k = dense(x, lp["k_proj"])
            v = dense(x, lp["v_proj"])
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, self.num_kv_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            attn_out, cache = self.attn[i](q.reshape(b, t, -1),
                                           k.reshape(b, t, -1), v,
                                           kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["o_proj"])
            residual = hidden
            x = rms_norm(hidden, lp["post_attention_layernorm"],
                         self.rms_eps)
            if self._is_moe_layer(i):
                x2 = x.reshape(b * t, self.hidden_size)
                out = fused_moe(x2, lp["gate"], lp["w1"], lp["w3"],
                                lp["w2"], self.top_k, jax.nn.silu,
                                renormalize=self.norm_topk)
                if self.num_shared:
                    out = out + dense(
                        jax.nn.silu(dense(x2, lp["shared_gate_proj"])) *
                        dense(x2, lp["shared_up_proj"]),
                        lp["shared_down_proj"])
                hidden = residual + out.reshape(b, t, self.hidden_size)
            else:
                hidden = residual + dense(
                    jax.nn.silu(dense(x, lp["gate_proj"])) *
                    dense(x, lp["up_proj"]), lp["down_proj"])
        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["lm_head"],
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [
            {"w1": {}, "w3": {}, "w2": {}} for _ in range(self.num_layers)
        ]
        params: Dict[str, Any] = {"layers": layers}

        def to_dev(w):
            if isinstance(w, dict):
                return {k: jnp.asarray(v) for k, v in w.items()}
            return jnp.asarray(np.asarray(w, np.float32).T,
                               dtype=self.dtype)

        for name, w in weights:
            if name.startswith("model."):
                name = name[len("model."):]
            if "rotary_emb" in name:
                continue
            if name == "embed_tokens.weight":
                wv = np.asarray(w, dtype=np.float32)
                if wv.shape[0] < self.padded_vocab:
                    wv = np.pad(wv, ((0, self.padded_vocab - wv.shape[0]),
                                     (0, 0)))
                params["embed_tokens"] = jnp.asarray(wv, dtype=self.dtype)
            elif name == "lm_head.weight":
                wv = np.asarray(w, dtype=np.float32).T
                if wv.shape[1] < self.padded_vocab:
                    wv = np.pad(wv, ((0, 0), (0, self.padded_vocab -
                                              wv.shape[1])))
                params["lm_head"] = jnp.asarray(wv, dtype=self.dtype)
            elif name == "norm.weight":
                params["norm"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                rest = ".".join(parts[2:])
                simple = {
                    "input_layernorm.weight": "input_layernorm",
                    "post_attention_layernorm.weight":
                        "post_attention_layernorm",
                }
                if rest in simple:
                    layers[li][simple[rest]] = jnp.asarray(
                        w, dtype=self.dtype)
                elif rest.startswith("self_attn."):
                    layers[li][parts[3].split(".")[0]] = to_dev(w)
                elif rest == "mlp.gate.weight":
                    layers[li]["gate"] = to_dev(w)
                elif rest.startswith("mlp.experts."):
                    ei = int(parts[4])
                    wn = {"gate_proj": "w1", "up_proj": "w3",
                          "down_proj": "w2"}[parts[5]]
                    layers[li][wn][ei] = to_dev(w)
                elif rest.startswith("mlp.shared_experts."):
                    layers[li]["shared_" + parts[4]] = to_dev(w)
                elif rest.startswith("mlp."):
                    layers[li][parts[3].split(".")[0]] = to_dev(w)

        for lp in layers:
            for wn in ("w1", "w3", "w2"):
                vals = lp[wn]
                if not vals:
                    del lp[wn]
                    continue
                ordered = [vals[e] for e in sorted(vals)]
                if isinstance(ordered[0], dict):
                    from vllm_splitwise_tpu.ops.grouped_matmul import \
                        stack_expert_quant
                    stacked_q = stack_expert_quant(ordered)
                    lp[wn] = stacked_q if stacked_q is not None else ordered
                else:
                    lp[wn] = jnp.stack(ordered, axis=0)
        return params
