"""DBRX (MoE) causal LM — covers both the reference's models/dbrx.py and
the fork's dbrx_quant.py (vllm/model_executor/models/dbrx_quant.py):
quantized checkpoints flow through the same per-expert quant-dict path in
ops/fused_moe.  Fused Wqkv (straight concat, GQA), clip_qkv, bias-free
LayerNorm, stacked expert GLU weights."""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.attention import Attention, KVCache
from vllm_splitwise_tpu.layers.layernorm import layer_norm
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope
from vllm_splitwise_tpu.ops.fused_moe import fused_moe
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class DbrxForCausalLM:

    def __init__(self, config, dtype=jnp.bfloat16, **_) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.d_model
        self.num_layers = config.n_layers
        self.num_heads = config.n_heads
        attn = config.attn_config
        get = (attn.get if isinstance(attn, dict)
               else lambda k, d=None: getattr(attn, k, d))
        self.num_kv_heads = get("kv_n_heads", self.num_heads)
        self.clip_qkv = get("clip_qkv", None)
        rope_theta = get("rope_theta", 10000)
        self.head_dim = self.hidden_size // self.num_heads
        ffn = config.ffn_config
        fget = (ffn.get if isinstance(ffn, dict)
                else lambda k, d=None: getattr(ffn, k, d))
        self.inner = fget("ffn_hidden_size")
        self.num_experts = fget("moe_num_experts")
        self.top_k = fget("moe_top_k")
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.head_dim,
            max_position=getattr(config, "max_seq_len", 32768),
            base=rope_theta,
            is_neox_style=True,
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
        h, f, e = self.hidden_size, self.inner, self.num_experts

        def make(key, shape):
            fan = shape[-2] if len(shape) > 1 else h
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    (1.0 / np.sqrt(fan))).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 6)
            layers.append({
                "norm_1": jnp.ones((h, ), self.dtype),
                "qkv": make(lk[0], (h, self._qkv_out)),
                "out_proj": make(lk[1], (h, h)),
                "norm_2": jnp.ones((h, ), self.dtype),
                "gate": make(lk[2], (h, e)),
                "w1": make(lk[3], (e, h, f)),
                "w3": make(lk[4], (e, h, f)),
                "w2": make(lk[5], (e, f, h)),
            })
        return {
            "wte": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "norm_f": jnp.ones((h, ), self.dtype),
            "lm_head": make(keys[-1], (h, self.padded_vocab)),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "norm_1": P(), "qkv": P(), "out_proj": P(), "norm_2": P(),
            "gate": P(),
            "w1": P(None, None, "model"),
            "w3": P(None, None, "model"),
            "w2": P(None, "model", None),
        }
        return {
            "wte": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "norm_f": P(),
            "lm_head": P(None, "model"),
        }

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["wte"], input_ids, axis=0, mode="clip")
        new_caches: List[KVCache] = []
        b, t = input_ids.shape
        qd = self.num_heads * self.head_dim
        kvd = self.num_kv_heads * self.head_dim
        for i in range(self.num_layers):
            lp = params["layers"][i]
            residual = hidden
            x = layer_norm(hidden, lp["norm_1"], None)
            qkv = dense(x, lp["qkv"])
            if self.clip_qkv is not None:
                qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
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
            hidden = residual + dense(attn_out, lp["out_proj"])
            residual = hidden
            x = layer_norm(hidden, lp["norm_2"], None)
            x2 = x.reshape(b * t, self.hidden_size)
            moe_out = fused_moe(x2, lp["gate"], lp["w1"], lp["w3"],
                                lp["w2"], self.top_k, jax.nn.silu)
            hidden = residual + moe_out.reshape(b, t, self.hidden_size)
        hidden = layer_norm(hidden, params["norm_f"], None)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["lm_head"],
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}
        e, f, h = self.num_experts, self.inner, self.hidden_size
        for name, w in weights:
            if name.startswith("transformer."):
                name = name[len("transformer."):]
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
            elif name == "norm_f.weight":
                params["norm_f"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("blocks."):
                parts = name.split(".", 2)
                li = int(parts[1])
                sub = parts[2]
                wv = np.asarray(w, dtype=np.float32) \
                    if not isinstance(w, dict) else w
                if sub == "norm_attn_norm.norm_1.weight":
                    layers[li]["norm_1"] = jnp.asarray(wv, self.dtype)
                elif sub == "norm_attn_norm.norm_2.weight":
                    layers[li]["norm_2"] = jnp.asarray(wv, self.dtype)
                elif sub == "norm_attn_norm.attn.Wqkv.weight":
                    layers[li]["qkv"] = jnp.asarray(wv.T, self.dtype)
                elif sub == "norm_attn_norm.attn.out_proj.weight":
                    layers[li]["out_proj"] = jnp.asarray(wv.T, self.dtype)
                elif sub == "ffn.router.layer.weight":
                    layers[li]["gate"] = jnp.asarray(wv.T, self.dtype)
                elif sub == "ffn.experts.mlp.w1":
                    # [E*F, H] -> [E, H, F]
                    layers[li]["w1"] = jnp.asarray(
                        wv.reshape(e, f, h).transpose(0, 2, 1), self.dtype)
                elif sub == "ffn.experts.mlp.v1":
                    layers[li]["w3"] = jnp.asarray(
                        wv.reshape(e, f, h).transpose(0, 2, 1), self.dtype)
                elif sub == "ffn.experts.mlp.w2":
                    # [E*F, H] -> [E, F, H] (used untransposed by HF).
                    layers[li]["w2"] = jnp.asarray(
                        wv.reshape(e, f, h), self.dtype)
        return params
