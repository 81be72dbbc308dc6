"""Mixtral (sparse MoE) causal LM — reference role:
vllm/model_executor/models/mixtral.py.  Llama-style attention (GQA +
RoPE) with a top-2-of-8 expert GLU FFN per layer through ops/fused_moe.

Quantized checkpoints (GPTQ/AWQ experts) load as per-expert quant dicts
and run the per-expert fused dequant-matmul loop (the reference's
quant_fused_moe.py role).
"""
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


class MixtralForCausalLM:

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
        self.intermediate_size = config.intermediate_size
        self.num_experts = config.num_local_experts
        self.top_k = config.num_experts_per_tok
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.rms_eps = getattr(config, "rms_norm_eps", 1e-5)
        self.sliding_window = sliding_window if sliding_window is not None \
            else getattr(config, "sliding_window", None)

        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.head_dim,
            max_position=getattr(config, "max_position_embeddings", 32768),
            base=getattr(config, "rope_theta", 1e6),
            is_neox_style=True,
        )
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads, self.sliding_window)
            for _ in range(self.num_layers)
        ]

    # ---- params ----

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        def make(key, shape):
            if len(shape) == 1:
                return jnp.ones(shape, dtype=self.dtype)
            fan_in = shape[-2]
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    (1.0 / np.sqrt(fan_in))).astype(self.dtype)

        h, nh, nkv, hd = (self.hidden_size, self.num_heads,
                          self.num_kv_heads, self.head_dim)
        im, e = self.intermediate_size, self.num_experts
        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lk = jax.random.split(keys[i], 10)
            layers.append({
                "input_layernorm": jnp.ones((h, ), dtype=self.dtype),
                "q_proj": make(lk[0], (h, nh * hd)),
                "k_proj": make(lk[1], (h, nkv * hd)),
                "v_proj": make(lk[2], (h, nkv * hd)),
                "o_proj": make(lk[3], (nh * hd, h)),
                "post_attention_layernorm": jnp.ones((h, ),
                                                     dtype=self.dtype),
                "gate": make(lk[4], (h, e)),
                "w1": make(lk[5], (e, h, im)),
                "w3": make(lk[6], (e, h, im)),
                "w2": make(lk[7], (e, im, h)),
            })
        return {
            "embed_tokens": make(keys[-2], (self.padded_vocab, h)),
            "layers": layers,
            "norm": jnp.ones((h, ), dtype=self.dtype),
            "lm_head": make(keys[-1], (h, self.padded_vocab)),
        }

    def param_specs(self) -> Dict[str, Any]:
        layer_spec = {
            "input_layernorm": P(),
            "q_proj": P(None, "model"),
            "k_proj": P(None, "model"),
            "v_proj": P(None, "model"),
            "o_proj": P("model", None),
            "post_attention_layernorm": P(),
            "gate": P(),
            # Experts shard their ffn dim over the model axis (EP would
            # shard the E dim instead; TP-in-expert matches the
            # reference's strategy, models/mixtral.py).
            "w1": P(None, None, "model"),
            "w3": P(None, None, "model"),
            "w2": P(None, "model", None),
        }
        return {
            "embed_tokens": P("model", None),
            "layers": [dict(layer_spec) for _ in range(self.num_layers)],
            "norm": P(),
            "lm_head": P(None, "model"),
        }

    # ---- forward ----

    def __call__(self, params, input_ids, positions, kv_caches,
                 metadata) -> Tuple[jax.Array, List[KVCache]]:
        hidden = jnp.take(params["embed_tokens"], input_ids, axis=0,
                          mode="clip")
        new_caches: List[KVCache] = []
        b, t, _ = (*hidden.shape, )
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
            q = q.reshape(b, t, -1)
            k = k.reshape(b, t, -1)
            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["o_proj"])

            residual = hidden
            x = rms_norm(hidden, lp["post_attention_layernorm"],
                         self.rms_eps)
            x2 = x.reshape(b * t, self.hidden_size)
            moe_out = fused_moe(x2, lp["gate"], lp["w1"], lp["w3"],
                                lp["w2"], self.top_k, jax.nn.silu)
            hidden = residual + moe_out.reshape(b, t, self.hidden_size)

        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        return hidden, new_caches

    def compute_logits(self, params, hidden) -> jax.Array:
        logits = jnp.dot(hidden, params["lm_head"],
                         preferred_element_type=jnp.float32)
        return logits[..., :self.vocab_size]

    # ---- loading ----

    def load_weights(self, weights: Iterable[Tuple[str, Any]]):
        layers: List[Dict[str, Any]] = [
            {"w1": [None] * self.num_experts,
             "w3": [None] * self.num_experts,
             "w2": [None] * self.num_experts}
            for _ in range(self.num_layers)
        ]
        params: Dict[str, Any] = {"layers": layers}
        quantized_experts = False

        def to_dev(w, transpose):
            if isinstance(w, dict):
                return {k: jnp.asarray(v) for k, v in w.items()}
            w = np.asarray(w, dtype=np.float32)
            if transpose:
                w = w.T
            return jnp.asarray(w, dtype=self.dtype)

        for name, w in weights:
            if name.startswith("model."):
                name = name[len("model."):]
            if "rotary_emb.inv_freq" in name:
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
            elif name == "norm.weight":
                params["norm"] = jnp.asarray(w, dtype=self.dtype)
            elif name.startswith("layers."):
                parts = name.split(".")
                li = int(parts[1])
                rest = ".".join(parts[2:])
                if rest.startswith("self_attn."):
                    proj = parts[3].split("_")[0] + "_proj"
                    layers[li][proj] = to_dev(w, True)
                elif rest == "input_layernorm.weight":
                    layers[li]["input_layernorm"] = jnp.asarray(
                        w, dtype=self.dtype)
                elif rest == "post_attention_layernorm.weight":
                    layers[li]["post_attention_layernorm"] = jnp.asarray(
                        w, dtype=self.dtype)
                elif rest == "block_sparse_moe.gate.weight":
                    layers[li]["gate"] = to_dev(w, True)
                elif rest.startswith("block_sparse_moe.experts."):
                    ei = int(parts[4])
                    wn = parts[5]  # w1/w2/w3
                    val = to_dev(w, True)
                    if isinstance(val, dict):
                        quantized_experts = True
                    layers[li][wn][ei] = val

        # Stack dense experts into [E, H, F] for the batched einsum path;
        # quantized experts stay as lists (per-expert dequant matmuls).
        for lp in layers:
            for wn in ("w1", "w3", "w2"):
                vals = lp[wn]
                if not vals:
                    continue
                if not isinstance(vals[0], dict):
                    lp[wn] = jnp.stack(vals, axis=0)
                    continue
                # Uniform int4 experts stack into one banded [E, ...]
                # dict for the grouped quant kernel; non-uniform /
                # act-ordered experts keep the per-expert loop.
                from vllm_splitwise_tpu.ops.grouped_matmul import \
                    stack_expert_quant
                stacked_q = stack_expert_quant(vals)
                if stacked_q is not None:
                    lp[wn] = stacked_q
        return params
