"""Llama-family causal LM (also serves Mistral, Aquila, InternLM-style
checkpoints — the same role the reference's vllm/model_executor/models/
llama.py plays for its variants).

TPU-native design notes:
* Written for FULL logical shapes; tensor parallelism is expressed purely
  through the PartitionSpecs in :meth:`param_specs` — GSPMD inserts the
  all-reduces the reference hand-coded in Row/ColumnParallelLinear.
* q/k/v and gate/up projections stay separate weights (the reference
  fuses them to cut CUDA kernel launches — a GPU-ism with no TPU
  benefit), which keeps shardings clean and HF weight loading 1:1.
* ``forward_layers(layer_start, num_layers)`` exposes the stacked-layer
  scan as static segments, so under Splitwise disaggregation the runner
  dispatches the prefill in layer groups and streams each group's freshly
  written KV pages to the decode pool while the remaining groups compute
  (the reference's per-layer put(), flash_attn.py:82-86).
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_splitwise_tpu.layers.activation import get_act_fn
from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.layers.attention import Attention, KVCache
from vllm_splitwise_tpu.layers.layernorm import rms_norm
from vllm_splitwise_tpu.layers.rotary_embedding import get_rope
from vllm_splitwise_tpu.utils import round_up

VOCAB_ALIGN = 128


class LlamaForCausalLM:

    # Subclasses (qwen2/gemma etc.) tweak these.
    qkv_bias: bool = False
    tie_word_embeddings_default: bool = False
    # Multiplier applied to token embeddings (gemma: sqrt(hidden)).
    embed_multiplier: float = 1.0
    # Offset added to every norm weight at load time (gemma stores w-1).
    norm_weight_offset: float = 0.0

    def __init__(self, config, dtype=jnp.bfloat16,
                 sliding_window: Optional[int] = None) -> None:
        self.config = config
        self.dtype = dtype
        self.hidden_size = config.hidden_size
        self.num_layers = config.num_hidden_layers
        self.num_heads = config.num_attention_heads
        self.num_kv_heads = getattr(config, "num_key_value_heads",
                                    self.num_heads)
        self.head_dim = getattr(config, "head_dim", None) or \
            self.hidden_size // self.num_heads
        self.intermediate_size = config.intermediate_size
        self.vocab_size = config.vocab_size
        self.padded_vocab = round_up(config.vocab_size, VOCAB_ALIGN)
        self.rms_eps = getattr(config, "rms_norm_eps", 1e-6)
        self.hidden_act = getattr(config, "hidden_act", "silu")
        self.act_fn = get_act_fn(self.hidden_act)
        self.tie_word_embeddings = getattr(config, "tie_word_embeddings",
                                           self.tie_word_embeddings_default)
        self.sliding_window = sliding_window if sliding_window is not None \
            else getattr(config, "sliding_window", None)

        rope_theta = getattr(config, "rope_theta", 10000.0)
        max_pos = getattr(config, "max_position_embeddings", 8192)
        self.rope = get_rope(
            self.head_dim,
            rotary_dim=self.head_dim,
            max_position=max_pos,
            base=rope_theta,
            is_neox_style=True,
            rope_scaling=getattr(config, "rope_scaling", None),
        )
        scale = self.head_dim**-0.5
        self.attn = [
            Attention(self.num_heads, self.head_dim, scale,
                      self.num_kv_heads, self.sliding_window)
            for _ in range(self.num_layers)
        ]

    # ---- parameter pytree ----

    def _layer_shapes(self, nkv=None) -> Dict[str, Tuple[int, ...]]:
        h, nh, hd, im = (self.hidden_size, self.num_heads, self.head_dim,
                         self.intermediate_size)
        nkv = nkv if nkv is not None else self.num_kv_heads
        shapes = {
            "input_layernorm": (h, ),
            "q_proj": (h, nh * hd),
            "k_proj": (h, nkv * hd),
            "v_proj": (h, nkv * hd),
            "o_proj": (nh * hd, h),
            "post_attention_layernorm": (h, ),
            "gate_proj": (h, im),
            "up_proj": (h, im),
            "down_proj": (im, h),
        }
        if self.qkv_bias:
            shapes.update({
                "q_bias": (nh * hd, ),
                "k_bias": (nkv * hd, ),
                "v_bias": (nkv * hd, ),
            })
        return shapes

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Random ("dummy" load-format) initialization."""
        def make(key, shape):
            if len(shape) == 1:
                return jnp.ones(shape, dtype=self.dtype)
            fan_in = shape[0]
            return (jax.random.normal(key, shape, dtype=jnp.float32) *
                    (1.0 / np.sqrt(fan_in))).astype(self.dtype)

        keys = jax.random.split(rng, self.num_layers + 2)
        layers = []
        for i in range(self.num_layers):
            lkeys = jax.random.split(keys[i], 16)
            layer = {}
            layer_kv = self.attn[i].num_kv_heads
            for j, (name, shape) in enumerate(
                    self._layer_shapes(layer_kv).items()):
                layer[name] = make(lkeys[j], shape)
            layers.append(layer)
        params = {
            "embed_tokens": make(keys[-2], (self.padded_vocab,
                                            self.hidden_size)),
            "layers": layers,
            "norm": jnp.ones((self.hidden_size, ), dtype=self.dtype),
        }
        if not self.tie_word_embeddings:
            params["lm_head"] = make(keys[-1], (self.hidden_size,
                                                self.padded_vocab))
        self._maybe_stack_layers(params)
        return params

    # ---- layer stacking (scan support) ----
    #
    # When every layer is homogeneous (same shapes — i.e. not DeciLM's
    # variable GQA), layer params stack into {name: [L, ...]} so the
    # forward pass can lax.scan over layers: ONE layer body compiles
    # instead of num_layers copies — 32-layer Llama compile time drops by
    # an order of magnitude, which matters on every engine start.

    def _maybe_stack_layers(self, params: Dict[str, Any]) -> None:
        layers = params["layers"]
        if not isinstance(layers, list) or not layers:
            return
        names = set(layers[0])
        if any(set(lp) != names for lp in layers):
            return
        stacked: Dict[str, Any] = {}
        for name in names:
            vals = [lp[name] for lp in layers]
            if isinstance(vals[0], dict):
                sub_names = set(vals[0])
                if any(set(v) != sub_names for v in vals):
                    return
                if any(v[k].shape != vals[0][k].shape for v in vals
                       for k in sub_names):
                    return
                sub = {
                    k: jnp.stack([v[k] for v in vals]) for k in sub_names
                }
                if "zeros" in sub:
                    # int4: convert to the kernel's banded scale/zero
                    # layout once, here (the stacked kernel reads it
                    # directly; no per-step padding).
                    from vllm_splitwise_tpu.ops.quant_matmul import (
                        pack_sz_bands, pad_qweight_even)
                    k_dim = sub["qweight"].shape[1] * 2
                    group = k_dim // sub["scales"].shape[1]
                    sub["sz_bands"] = pack_sz_bands(sub.pop("scales"),
                                                    sub.pop("zeros"),
                                                    group)
                    sub["qweight"] = pad_qweight_even(sub["qweight"],
                                                      group)
                    # Zero-byte static group-size marker: the band row
                    # count alone cannot disambiguate G for odd block
                    # counts (K=768 fits both G=96 and G=128).
                    sub["sz_group"] = jnp.zeros((1, group, 0),
                                                jnp.float32)
                stacked[name] = sub
            else:
                if any(v.shape != vals[0].shape for v in vals):
                    return
                stacked[name] = jnp.stack(vals)
        params["layers"] = stacked
        self._stacked = True

    def merge_projections(self, params: Dict[str, Any]) -> None:
        """Fuse q/k/v into one ``qkv_proj`` and gate/up into one
        ``gate_up_proj`` in a STACKED param tree.

        One kernel launch replaces three/two: each separate quant-matmul
        call pays a DMA pipeline warm-up bubble, and the fused call
        streams one wider weight instead.  Single-shard only — under
        tensor parallelism the concatenated output axis would not align
        projection boundaries with shard boundaries, so the runner only
        requests merging when the model runs unsharded.
        """
        layers = params.get("layers")
        if not isinstance(layers, dict):
            return

        def cat(names, out_name):
            vals = [layers.get(n) for n in names]
            if any(v is None for v in vals):
                return False
            if isinstance(vals[0], dict):
                if not all(isinstance(v, dict) and set(v) == set(vals[0])
                           for v in vals):
                    return False
                if "act_perm" in vals[0]:
                    return False  # per-weight activation permutations
                merged = {}
                for key in vals[0]:
                    arrs = [v[key] for v in vals]
                    if key == "sz_group":
                        if any(a.shape != arrs[0].shape for a in arrs):
                            return False
                        merged[key] = arrs[0]
                        continue
                    if any(a.shape[:-1] != arrs[0].shape[:-1]
                           for a in arrs):
                        return False
                    merged[key] = jnp.concatenate(arrs, axis=-1)
            else:
                if any(isinstance(v, dict) for v in vals):
                    return False
                if any(v.shape[:-1] != vals[0].shape[:-1] for v in vals):
                    return False
                merged = jnp.concatenate(vals, axis=-1)
            layers[out_name] = merged
            for n in names:
                del layers[n]
            return True

        if cat(("q_proj", "k_proj", "v_proj"), "qkv_proj"):
            if self.qkv_bias:
                cat(("q_bias", "k_bias", "v_bias"), "qkv_b")
        cat(("gate_proj", "up_proj"), "gate_up_proj")

    @staticmethod
    def _layer_slice(layers, i: int):
        if isinstance(layers, list):
            return layers[i]
        return jax.tree_util.tree_map(lambda a: a[i], layers)

    def _can_scan(self, params, lora) -> bool:
        return (isinstance(params["layers"], dict)
                and all(a.num_kv_heads == self.attn[0].num_kv_heads
                        for a in self.attn))

    def param_specs(self) -> Dict[str, Any]:
        """PartitionSpec pytree matching init_params' structure."""
        layer_spec = {
            "input_layernorm": P(),
            "q_proj": P(None, "model"),
            "k_proj": P(None, "model"),
            "v_proj": P(None, "model"),
            "o_proj": P("model", None),
            "post_attention_layernorm": P(),
            "gate_proj": P(None, "model"),
            "up_proj": P(None, "model"),
            "down_proj": P("model", None),
        }
        if self.qkv_bias:
            layer_spec.update({
                "q_bias": P("model"),
                "k_bias": P("model"),
                "v_bias": P("model"),
            })
        if self._layers_stacked:
            # Stacked layers: prepend the layer axis (replicated).
            layer_specs: Any = {
                k: P(None, *tuple(v))
                for k, v in layer_spec.items()
            }
        else:
            layer_specs = [dict(layer_spec) for _ in range(self.num_layers)]
        specs = {
            "embed_tokens": P("model", None),
            "layers": layer_specs,
            "norm": P(),
        }
        if not self.tie_word_embeddings:
            specs["lm_head"] = P(None, "model")
        return specs

    @property
    def _layers_stacked(self) -> bool:
        return getattr(self, "_stacked", False)

    def supports_stacked_kv(self) -> bool:
        """True when the worker should allocate the stacked
        [L, kvh, pages, ps, hd] KV cache (scan-compatible)."""
        return self._layers_stacked and all(
            a.num_kv_heads == self.attn[0].num_kv_heads for a in self.attn)

    # ---- forward ----

    def embed(self, params: Dict[str, Any], input_ids: jax.Array,
              lora=None) -> jax.Array:
        if lora is not None and "embed_A" in lora:
            from vllm_splitwise_tpu.lora.layers import lora_embedding
            hidden = lora_embedding(input_ids, params["embed_tokens"],
                                    lora["embed_A"], lora["embed_B"],
                                    lora["extra_in"], lora["idx"],
                                    self.vocab_size)
        else:
            hidden = jnp.take(params["embed_tokens"], input_ids, axis=0,
                              mode="clip")
        if self.embed_multiplier != 1.0:
            hidden = hidden * jnp.asarray(self.embed_multiplier,
                                          dtype=hidden.dtype)
        return hidden

    def finalize(self, params: Dict[str, Any],
                 hidden: jax.Array) -> jax.Array:
        return rms_norm(hidden, params["norm"], self.rms_eps)

    def __call__(
        self,
        params: Dict[str, Any],
        input_ids: jax.Array,   # [B, T]
        positions: jax.Array,   # [B, T]
        kv_caches: List[KVCache],
        metadata,
        lora=None,
    ) -> Tuple[jax.Array, List[KVCache]]:
        hidden = self.embed(params, input_ids, lora)
        from vllm_splitwise_tpu.ops.kv_cache import QuantPages
        if (isinstance(kv_caches, tuple) and len(kv_caches) == 2
                and (not isinstance(kv_caches[0], tuple)
                     or isinstance(kv_caches[0], QuantPages))
                and getattr(kv_caches[0], "ndim", 0) == 5):
            assert self._can_scan(params, lora), (
                "stacked KV caches require stacked homogeneous layers")
            hidden, caches = self.forward_layers(params, hidden, positions,
                                                 kv_caches, metadata, lora)
            hidden = self.finalize(params, hidden)
            return hidden, caches
        new_caches: List[KVCache] = []
        for i in range(self.num_layers):
            lp = self._layer_slice(params["layers"], i)
            residual = hidden
            layer_kv_heads = self.attn[i].num_kv_heads
            if "qkv_proj" in lp and lora is None:
                # Input norm rides the quant kernel's fused prologue.
                x = None
                qkv = dense(hidden, lp["qkv_proj"], pre_op="rmsnorm",
                            pre_w=lp["input_layernorm"],
                            pre_eps=self.rms_eps)
                if "qkv_b" in lp:
                    qkv = qkv + lp["qkv_b"]
                qd = self.num_heads * self.head_dim
                kvd = layer_kv_heads * self.head_dim
                q = qkv[..., :qd]
                k = qkv[..., qd:qd + kvd]
                v = qkv[..., qd + kvd:]
            else:
                x = rms_norm(hidden, lp["input_layernorm"], self.rms_eps)
                if "qkv_proj" in lp:
                    qkv = dense(x, lp["qkv_proj"])
                    if "qkv_b" in lp:
                        qkv = qkv + lp["qkv_b"]
                    qd = self.num_heads * self.head_dim
                    kvd = layer_kv_heads * self.head_dim
                    q = qkv[..., :qd]
                    k = qkv[..., qd:qd + kvd]
                    v = qkv[..., qd + kvd:]
                else:
                    q = dense(x, lp["q_proj"])
                    k = dense(x, lp["k_proj"])
                    v = dense(x, lp["v_proj"])
                    if self.qkv_bias:
                        q = q + lp["q_bias"]
                        k = k + lp["k_bias"]
                        v = v + lp["v_bias"]
            if lora is not None:
                from vllm_splitwise_tpu.lora.layers import lora_apply
                idx = lora["idx"]
                q = q + lora_apply(x, lora["q_proj_A"][:, i],
                                   lora["q_proj_B"][:, i], idx)
                k = k + lora_apply(x, lora["k_proj_A"][:, i],
                                   lora["k_proj_B"][:, i], idx)
                v = v + lora_apply(x, lora["v_proj_A"][:, i],
                                   lora["v_proj_B"][:, i], idx)

            b, t, _ = q.shape
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, layer_kv_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            q = q.reshape(b, t, -1)
            k = k.reshape(b, t, -1)

            attn_out, cache = self.attn[i](q, k, v, kv_caches[i], metadata)
            new_caches.append(cache)
            hidden = residual + dense(attn_out, lp["o_proj"])

            residual = hidden
            if ("gate_up_proj" in lp and lora is None
                    and self.hidden_act == "silu"):
                # Post-attn norm and silu*up both ride the quant
                # kernels' fused prologues.
                gate_up = dense(hidden, lp["gate_up_proj"],
                                pre_op="rmsnorm",
                                pre_w=lp["post_attention_layernorm"],
                                pre_eps=self.rms_eps)
                down = dense(gate_up, lp["down_proj"], pre_op="silu_mul")
            else:
                x = rms_norm(hidden, lp["post_attention_layernorm"],
                             self.rms_eps)
                if "gate_up_proj" in lp:
                    gate_up = dense(x, lp["gate_up_proj"])
                    gate, up = jnp.split(gate_up, 2, axis=-1)
                else:
                    gate = dense(x, lp["gate_proj"])
                    up = dense(x, lp["up_proj"])
                if lora is not None:
                    gate = gate + lora_apply(x, lora["gate_proj_A"][:, i],
                                             lora["gate_proj_B"][:, i],
                                             idx)
                    up = up + lora_apply(x, lora["up_proj_A"][:, i],
                                         lora["up_proj_B"][:, i], idx)
                inner = self.act_fn(gate) * up
                down = dense(inner, lp["down_proj"])
                if lora is not None:
                    down = down + lora_apply(inner,
                                             lora["down_proj_A"][:, i],
                                             lora["down_proj_B"][:, i],
                                             idx)
            hidden = residual + down

        hidden = rms_norm(hidden, params["norm"], self.rms_eps)
        return hidden, new_caches

    def forward_layers(self, params, hidden, positions, kv_caches,
                       metadata, lora=None, *, layer_start: int = 0,
                       num_layers: Optional[int] = None):
        """lax.scan over (a static segment of) the stacked layer axis:
        xs = sliced layer params [+ per-layer LoRA stacks]; carry =
        (hidden, stacked KV pages).

        ``layer_start``/``num_layers`` carve out layers
        ``[layer_start, layer_start + num_layers)`` so the runner can
        dispatch the prefill in segments and stream each segment's
        freshly written KV pages to the decode pool while the remaining
        layers compute (the Splitwise per-layer put() of the reference,
        flash_attn.py:82-86, at layer-group granularity).  Quantized
        weights stay whole — the scan index ``li`` is ABSOLUTE, and the
        quant kernels take it as ``layer_index``.
        """
        if num_layers is None:
            num_layers = self.num_layers - layer_start
        attn = self.attn[0]
        layer_kv_heads = attn.num_kv_heads
        seg = slice(layer_start, layer_start + num_layers)

        lora_xs = None
        lora_idx = None
        if lora is not None:
            from vllm_splitwise_tpu.lora.layers import (GLOBAL_STACK_KEYS,
                                                        lora_apply)
            lora_idx = lora["idx"]
            # Per-layer stacks are [S, L, ...]; scan consumes the L axis
            # in front.  Global (embedding/LM-head) stacks stay out of
            # the scan — embed()/compute_logits() consume them.
            lora_xs = {
                k: jnp.moveaxis(v, 1, 0)[seg]
                for k, v in lora.items()
                if k != "idx" and k not in GLOBAL_STACK_KEYS
            }

        layers_all = params["layers"]
        quant = {k: v for k, v in layers_all.items()
                 if isinstance(v, dict)}
        merged_qkv = ("qkv_proj" in layers_all)
        merged_gu = ("gate_up_proj" in layers_all)
        qd_m = self.num_heads * self.head_dim
        kvd_m = layer_kv_heads * self.head_dim
        xs_layers = {k: v[seg] for k, v in layers_all.items()
                     if not isinstance(v, dict)}

        def body(carry, xs):
            h, k_pages, v_pages = carry
            lp, li, ll = xs

            def proj(x_in, name, **pre):
                if name in quant:
                    return dense(x_in, quant[name], layer_index=li,
                                 **pre)
                return dense(x_in, lp[name], **pre)

            residual = h
            if merged_qkv and ll is None:
                # Input norm rides the quant kernel's fused prologue.
                x = None
                qkv = proj(h, "qkv_proj", pre_op="rmsnorm",
                           pre_w=lp["input_layernorm"],
                           pre_eps=self.rms_eps)
                if "qkv_b" in lp:
                    qkv = qkv + lp["qkv_b"]
                q = qkv[..., :qd_m]
                k = qkv[..., qd_m:qd_m + kvd_m]
                v = qkv[..., qd_m + kvd_m:]
            elif merged_qkv:
                x = rms_norm(h, lp["input_layernorm"], self.rms_eps)
                qkv = proj(x, "qkv_proj")
                if "qkv_b" in lp:
                    qkv = qkv + lp["qkv_b"]
                q = qkv[..., :qd_m]
                k = qkv[..., qd_m:qd_m + kvd_m]
                v = qkv[..., qd_m + kvd_m:]
            else:
                x = rms_norm(h, lp["input_layernorm"], self.rms_eps)
                q = proj(x, "q_proj")
                k = proj(x, "k_proj")
                v = proj(x, "v_proj")
                if self.qkv_bias:
                    q = q + lp["q_bias"]
                    k = k + lp["k_bias"]
                    v = v + lp["v_bias"]
            if ll is not None:
                from vllm_splitwise_tpu.lora.layers import lora_apply
                q = q + lora_apply(x, ll["q_proj_A"], ll["q_proj_B"],
                                   lora_idx)
                k = k + lora_apply(x, ll["k_proj_A"], ll["k_proj_B"],
                                   lora_idx)
                v = v + lora_apply(x, ll["v_proj_A"], ll["v_proj_B"],
                                   lora_idx)
            b, t, _ = q.shape
            q = q.reshape(b, t, self.num_heads, self.head_dim)
            k = k.reshape(b, t, layer_kv_heads, self.head_dim)
            q, k = self.rope(positions, q, k)
            q = q.reshape(b, t, -1)
            k = k.reshape(b, t, -1)
            attn_out, (k_pages, v_pages) = attn(q, k, v,
                                                (k_pages, v_pages),
                                                metadata, layer_index=li)
            # The skip-add rides the projection (W4A8 epilogue fuses it;
            # plain weights add in XLA — identical numerics).
            h = proj(attn_out, "o_proj", residual=residual)
            if ll is not None:
                h = h + lora_apply(attn_out, ll["o_proj_A"],
                                   ll["o_proj_B"], lora_idx)
            residual = h
            if merged_gu and ll is None and self.hidden_act == "silu":
                # Post-attn norm and silu*up ride the fused prologues.
                gate_up = proj(h, "gate_up_proj", pre_op="rmsnorm",
                               pre_w=lp["post_attention_layernorm"],
                               pre_eps=self.rms_eps)
                h = proj(gate_up, "down_proj", pre_op="silu_mul",
                         residual=residual)
            else:
                x = rms_norm(h, lp["post_attention_layernorm"],
                             self.rms_eps)
                if merged_gu:
                    gate, up = jnp.split(proj(x, "gate_up_proj"), 2,
                                         axis=-1)
                else:
                    gate = proj(x, "gate_proj")
                    up = proj(x, "up_proj")
                if ll is not None:
                    gate = gate + lora_apply(x, ll["gate_proj_A"],
                                             ll["gate_proj_B"], lora_idx)
                    up = up + lora_apply(x, ll["up_proj_A"],
                                         ll["up_proj_B"], lora_idx)
                inner = self.act_fn(gate) * up
                h = proj(inner, "down_proj", residual=residual)
                if ll is not None:
                    h = h + lora_apply(inner, ll["down_proj_A"],
                                       ll["down_proj_B"], lora_idx)
            return (h, k_pages, v_pages), None

        # The stacked caches ride the CARRY (in-place scatter/DMA per
        # layer) — as scan xs/ys XLA would copy the full cache twice per
        # step, which measured ~2x 6.7 GB of HBM traffic on 7B.
        k_all, v_all = kv_caches
        (hidden, k_all, v_all), _ = jax.lax.scan(
            body, (hidden, k_all, v_all),
            (xs_layers,
             jnp.arange(layer_start, layer_start + num_layers), lora_xs))
        return hidden, (k_all, v_all)

    def compute_logits(self, params: Dict[str, Any], hidden: jax.Array,
                       lora=None) -> jax.Array:
        if self.tie_word_embeddings:
            lm_head = params["embed_tokens"].T
        else:
            lm_head = params["lm_head"]
        if isinstance(lm_head, dict):
            # Quantized LM head (--quantize-lm-head int8): W8A16 kernel
            # with per-channel scales, f32 accumulate/out — halves the
            # head's HBM bytes, which at 7B decode is ~3% of the step.
            from vllm_splitwise_tpu.ops.quant_matmul import \
                quant_matmul_int8
            lead = hidden.shape[:-1]
            logits = quant_matmul_int8(
                hidden.reshape(-1, hidden.shape[-1]), lm_head["qweight"],
                lm_head["scales"],
                out_dtype=jnp.float32).reshape(*lead, -1)
        else:
            logits = jnp.dot(hidden, lm_head,
                             preferred_element_type=jnp.float32)
        if lora is not None and "lm_head_A" in lora:
            # [rows, vocab + extra]: adapter-added ids score via the
            # adapter's output-embedding rows (-inf outside the row's
            # adapter); lm_head low-rank delta on top.
            from vllm_splitwise_tpu.lora.layers import lora_logits
            return lora_logits(hidden, logits, lora["lm_head_A"],
                               lora["lm_head_B"], lora["extra_out"],
                               lora["extra_count"], lora["idx"],
                               self.vocab_size)
        return logits[..., :self.vocab_size]

    # ---- HF checkpoint loading ----

    _HF_LAYER_MAP = {
        "self_attn.q_proj.weight": ("q_proj", True),
        "self_attn.k_proj.weight": ("k_proj", True),
        "self_attn.v_proj.weight": ("v_proj", True),
        "self_attn.o_proj.weight": ("o_proj", True),
        "self_attn.q_proj.bias": ("q_bias", False),
        "self_attn.k_proj.bias": ("k_bias", False),
        "self_attn.v_proj.bias": ("v_bias", False),
        "mlp.gate_proj.weight": ("gate_proj", True),
        "mlp.up_proj.weight": ("up_proj", True),
        "mlp.down_proj.weight": ("down_proj", True),
        "input_layernorm.weight": ("input_layernorm", False),
        "post_attention_layernorm.weight": ("post_attention_layernorm",
                                            False),
    }

    def load_weights(
        self,
        weights: Iterable[Tuple[str, np.ndarray]],
    ) -> Dict[str, Any]:
        """Consume (hf_name, array) pairs into the runtime param pytree.

        Torch linear weights are [out, in]; ours are [in, out] — transposed
        here, once, at load time.
        """
        layers: List[Dict[str, Any]] = [{} for _ in range(self.num_layers)]
        params: Dict[str, Any] = {"layers": layers}

        def put_embed(name, w):
            w = np.asarray(w, dtype=np.float32)
            if w.shape[0] < self.padded_vocab:
                w = np.pad(w, ((0, self.padded_vocab - w.shape[0]), (0, 0)))
            params[name] = jnp.asarray(w, dtype=self.dtype)

        for name, w in weights:
            if name.startswith("model."):
                name = name[len("model."):]
            if "rotary_emb.inv_freq" in name:
                continue
            if name == "embed_tokens.weight":
                put_embed("embed_tokens", w)
            elif name == "lm_head.weight":
                if not self.tie_word_embeddings:
                    w = np.asarray(w, dtype=np.float32).T  # [H, V]
                    if w.shape[1] < self.padded_vocab:
                        w = np.pad(w, ((0, 0),
                                       (0, self.padded_vocab - w.shape[1])))
                    params["lm_head"] = jnp.asarray(w, dtype=self.dtype)
            elif name == "norm.weight":
                params["norm"] = jnp.asarray(
                    np.asarray(w, dtype=np.float32) +
                    self.norm_weight_offset, dtype=self.dtype)
            elif name.startswith("layers."):
                rest = name.split(".", 2)
                layer_idx = int(rest[1])
                sub = rest[2]
                if sub not in self._HF_LAYER_MAP:
                    continue
                if "layernorm" in sub and self.norm_weight_offset:
                    w = np.asarray(w, dtype=np.float32) + \
                        self.norm_weight_offset
                our_name, transpose = self._HF_LAYER_MAP[sub]
                if isinstance(w, dict):
                    # Quantized param dict, already [in, out] internal
                    # layout (models/loader.py quant_grouping_iterator).
                    layers[layer_idx][our_name] = {
                        k: jnp.asarray(v) for k, v in w.items()
                    }
                    continue
                w = np.asarray(w, dtype=np.float32)
                if transpose:
                    w = w.T
                layers[layer_idx][our_name] = jnp.asarray(w,
                                                          dtype=self.dtype)
        self._maybe_stack_layers(params)
        return params
