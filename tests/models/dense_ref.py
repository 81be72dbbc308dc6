"""Independent dense numpy reference for model families without a
transformers implementation (baichuan, internlm2, qwen1, chatglm,
deepseek-MoE, orion, decilm).

The oracle takes NEUTRAL weights (torch-orientation [out, in] matrices,
separate q/k/v) and computes fp32 logits with plain numpy — no code
shared with the JAX implementation.  Per-family converters in
test_family_oracles.py re-pack the neutral weights into each family's
checkpoint format; the model under test must reproduce the oracle's
logits, which exercises both the weight-name mapping and the math
(RoPE conventions, ALiBi, GQA/MQA layouts, MoE routing).

The oracle itself is anchored to HF ground truth by
test_dense_ref_matches_hf_llama (Llama config → transformers).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class MoECfg:
    num_experts: int
    top_k: int
    inter: int
    num_shared: int = 0
    renormalize: bool = False


@dataclass
class RefCfg:
    hidden: int
    layers: int
    heads: int
    head_dim: int
    kv_heads: List[int]           # per layer
    inter: int
    vocab: int
    eps: float = 1e-6
    norm: str = "rms"             # "rms" | "ln"
    rope: Optional[Tuple[str, int, float]] = ("neox", None, 10000.0)
    #      (style "neox"|"interleaved", rotary_dim|None=head_dim, base)
    alibi: bool = False
    qkv_bias: bool = False
    tie_embeddings: bool = False
    moe_layers: Dict[int, MoECfg] = field(default_factory=dict)


def make_weights(rng: np.random.RandomState, cfg: RefCfg) -> dict:
    h, hd = cfg.hidden, cfg.head_dim

    def mat(out_dim, in_dim):
        return (rng.standard_normal(
            (out_dim, in_dim)) / math.sqrt(in_dim)).astype(np.float32)

    layers = []
    for i in range(cfg.layers):
        kvh = cfg.kv_heads[i]
        layer = {
            "ln1_w": 1.0 + 0.02 * rng.standard_normal(h).astype(np.float32),
            "ln2_w": 1.0 + 0.02 * rng.standard_normal(h).astype(np.float32),
            "q": mat(cfg.heads * hd, h),
            "k": mat(kvh * hd, h),
            "v": mat(kvh * hd, h),
            "o": mat(h, cfg.heads * hd),
        }
        if cfg.norm == "ln":
            layer["ln1_b"] = 0.02 * rng.standard_normal(h).astype(np.float32)
            layer["ln2_b"] = 0.02 * rng.standard_normal(h).astype(np.float32)
        if cfg.qkv_bias:
            for n, dim in (("q_b", cfg.heads * hd), ("k_b", kvh * hd),
                           ("v_b", kvh * hd)):
                layer[n] = 0.05 * rng.standard_normal(dim).astype(np.float32)
        moe = cfg.moe_layers.get(i)
        if moe is None:
            layer.update(gate=mat(cfg.inter, h), up=mat(cfg.inter, h),
                         down=mat(h, cfg.inter))
        else:
            layer["router"] = mat(moe.num_experts, h)
            layer["experts"] = [
                dict(gate=mat(moe.inter, h), up=mat(moe.inter, h),
                     down=mat(h, moe.inter))
                for _ in range(moe.num_experts)
            ]
            if moe.num_shared:
                sf = moe.inter * moe.num_shared
                layer["shared"] = dict(gate=mat(sf, h), up=mat(sf, h),
                                       down=mat(h, sf))
        layers.append(layer)
    out = {
        "embed": mat(cfg.vocab, h),
        "layers": layers,
        "norm_w": 1.0 + 0.02 * rng.standard_normal(h).astype(np.float32),
    }
    if cfg.norm == "ln":
        out["norm_b"] = 0.02 * rng.standard_normal(h).astype(np.float32)
    out["lm_head"] = out["embed"] if cfg.tie_embeddings else mat(cfg.vocab, h)
    return out


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _rms(x, w, eps):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _rope(x, pos, style, rotary_dim, base):
    """x: [B, T, nH, hd]; pos: [T]."""
    rd = rotary_dim
    inv = 1.0 / base**(np.arange(0, rd, 2, dtype=np.float32) / rd)
    freqs = pos[:, None].astype(np.float32) * inv[None, :]  # [T, rd/2]
    cos = np.cos(freqs)[None, :, None, :]
    sin = np.sin(freqs)[None, :, None, :]
    rot, rest = x[..., :rd], x[..., rd:]
    if style == "neox":
        x1, x2 = rot[..., :rd // 2], rot[..., rd // 2:]
        rotated = np.concatenate([x1 * cos - x2 * sin,
                                  x2 * cos + x1 * sin], axis=-1)
    else:  # interleaved (gptj/glm)
        e, o = rot[..., 0::2], rot[..., 1::2]
        re = e * cos - o * sin
        ro = o * cos + e * sin
        rotated = np.stack([re, ro], axis=-1).reshape(rot.shape)
    return np.concatenate([rotated, rest], axis=-1)


def alibi_slopes(n: int) -> np.ndarray:
    closest = 2**math.floor(math.log2(n))
    base = 2**(-(2**-(math.log2(closest) - 3)))
    slopes = [base**p for p in range(1, closest + 1)]
    if closest != n:
        extra_base = 2**(-(2**-(math.log2(2 * closest) - 3)))
        slopes += [extra_base**(2 * p + 1)
                   for p in range(min(closest, n - closest))]
    return np.asarray(slopes, dtype=np.float32)


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _mlp(x, w):
    return _silu(x @ w["gate"].T) * (x @ w["up"].T) @ w["down"].T


def _moe(x, layer, moe: MoECfg):
    flat = x.reshape(-1, x.shape[-1])
    logits = flat @ layer["router"].T                    # [N, E]
    scores = np.exp(logits - logits.max(-1, keepdims=True))
    scores /= scores.sum(-1, keepdims=True)
    top = np.argsort(-scores, axis=-1)[:, :moe.top_k]    # [N, k]
    out = np.zeros_like(flat)
    for n in range(flat.shape[0]):
        w_sel = scores[n, top[n]]
        if moe.renormalize:
            w_sel = w_sel / w_sel.sum()
        for w_e, e in zip(w_sel, top[n]):
            out[n] += w_e * _mlp(flat[n:n + 1], layer["experts"][e])[0]
    if moe.num_shared:
        out += _mlp(flat, layer["shared"])
    return out.reshape(x.shape)


def ref_logits(cfg: RefCfg, W: dict, ids: np.ndarray) -> np.ndarray:
    """ids: [B, T] -> fp32 logits [B, T, vocab]."""
    B, T = ids.shape
    h, hd, nh = cfg.hidden, cfg.head_dim, cfg.heads
    pos = np.arange(T)
    x = W["embed"][ids]

    causal = np.tril(np.ones((T, T), dtype=bool))
    if cfg.alibi:
        slopes = alibi_slopes(nh)
        # bias[h, i, j] = slope_h * (j - i); row-shift-equivalent to the
        # bloom absolute-key-position convention.
        rel = (pos[None, :] - pos[:, None]).astype(np.float32)
        alibi_bias = slopes[:, None, None] * rel[None]
    else:
        alibi_bias = None

    for i, layer in enumerate(W["layers"]):
        kvh = cfg.kv_heads[i]
        if cfg.norm == "rms":
            a = _rms(x, layer["ln1_w"], cfg.eps)
        else:
            a = _ln(x, layer["ln1_w"], layer["ln1_b"], cfg.eps)
        q = a @ layer["q"].T + layer.get("q_b", 0.0)
        k = a @ layer["k"].T + layer.get("k_b", 0.0)
        v = a @ layer["v"].T + layer.get("v_b", 0.0)
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, T, kvh, hd)
        v = v.reshape(B, T, kvh, hd)
        if cfg.rope is not None:
            style, rd, base = cfg.rope
            rd = rd or hd
            q = _rope(q, pos, style, rd, base)
            k = _rope(k, pos, style, rd, base)
        group = nh // kvh
        k = np.repeat(k, group, axis=2)
        v = np.repeat(v, group, axis=2)
        s = np.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if alibi_bias is not None:
            s = s + alibi_bias[None]
        s = np.where(causal[None, None], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        attn = np.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, nh * hd)
        x = x + attn @ layer["o"].T

        if cfg.norm == "rms":
            m = _rms(x, layer["ln2_w"], cfg.eps)
        else:
            m = _ln(x, layer["ln2_w"], layer["ln2_b"], cfg.eps)
        moe = cfg.moe_layers.get(i)
        x = x + (_mlp(m, layer) if moe is None else _moe(m, layer, moe))

    if cfg.norm == "rms":
        x = _rms(x, W["norm_w"], cfg.eps)
    else:
        x = _ln(x, W["norm_w"], W["norm_b"], cfg.eps)
    return x @ W["lm_head"].T
