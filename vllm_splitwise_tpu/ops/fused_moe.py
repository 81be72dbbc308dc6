"""Mixture-of-Experts compute (reference role:
vllm/model_executor/layers/fused_moe/fused_moe.py Triton grouped GEMM +
csrc/moe topk kernels, and quant_fused_moe.py for GPTQ/AWQ experts).

TPU-native design: routing is jax top_k (the reference's
topk_softmax CUDA kernel is two XLA ops here), and expert FFNs run as ONE
batched einsum over stacked [E, H, F] weights with a [T, E] combine
matrix — dense-dispatch.  On the MXU a batched matmul at decode batch
sizes costs about the same as the gathered variant (both stream every
expert's weights from HBM once; weight streaming, not FLOPs, is the
bound), while avoiding sort/scatter ops XLA handles poorly.  Prefill
(T >= 128) routes to the grouped Pallas ragged matmul
(ops/grouped_matmul.py) where FLOPs dominate and dense dispatch would
cost E/topk x extra.

Quantized experts (per-expert pack2G int4 / int8 dicts) take the
per-expert loop path through layers.linear.dense — the reference's
group_gptq_gemm / awq_group_gemm analog.
"""
from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp


def fused_topk(
    gating_logits: jax.Array,  # [T, E] (any float dtype)
    topk: int,
    renormalize: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (topk_weights [T, k] f32, topk_ids [T, k] i32) — the role
    of the reference's fused_topk (fused_moe.py:256) / topk_softmax CUDA
    kernel."""
    probs = jax.nn.softmax(gating_logits.astype(jnp.float32), axis=-1)
    topk_weights, topk_ids = jax.lax.top_k(probs, topk)
    if renormalize:
        topk_weights = topk_weights / jnp.sum(topk_weights, axis=-1,
                                              keepdims=True)
    return topk_weights, topk_ids.astype(jnp.int32)


def _combine_matrix(topk_weights: jax.Array, topk_ids: jax.Array,
                    num_experts: int) -> jax.Array:
    """[T,k] weights/ids -> [T, E] combine matrix (0 for unrouted)."""
    one_hot = jax.nn.one_hot(topk_ids, num_experts,
                             dtype=topk_weights.dtype)  # [T, k, E]
    return jnp.einsum("tk,tke->te", topk_weights, one_hot)


def fused_moe(
    x: jax.Array,              # [T, H]
    gate_w,                    # [H, E] router weight (dense)
    w1,                        # [E, H, F] stacked, or list of E dicts/arrays
    w3,                        # [E, H, F] (None for non-GLU experts)
    w2,                        # [E, F, H]
    topk: int,
    act_fn: Callable[[jax.Array], jax.Array],
    renormalize: bool = True,
) -> jax.Array:
    """out[t] = sum_e combine[t,e] * FFN_e(x[t]).

    GLU experts: FFN_e(x) = (act(x@w1_e) * (x@w3_e)) @ w2_e; with w3=None
    the plain two-matmul FFN is used.
    """
    num_experts = gate_w.shape[-1] if not isinstance(gate_w, dict) else None
    gating = jnp.dot(x, gate_w) if not isinstance(gate_w, dict) else None
    if gating is None:
        raise ValueError("router weight must be dense")
    topk_weights, topk_ids = fused_topk(gating, topk, renormalize)
    combine = _combine_matrix(topk_weights, topk_ids,
                              num_experts).astype(x.dtype)  # [T, E]

    if isinstance(w1, dict):
        # Stacked quantized experts: grouped fused dequant+matmul over
        # expert-sorted tiles (the fork's group_gptq_gemm /
        # awq_group_gemm role) — 3 kernel dispatches per layer instead
        # of 3E.
        from vllm_splitwise_tpu.ops.grouped_matmul import \
            fused_moe_grouped_quant
        return fused_moe_grouped_quant(
            x, w1, w3, w2, topk_weights, topk_ids, act_fn,
            interpret=jax.default_backend() not in ("tpu", ))

    if isinstance(w1, (list, tuple)):
        # Quantized / per-expert path (non-uniform or act-ordered
        # experts): E separate fused dequant matmuls.
        from vllm_splitwise_tpu.layers.linear import dense
        out = jnp.zeros_like(x)
        for e in range(len(w1)):
            h1 = dense(x, w1[e])
            inner = act_fn(h1) * dense(x, w3[e]) if w3 is not None \
                else act_fn(h1)
            out = out + combine[:, e:e + 1] * dense(inner, w2[e])
        return out

    t = x.shape[0]
    # Grouped work ~ (t*topk + E*128) row-matmuls vs dense dispatch's
    # t*E: route grouped only where it actually does fewer FLOPs (plus
    # sort/scatter overhead margin).
    grouped_wins = (t * topk + num_experts * 128) * 2 < t * num_experts
    if grouped_wins and jax.default_backend() == "tpu" and \
            w1.shape[1] % 128 == 0 and w1.shape[2] % 128 == 0:
        # Prefill-size batches are FLOPs-bound: the grouped (ragged)
        # Pallas matmul computes only routed (token, expert) pairs.
        from vllm_splitwise_tpu.ops.grouped_matmul import fused_moe_grouped
        return fused_moe_grouped(x, w1, w3, w2, topk_weights, topk_ids,
                                 act_fn)

    # Dense-dispatch batched path.
    h1 = jnp.einsum("th,ehf->etf", x, w1)
    if w3 is not None:
        inner = act_fn(h1) * jnp.einsum("th,ehf->etf", x, w3)
    else:
        inner = act_fn(h1)
    expert_out = jnp.einsum("etf,efh->eth", inner, w2)
    return jnp.einsum("eth,te->th", expert_out, combine.astype(
        expert_out.dtype)).astype(x.dtype)
