"""Grouped (ragged) expert matmul vs the dense-dispatch MoE oracle
(reference role: the fused_moe Triton kernel + moe_align_block_size)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.fused_moe import fused_moe, fused_topk
from vllm_splitwise_tpu.ops.grouped_matmul import (fused_moe_grouped,
                                                   grouped_matmul,
                                                   moe_align)


def _on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def test_moe_align_roundtrip():
    rng = np.random.RandomState(0)
    t, k, e = 37, 2, 8
    ids = jnp.asarray(rng.randint(0, e, size=(t, k)), jnp.int32)
    src, expert_per_tile, dest, counts = moe_align(ids, e, tile=128)
    src = np.asarray(src)
    dest = np.asarray(dest)
    ept = np.asarray(expert_per_tile)
    flat = np.asarray(ids).reshape(-1)
    # every flat pair lands in a tile owned by its expert
    for i in range(t * k):
        d = dest[i]
        assert src[d] == i
        assert ept[d // 128] == flat[i]
    # padding rows are -1
    assert (src < 0).sum() == src.size - t * k


@pytest.mark.parametrize("t", [16, 100])
def test_grouped_matches_dense_dispatch(t):
    rng = np.random.RandomState(1)
    e, h, f, k = 4, 128, 512, 2
    x = jnp.asarray(rng.randn(t, h) * 0.3, jnp.float32)
    gate = jnp.asarray(rng.randn(h, e) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(e, h, f) * 0.05, jnp.float32)
    w3 = jnp.asarray(rng.randn(e, h, f) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.randn(e, f, h) * 0.05, jnp.float32)
    act = jax.nn.silu

    ref = fused_moe(x, gate, w1, w3, w2, k, act)

    tw, ti = fused_topk(jnp.dot(x, gate), k)
    out = fused_moe_grouped(x, w1, w3, w2, tw, ti, act,
                            interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_grouped_matmul_expert_blocks():
    """Rows of each tile multiply exactly their tile's expert weights."""
    rng = np.random.RandomState(2)
    e, h, f = 3, 128, 512
    w = jnp.asarray(rng.randn(e, h, f) * 0.1, jnp.float32)
    tkp = 128 * 4
    x = jnp.asarray(rng.randn(tkp, h) * 0.3, jnp.float32)
    ept = jnp.asarray([0, 2, 2, 1], jnp.int32)
    out = grouped_matmul(x, w, ept, interpret=not _on_tpu())
    for tile in range(4):
        rows = slice(tile * 128, (tile + 1) * 128)
        want = np.asarray(x[rows]) @ np.asarray(w[int(ept[tile])])
        np.testing.assert_allclose(np.asarray(out[rows]), want, atol=2e-3,
                                   rtol=2e-3)


def test_grouped_quant_moe_matches_per_expert_loop():
    """Stacked int4 experts through the grouped quant kernel must match
    the per-expert dequant-matmul loop (the fork's group_gptq_gemm
    parity check)."""
    from vllm_splitwise_tpu.ops.grouped_matmul import (
        fused_moe_grouped_quant, stack_expert_quant)
    from vllm_splitwise_tpu.ops.quant_loaders import (quantize_int4,
                                                      to_internal_int4)

    rng = np.random.RandomState(3)
    e, h, f, k, t = 4, 128, 512, 2, 24
    act = jax.nn.silu
    experts_w1, experts_w3, experts_w2 = [], [], []
    dicts_w1, dicts_w3, dicts_w2 = [], [], []
    for _ in range(e):
        for dim_in, dim_out, dense_l, dict_l in (
                (h, f, experts_w1, dicts_w1),
                (h, f, experts_w3, dicts_w3),
                (f, h, experts_w2, dicts_w2)):
            w = rng.standard_normal((dim_in, dim_out)).astype(
                np.float32) / np.sqrt(dim_in)
            wi, sc, zr = quantize_int4(w, 64)
            dict_l.append({kk: jnp.asarray(vv) for kk, vv in
                           to_internal_int4(wi, sc, zr).items()})
            # dequantized dense equivalent for the oracle
            deq = (wi.astype(np.float32) -
                   np.repeat(zr, 64, axis=0)) * np.repeat(sc, 64, axis=0)
            dense_l.append(deq)

    x = jnp.asarray(rng.standard_normal((t, h)).astype(np.float32) * 0.3)
    gating = jnp.asarray(rng.standard_normal((t, e)).astype(np.float32))
    from vllm_splitwise_tpu.ops.fused_moe import fused_topk
    tw, ti = fused_topk(gating, k)

    # Oracle: dense dequantized weights, token-by-token.
    want = np.zeros((t, h), np.float32)
    twn, tin = np.asarray(tw), np.asarray(ti)
    for tok in range(t):
        for j in range(k):
            ee = int(tin[tok, j])
            xi = np.asarray(x[tok])
            inner = (np.asarray(jax.nn.silu(xi @ experts_w1[ee])) *
                     (xi @ experts_w3[ee]))
            want[tok] += twn[tok, j] * (inner @ experts_w2[ee])

    sw1 = stack_expert_quant(dicts_w1)
    sw3 = stack_expert_quant(dicts_w3)
    sw2 = stack_expert_quant(dicts_w2)
    assert sw1 is not None and sw1["qweight"].shape[0] == e
    out = fused_moe_grouped_quant(x, sw1, sw3, sw2, tw, ti, act,
                                  interpret=not _on_tpu())
    np.testing.assert_allclose(np.asarray(out), want, atol=5e-3, rtol=5e-3)
