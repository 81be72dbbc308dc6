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
