"""Vocab-width int8 LM-head shape on real hardware.

Pins the r3 regression: `quant_matmul_int8` at the full-vocab head shape
(K=4096, N=32000, f32 out) chose a weight tile whose double-buffered
pipeline needs 25.8 MB of scoped VMEM and failed to COMPILE on-chip —
invisible to the CPU suite because interpret-mode Pallas skips Mosaic's
VMEM accounting entirely (BENCH_r03.json rc=1).  Runs only under
VST_TEST_REAL_TPU=1; correctness is vs the dense dequant oracle."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.quant_matmul import quant_matmul_int8

pytestmark = pytest.mark.skipif(
    os.environ.get("VST_TEST_REAL_TPU", "0") != "1"
    or jax.devices()[0].platform != "tpu",
    reason="vocab-width scoped-VMEM behavior only exists on real Mosaic")


@pytest.mark.parametrize("m", [1, 24, 128])
def test_vocab_width_int8_head_compiles_and_matches(m):
    k, n = 4096, 32000
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k) * 0.05, jnp.bfloat16)
    qw = jnp.asarray(rng.randint(-127, 128, size=(k, n)), jnp.int8)
    sc = jnp.asarray(rng.rand(1, n) * 2e-4 + 1e-4, jnp.float32)

    got = quant_matmul_int8(x, qw, sc, out_dtype=jnp.float32)
    got.block_until_ready()          # the r3 failure was at compile time

    want = jnp.dot(x.astype(jnp.float32),
                   qw.astype(jnp.float32) * sc.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
