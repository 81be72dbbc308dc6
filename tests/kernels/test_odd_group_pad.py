"""Odd group-count int4 weights (e.g. llama-1b's K=5504 at g128 -> 43
groups): to_internal_int4 appends a phantom zero group and dense()
zero-pads the activation K dim; results must equal the dense fp
matmul of the dequantized weight."""
import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.layers.linear import dense
from vllm_splitwise_tpu.ops.quant_loaders import (quantize_int4,
                                                  to_internal_int4)

def test_odd_group_count_matches_dequant():
    rng = np.random.RandomState(0)
    k, n, g = 96, 64, 32  # ng = 3 (odd)
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    w_int, scales, zeros = quantize_int4(w, g)
    params = to_internal_int4(w_int, scales, zeros)
    assert params["qweight"].shape[0] == (k + g) // 2
    assert params["scales"].shape[0] == 4

    deq = ((w_int.astype(np.float32) - np.repeat(zeros, g, axis=0)) *
           np.repeat(scales, g, axis=0))
    x = rng.standard_normal((5, k)).astype(np.float32)
    want = x @ deq

    got = dense(jnp.asarray(x, dtype=jnp.float32),
                {k2: jnp.asarray(v) for k2, v in params.items()})
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2,
                               atol=2e-2)
