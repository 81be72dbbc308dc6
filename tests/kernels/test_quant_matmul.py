"""Quantization kernel + loader tests (reference pattern:
tests/kernels/test_dequant.py, vs-oracle kernel tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.quant_loaders import (pack_awq_hf, pack_gptq_hf,
                                                  quantize_int4,
                                                  quantize_int8, unpack_awq,
                                                  unpack_gptq)
from vllm_splitwise_tpu.ops.quant_matmul import (dequant_int4, pack_int4,
                                                 quant_matmul_int4,
                                                 quant_matmul_int4_reference,
                                                 quant_matmul_int8,
                                                 unpack_int4)


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randint(0, 16, size=(512, 64)).astype(np.uint8)
    packed = pack_int4(w, group_size=128)
    assert packed.shape == (256, 64) and packed.dtype == np.int8
    np.testing.assert_array_equal(unpack_int4(packed, 128), w)


def test_quantize_int4_accuracy():
    rng = np.random.RandomState(1)
    w = rng.standard_normal((512, 96)).astype(np.float32)
    w_int, scales, zeros = quantize_int4(w, group_size=64)
    deq = np.asarray(
        dequant_int4(jnp.asarray(pack_int4(w_int, 64)),
                     jnp.asarray(scales), jnp.asarray(zeros), 64,
                     dtype=jnp.float32))
    err = np.abs(deq - w).max()
    # int4 with 64-wide groups: max error ~ scale/2 ~ range/30.
    assert err < np.abs(w).max() / 6


@pytest.mark.parametrize("group_size", [64, 128])
def test_gptq_hf_roundtrip(group_size):
    rng = np.random.RandomState(2)
    k, n = 256, 128
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_int, scales, zeros = quantize_int4(w, group_size)
    qweight, qzeros = pack_gptq_hf(w_int, zeros)
    g_idx = (np.arange(k) // group_size).astype(np.int32)
    w2, s2, z2, perm = unpack_gptq(qweight, qzeros,
                                   scales.astype(np.float16), g_idx)
    assert perm is None
    np.testing.assert_array_equal(w2, w_int)
    np.testing.assert_allclose(s2, scales, rtol=1e-3)
    np.testing.assert_array_equal(z2, zeros)


def test_gptq_desc_act_perm():
    rng = np.random.RandomState(5)
    k, n, g = 256, 64, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_int, scales, zeros = quantize_int4(w, g)
    qweight, qzeros = pack_gptq_hf(w_int, zeros)
    # Shuffled act-order: g_idx maps k -> group, non-monotone.
    perm_src = rng.permutation(k)
    g_idx = (perm_src // g).astype(np.int32)
    w2, _, _, perm = unpack_gptq(qweight, qzeros,
                                 scales.astype(np.float16), g_idx)
    assert perm is not None
    # Rows reordered so that groups are contiguous.
    assert np.array_equal(np.sort(g_idx[perm], kind="stable"),
                          g_idx[perm])


def test_awq_hf_roundtrip():
    rng = np.random.RandomState(3)
    k, n, g = 128, 64, 64
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_int, scales, zeros = quantize_int4(w, g)
    qweight, qzeros = pack_awq_hf(w_int, zeros)
    w2, s2, z2 = unpack_awq(qweight, qzeros, scales.astype(np.float16))
    np.testing.assert_array_equal(w2, w_int)
    np.testing.assert_array_equal(z2, zeros)


@pytest.mark.parametrize("m", [1, 8, 100])
@pytest.mark.parametrize("group_size", [64, 128])
def test_quant_matmul_int4_vs_reference(m, group_size):
    """Pallas kernel (interpret mode off-TPU) vs XLA dequant oracle."""
    rng = np.random.RandomState(4)
    k, n = 512, 256
    w = rng.standard_normal((k, n)).astype(np.float32) / np.sqrt(k)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w_int, scales, zeros = quantize_int4(w, group_size)
    qw = jnp.asarray(pack_int4(w_int, group_size))
    s = jnp.asarray(scales)
    z = jnp.asarray(zeros)
    xb = jnp.asarray(x, dtype=jnp.bfloat16)

    ref = quant_matmul_int4_reference(xb, qw, s, z, group_size)
    out = quant_matmul_int4(xb, qw, s, z, group_size=group_size,
                            interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref, dtype=np.float32),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("m", [1, 16])
def test_quant_matmul_int8_vs_reference(m):
    rng = np.random.RandomState(6)
    k, n = 384, 256
    w = rng.standard_normal((k, n)).astype(np.float32) / np.sqrt(k)
    x = rng.standard_normal((m, k)).astype(np.float32)
    qweight, scales = quantize_int8(w)
    ref = x @ (qweight.astype(np.float32) * scales)
    out = quant_matmul_int8(jnp.asarray(x, dtype=jnp.bfloat16),
                            jnp.asarray(qweight), jnp.asarray(scales),
                            interpret=jax.default_backend() != "tpu")
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32), ref,
                               atol=3e-2, rtol=3e-2)


def test_dense_dispatch_quant_dict():
    """layers.linear.dense routes dict weights through the quant path."""
    from vllm_splitwise_tpu.layers.linear import dense
    rng = np.random.RandomState(7)
    k, n, g = 256, 128, 128
    w = rng.standard_normal((k, n)).astype(np.float32) / np.sqrt(k)
    x = rng.standard_normal((3, 5, k)).astype(np.float32)
    w_int, scales, zeros = quantize_int4(w, g)
    wq = {
        "qweight": jnp.asarray(pack_int4(w_int, g)),
        "scales": jnp.asarray(scales),
        "zeros": jnp.asarray(zeros),
    }
    out = dense(jnp.asarray(x), wq)
    assert out.shape == (3, 5, n)
    deq = np.asarray(dequant_int4(wq["qweight"], wq["scales"], wq["zeros"],
                                  g, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), x @ deq, atol=2e-2,
                               rtol=2e-2)


def test_int4_mxu_stacked_matches_dequant_kernel():
    """W4A8 path (int8 activations through the MXU) tracks the bf16
    dequant kernel within activation-quantization error."""
    from vllm_splitwise_tpu.ops.quant_matmul import (
        pack_int4, pack_sz_bands, quant_matmul_int4_mxu_stacked,
        quant_matmul_int4_stacked)

    rng = np.random.RandomState(0)
    L, m, k, n, g = 2, 8, 256, 384, 32
    w_int = rng.randint(0, 16, size=(L, k, n))
    scales = rng.rand(L, k // g, n).astype(np.float32) * 0.02 + 0.01
    zeros = rng.randint(0, 16, size=(L, k // g, n)).astype(np.float32)
    qw = jnp.asarray(np.stack([pack_int4(w_int[l], g) for l in range(L)]))
    sz = pack_sz_bands(jnp.asarray(scales), jnp.asarray(zeros), g)
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.float32)

    for l in range(L):
        ref = quant_matmul_int4_stacked(x, qw, sz, jnp.int32(l),
                                        group_size=g, interpret=True)
        got = quant_matmul_int4_mxu_stacked(x, qw, sz, jnp.int32(l),
                                            group_size=g, interpret=True)
        r = np.asarray(ref, dtype=np.float64)
        o = np.asarray(got, dtype=np.float64)
        rel = np.abs(o - r).max() / (np.abs(r).max() + 1e-9)
        assert rel < 0.02, rel
