"""HF quantized-checkpoint tensor conversion (host side, load time).

Unpacks AutoGPTQ / AWQ / SqueezeLLM serialized tensors into this
framework's internal layouts (see ops/quant_matmul.py pack2G docstring).
Covers the role of the reference's in-kernel format handling
(csrc/quantization/gptq/q_gemm.cu nibble math, awq/dequantize.cuh
interleave, squeezellm LUT): we pay the format tax ONCE at load time so
the hot kernel reads a layout designed for the TPU memory system.

Format conventions implemented (AutoGPTQ >= 0.4 / llm-awq):
* GPTQ: qweight int32 [K/8, N], k = row*8 + i at bits [4i, 4i+4);
  qzeros int32 [K/G, N/8] same nibble order along N, stored zero MINUS 1
  (the AutoGPTQ off-by-one); scales f16 [K/G, N]; g_idx [K] maps k->group
  (non-trivial only under desc_act).
* AWQ: qweight int32 [K, N/8] with nibble order [0,4,1,5,2,6,3,7] along
  N; qzeros int32 [K/G, N/8] same order; scales f16 [K/G, N]; zeros used
  as-is.
* SqueezeLLM: qweight int32 [K/8, N] (GPTQ nibble order), lookup_table
  f16 [N, 16].
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from vllm_splitwise_tpu.ops.quant_matmul import pack_int4

AWQ_ORDER = np.array([0, 4, 1, 5, 2, 6, 3, 7])


def _unpack_rows_int32(packed: np.ndarray, bits: int = 4) -> np.ndarray:
    """int32 [R/f, C] -> uint8 [R, C] (values packed along dim 0,
    sequential nibble order)."""
    assert bits in (2, 4, 8)
    factor = 32 // bits
    mask = (1 << bits) - 1
    p = packed.astype(np.uint32)
    out = np.empty((p.shape[0] * factor, p.shape[1]), dtype=np.uint8)
    for i in range(factor):
        out[i::factor] = (p >> (bits * i)) & mask
    # Row r*factor+i of `out` currently holds nibble i of word r — that IS
    # k = r*factor + i, so the interleaved assignment above is correct.
    return out


def _unpack_cols_int32(packed: np.ndarray, bits: int = 4,
                       order: Optional[np.ndarray] = None) -> np.ndarray:
    """int32 [R, C/f] -> uint8 [R, C] (values packed along dim 1)."""
    assert bits in (2, 4, 8)
    factor = 32 // bits
    mask = (1 << bits) - 1
    p = packed.astype(np.uint32)
    out = np.empty((p.shape[0], p.shape[1] * factor), dtype=np.uint8)
    idx = order if order is not None else np.arange(factor)
    for j in range(factor):
        out[:, j::factor] = (p >> (bits * int(idx[j]))) & mask
    return out


def unpack_gptq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    g_idx: Optional[np.ndarray],
    bits: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
    """Returns (w_int [K, N] uint8, scales [K/G, N] f32,
    zeros [K/G, N] f32, perm-or-None)."""
    w_int = _unpack_rows_int32(qweight, bits)
    zeros = _unpack_cols_int32(qzeros, bits).astype(np.float32) + 1.0
    scales = scales.astype(np.float32)
    k = w_int.shape[0]
    num_groups = scales.shape[0]
    group_size = k // num_groups
    perm = None
    if g_idx is not None and g_idx.size == k:
        expected = np.arange(k) // group_size
        if not np.array_equal(g_idx, expected):
            # desc_act: reorder K rows so groups are contiguous; the
            # runtime must apply `perm` to the activation K dim.
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            w_int = w_int[perm]
    return w_int, scales, zeros, perm


def unpack_awq(
    qweight: np.ndarray,
    qzeros: np.ndarray,
    scales: np.ndarray,
    bits: int = 4,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    w_int = _unpack_cols_int32(qweight, bits, AWQ_ORDER)
    zeros = _unpack_cols_int32(qzeros, bits, AWQ_ORDER).astype(np.float32)
    return w_int, scales.astype(np.float32), zeros


def unpack_squeezellm(qweight: np.ndarray,
                      lookup_table: np.ndarray) -> np.ndarray:
    """Returns dense w [K, N] f32 via per-channel LUT (the LUT destroys
    the affine structure, so SqueezeLLM dequantizes at load time into the
    dense/int8 path rather than the int4 kernel)."""
    w_int = _unpack_rows_int32(qweight, 4)  # [K, N]
    k, n = w_int.shape
    return lookup_table.astype(np.float32)[np.arange(n)[None, :],
                                           w_int.astype(np.int64)]


# ---------------------------------------------------------------------------
# Internal-format conversion + synthetic quantizers (dummy loads, tests)
# ---------------------------------------------------------------------------


def to_internal_int4(w_int: np.ndarray, scales: np.ndarray,
                     zeros: np.ndarray,
                     dtype=np.float32) -> Dict[str, np.ndarray]:
    """(unpacked HF tensors) -> internal pack2G param dict.

    pack2G pairs k-groups two-per-band, so an ODD group count (e.g.
    K=5504 at g128 -> 43 groups, the llama-1b MLP) gets one phantom
    zero group appended: scale 0 makes its contribution exactly 0, and
    the matmul wrapper zero-pads the activation K dim to match
    (layers/linear.py)."""
    k, n = w_int.shape
    ng = scales.shape[0]
    group_size = k // ng
    if ng % 2 == 1:
        w_int = np.concatenate(
            [w_int, np.zeros((group_size, n), w_int.dtype)], axis=0)
        scales = np.concatenate([scales, np.zeros((1, n), scales.dtype)],
                                axis=0)
        zeros = np.concatenate([zeros, np.zeros((1, n), zeros.dtype)],
                               axis=0)
    return {
        "qweight": pack_int4(w_int, group_size),
        "scales": scales.astype(dtype),
        "zeros": zeros.astype(dtype),
    }


def quantize_int4(w: np.ndarray, group_size: int = 128
                  ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Asymmetric per-group int4 quantization of a dense [K, N] weight.
    Returns (w_int uint8 [K,N], scales [K/G,N], zeros [K/G,N])."""
    k, n = w.shape
    assert k % group_size == 0
    g = w.reshape(k // group_size, group_size, n)
    w_min = g.min(axis=1)
    w_max = g.max(axis=1)
    scales = np.maximum((w_max - w_min) / 15.0, 1e-10)
    zeros = np.round(-w_min / scales).clip(0, 15)
    q = np.round(g / scales[:, None, :] + zeros[:, None, :]).clip(0, 15)
    return (q.reshape(k, n).astype(np.uint8), scales.astype(np.float32),
            zeros.astype(np.float32))


def quantize_int8(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8. Returns (qweight int8 [K,N],
    scales [1,N])."""
    scales = np.maximum(np.abs(w).max(axis=0, keepdims=True) / 127.0, 1e-10)
    q = np.round(w / scales).clip(-128, 127).astype(np.int8)
    return q, scales.astype(np.float32)


# HF-format re-packers (round-trip tests + synthetic checkpoints).


def pack_gptq_hf(w_int: np.ndarray, zeros: np.ndarray,
                 bits: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    """(w_int [K,N], zeros [K/G,N]) -> (qweight int32 [K/8,N],
    qzeros int32 [K/G,N/8]) in AutoGPTQ serialization."""
    factor = 32 // bits
    k, n = w_int.shape
    qweight = np.zeros((k // factor, n), dtype=np.uint32)
    for i in range(factor):
        qweight |= w_int[i::factor].astype(np.uint32) << (bits * i)
    z_store = (zeros - 1.0).astype(np.uint32).clip(0, 15)
    qzeros = np.zeros((z_store.shape[0], n // factor), dtype=np.uint32)
    for j in range(factor):
        qzeros |= z_store[:, j::factor] << (bits * j)
    return qweight.view(np.int32), qzeros.view(np.int32)


def pack_awq_hf(w_int: np.ndarray, zeros: np.ndarray,
                bits: int = 4) -> Tuple[np.ndarray, np.ndarray]:
    factor = 32 // bits
    k, n = w_int.shape
    qweight = np.zeros((k, n // factor), dtype=np.uint32)
    qzeros = np.zeros((zeros.shape[0], n // factor), dtype=np.uint32)
    z_store = zeros.astype(np.uint32).clip(0, 15)
    for j in range(factor):
        shift = bits * int(AWQ_ORDER[j])
        qweight |= w_int[:, j::factor].astype(np.uint32) << shift
        qzeros |= z_store[:, j::factor] << shift
    return qweight.view(np.int32), qzeros.view(np.int32)


# ---------------------------------------------------------------------------
# Marlin (IST-DASLab W4A16) serialization.  The reference runs these
# checkpoints through a dedicated CUDA GEMM (csrc/quantization/marlin/
# marlin_cuda_kernel.cu); here the tile/thread permutation is inverted
# ONCE at load time and the weights flow through the same int4 Pallas
# kernel as GPTQ/AWQ.
# ---------------------------------------------------------------------------

_MARLIN_PERMS = None


def _marlin_perms():
    """The marlin kernel's weight/scale permutations (mirrors
    marlin/__init__.py _get_perms in the upstream repo)."""
    global _MARLIN_PERMS
    if _MARLIN_PERMS is not None:
        return _MARLIN_PERMS
    perm = []
    for i in range(32):
        perm1 = []
        col = i // 4
        for block in (0, 1):
            for row in (2 * (i % 4), 2 * (i % 4) + 1, 2 * (i % 4) + 8,
                        2 * (i % 4) + 9):
                perm1.append(16 * row + col + 8 * block)
        for j in range(4):
            perm.extend(p + 256 * j for p in perm1)
    perm = np.asarray(perm)
    interleave = np.array([0, 2, 4, 6, 1, 3, 5, 7])
    perm = perm.reshape((-1, 8))[:, interleave].ravel()
    scale_perm = np.asarray(
        [i + 8 * j for i in range(8) for j in range(8)])
    scale_perm_single = np.asarray(
        [2 * i + j for i in range(4) for j in (0, 1, 8, 9, 16, 17, 24, 25)])
    _MARLIN_PERMS = (perm, scale_perm, scale_perm_single)
    return _MARLIN_PERMS


def unpack_marlin(
    qweight: np.ndarray,   # int32 [K/16, N*16/8]
    scales: np.ndarray,    # f16 [K/G, N] (or [1, N] channelwise)
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Invert marlin's tile permutation.  Returns (w_int uint8 [K, N]
    with zero point 8, scales f32 [K/G, N], zeros f32 [K/G, N] == 8)."""
    perm, scale_perm, scale_perm_single = _marlin_perms()
    p = qweight.astype(np.uint32)
    kt, cols = p.shape
    res = np.empty((kt, cols * 8), dtype=np.uint8)
    for i in range(8):
        res[:, i::8] = (p >> (4 * i)) & 0xF
    inv = np.argsort(perm)
    res = res.reshape(-1, perm.size)[:, inv].reshape(kt, -1)
    k = kt * 16
    n = res.shape[1] // 16
    w_int = res.reshape(kt, n // 16, 16, 16).transpose(0, 2, 1,
                                                       3).reshape(k, n)

    s = scales.astype(np.float32)
    sp = scale_perm if s.shape[0] > 1 else scale_perm_single
    s = s.reshape(-1, sp.size)[:, np.argsort(sp)].reshape(s.shape[0], n)
    if s.shape[0] == 1 and k > 128:
        # Channelwise (group_size -1): expand to 128-groups so the
        # banded-metadata pack sees an even group count.
        s = np.repeat(s, k // 128, axis=0)
    zeros = np.full_like(s, 8.0)
    return w_int, s, zeros


def pack_marlin_hf(w_int: np.ndarray,
                   scales: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(w_int [K,N] uint8 zero-point-8, scales [K/G,N]) -> marlin
    serialization (B int32 [K/16, N*16/8], s f16 [K/G, N]) — mirrors the
    upstream pack() for round-trip tests / synthetic checkpoints."""
    perm, scale_perm, scale_perm_single = _marlin_perms()
    k, n = w_int.shape
    res = w_int.reshape(k // 16, 16, n // 16, 16).transpose(
        0, 2, 1, 3).reshape(k // 16, n * 16)
    res = res.reshape(-1, perm.size)[:, perm].reshape(k // 16, n * 16)
    q = np.zeros((k // 16, n * 16 // 8), dtype=np.uint32)
    for i in range(8):
        q |= res[:, i::8].astype(np.uint32) << (4 * i)
    s = scales.astype(np.float16)
    sp = scale_perm if s.shape[0] > 1 else scale_perm_single
    s = s.reshape(-1, sp.size)[:, sp].reshape(s.shape[0], n)
    return q.view(np.int32), s
