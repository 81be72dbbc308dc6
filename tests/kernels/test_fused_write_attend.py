"""Fused write+attend decode kernel: merging the fresh K/V row into the
VMEM chunk + aliased page writeback must equal the two-kernel baseline
(separate cache write, then attention) bit-for-bit on the cache and
numerically on the output."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.paged_attention import (paged_attention,
                                                    paged_attention_reference)


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _write_reference(k_pages, v_pages, k_new, v_new, slots, page_size,
                     layer=None):
    """Oracle cache write: scatter each row at (page, off); -1 skips."""
    k_pages = np.array(k_pages)
    v_pages = None if v_pages is None else np.array(v_pages)
    for b, slot in enumerate(np.asarray(slots)):
        if slot < 0:
            continue
        logical_page, off = divmod(int(slot), page_size)
        if v_pages is None:  # fused layout: K at 2p, V at 2p+1
            if layer is None:
                k_pages[2 * logical_page, :, off] = k_new[b]
                k_pages[2 * logical_page + 1, :, off] = v_new[b]
            else:
                k_pages[layer, 2 * logical_page, :, off] = k_new[b]
                k_pages[layer, 2 * logical_page + 1, :, off] = v_new[b]
        elif layer is None:
            k_pages[logical_page, :, off] = k_new[b]
            v_pages[logical_page, :, off] = v_new[b]
        else:
            k_pages[layer, logical_page, :, off] = k_new[b]
            v_pages[layer, logical_page, :, off] = v_new[b]
    return k_pages, v_pages


def _make(seed, batch, kvh, group, head_dim, page_size, pages_per_seq,
          num_pages, dtype, identity_tables=True):
    """identity_tables maps logical page p of seq b to physical page
    b*pages_per_seq + p, so the oracle writes by PHYSICAL index."""
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(batch, kvh * group, head_dim),
                    jnp.float32)
    def pages():
        x = rng.randn(num_pages, kvh, page_size, head_dim)
        if dtype == jnp.int8:
            return jnp.asarray(np.round(x * 20), jnp.int8)
        return jnp.asarray(x, dtype)
    bt = np.arange(batch * pages_per_seq, dtype=np.int32).reshape(
        batch, pages_per_seq)
    # Every sequence mid-page so the new token lands at varied offsets.
    cl = rng.randint(2, pages_per_seq * page_size, size=(batch, ))
    slots = np.asarray([bt[b, (cl[b] - 1) // page_size] * page_size +
                        (cl[b] - 1) % page_size for b in range(batch)],
                       np.int32)
    return q, pages, jnp.asarray(bt), jnp.asarray(cl, jnp.int32), slots


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.int8])
@pytest.mark.parametrize("group", [1, 4])
def test_fused_write_attend_matches_two_kernel_baseline(dtype, group):
    batch, kvh, head_dim, page_size, pps = 4, 2, 128, 16, 4
    num_pages = batch * pps + 2  # two never-touched pages at the end
    q, mk, bt, cl, slots = _make(0, batch, kvh, group, head_dim,
                                 page_size, pps, num_pages, dtype)
    kp, vp = mk(), mk()
    rng = np.random.RandomState(7)
    scale_new = 20 if dtype == jnp.int8 else 1.0
    k_new = np.round(rng.randn(batch, kvh, head_dim) * scale_new) \
        if dtype == jnp.int8 else rng.randn(batch, kvh, head_dim)
    k_new = jnp.asarray(k_new, dtype)
    v_new = np.round(rng.randn(batch, kvh, head_dim) * scale_new) \
        if dtype == jnp.int8 else rng.randn(batch, kvh, head_dim)
    v_new = jnp.asarray(v_new, dtype)

    # The sequences' slots here index PHYSICAL slots because the tables
    # are identity; logical slot for the kernel = local position.
    local_slots = jnp.asarray(
        [int(cl[b]) - 1 for b in range(batch)], jnp.int32)

    kp_ref, vp_ref = _write_reference(kp, vp, np.asarray(k_new),
                                      np.asarray(v_new),
                                      np.asarray(slots), page_size)
    kv_scale = 1.0 / 16.0 if dtype == jnp.int8 else 1.0
    ref_out = paged_attention_reference(q, jnp.asarray(kp_ref),
                                        jnp.asarray(vp_ref), bt, cl,
                                        kv_scale=kv_scale)

    out, (kp_new, vp_new) = paged_attention(
        q, kp, vp, bt, cl, pages_per_chunk=2, kv_scale=kv_scale,
        new_kv=(k_new, v_new, local_slots), interpret=_interpret())
    np.testing.assert_array_equal(np.asarray(kp_new), kp_ref)
    np.testing.assert_array_equal(np.asarray(vp_new), vp_ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=3e-2, rtol=3e-2)


def test_fused_write_attend_stacked_and_pad_rows():
    """Stacked [L, ...] cache + a -1 (pad) slot row: only layer
    `layer_index` changes, pad rows write nothing."""
    batch, kvh, head_dim, page_size, pps, L = 3, 2, 128, 16, 4, 3
    num_pages = batch * pps
    q, mk, bt, cl, slots = _make(1, batch, kvh, 2, head_dim, page_size,
                                 pps, num_pages, jnp.float32)
    kp = jnp.stack([mk() for _ in range(L)])
    vp = jnp.stack([mk() for _ in range(L)])
    rng = np.random.RandomState(9)
    k_new = jnp.asarray(rng.randn(batch, kvh, head_dim), jnp.float32)
    v_new = jnp.asarray(rng.randn(batch, kvh, head_dim), jnp.float32)
    local_slots = np.asarray([int(cl[b]) - 1 for b in range(batch)],
                             np.int32)
    local_slots[1] = -1  # pad row: no write
    slots2 = np.asarray(slots)
    slots2[1] = -1

    layer = 1
    kp_ref, vp_ref = _write_reference(kp, vp, np.asarray(k_new),
                                      np.asarray(v_new), slots2,
                                      page_size, layer=layer)
    ref_out = paged_attention_reference(q, jnp.asarray(kp_ref),
                                        jnp.asarray(vp_ref), bt, cl,
                                        layer_index=jnp.int32(layer))
    out, (kp_new, vp_new) = paged_attention(
        q, kp, vp, bt, cl, pages_per_chunk=2,
        layer_index=jnp.int32(layer),
        new_kv=(k_new, v_new, jnp.asarray(local_slots)),
        interpret=_interpret())
    np.testing.assert_array_equal(np.asarray(kp_new), kp_ref)
    np.testing.assert_array_equal(np.asarray(vp_new), vp_ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=3e-2, rtol=3e-2)


def test_fused_write_attend_fused_layout():
    """Interleaved fused cache (K at 2p, V at 2p+1): one writeback DMA
    covers both halves."""
    batch, kvh, head_dim, page_size, pps = 2, 2, 128, 16, 4
    num_pages = batch * pps
    q, mk, bt, cl, slots = _make(2, batch, kvh, 2, head_dim, page_size,
                                 pps, num_pages, jnp.int8)
    base = np.random.RandomState(3).randn(2 * num_pages, kvh, page_size,
                                          head_dim)
    kv = jnp.asarray(np.round(base * 20), jnp.int8)
    rng = np.random.RandomState(11)
    k_new = jnp.asarray(np.round(rng.randn(batch, kvh, head_dim) * 20),
                        jnp.int8)
    v_new = jnp.asarray(np.round(rng.randn(batch, kvh, head_dim) * 20),
                        jnp.int8)
    local_slots = jnp.asarray([int(cl[b]) - 1 for b in range(batch)],
                              jnp.int32)
    kv_scale = 1.0 / 16.0

    kv_ref, _ = _write_reference(kv, None, np.asarray(k_new),
                                 np.asarray(v_new), np.asarray(slots),
                                 page_size)
    ref_out = paged_attention_reference(q, jnp.asarray(kv_ref), None, bt,
                                        cl, kv_scale=kv_scale)
    out, (kv_new, none) = paged_attention(
        q, kv, None, bt, cl, pages_per_chunk=2, kv_scale=kv_scale,
        new_kv=(k_new, v_new, local_slots), interpret=_interpret())
    assert none is None
    np.testing.assert_array_equal(np.asarray(kv_new), kv_ref)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=3e-2, rtol=3e-2)


def test_sliding_window_decode_writes_via_slot_mapping():
    """Sliding-window gating regression: _prepare_decode clamps
    context_lens to the window and trims block_tables while slot_mapping
    stays ABSOLUTE, so the fused write+attend kernel (which derives the
    write position from context_lens-1 inside the trimmed table) must
    not run for sliding-window layers — past the window it would scatter
    the fresh K/V row to the wrong page and corrupt the cache.  The
    layer facade must route to the split path and land the row at the
    absolute slot."""
    import os

    from vllm_splitwise_tpu.layers.attention import Attention
    from vllm_splitwise_tpu.models.input_metadata import DecodeMetadata

    assert os.environ.get("VST_FUSED_WRITE", "1") == "1"
    window, page_size = 32, 16
    kvh, heads, head_dim = 2, 2, 128
    # One sequence at seq_len 40 > window: pages 0,1,2 allocated; the
    # runner-trimmed view covers the last ceil(32/16)=2 pages [1, 2];
    # absolute slot of token 39 = page 2, offset 7.
    seq_len = 40
    num_pages = 4
    rng = np.random.RandomState(0)
    kp = jnp.asarray(rng.randn(num_pages, kvh, page_size, head_dim),
                     jnp.float32)
    vp = jnp.asarray(rng.randn(num_pages, kvh, page_size, head_dim),
                     jnp.float32)
    attn = Attention(heads, head_dim, scale=1.0, num_kv_heads=kvh,
                     sliding_window=window)
    q = jnp.asarray(rng.randn(1, 1, heads * head_dim), jnp.float32)
    k = jnp.asarray(rng.randn(1, 1, kvh * head_dim), jnp.float32)
    v = jnp.asarray(rng.randn(1, 1, kvh * head_dim), jnp.float32)
    md = DecodeMetadata(
        block_tables=jnp.asarray([[1, 2]], jnp.int32),  # trimmed
        context_lens=jnp.asarray([window], jnp.int32),  # clamped
        slot_mapping=jnp.asarray([2 * page_size + (seq_len - 1)
                                  % page_size], jnp.int32),  # absolute
    )
    _, (kp2, vp2) = attn(q, k, v, (kp, vp), md)
    off = (seq_len - 1) % page_size
    np.testing.assert_allclose(
        np.asarray(kp2)[2, :, off],
        np.asarray(k).reshape(kvh, head_dim), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(vp2)[2, :, off],
        np.asarray(v).reshape(kvh, head_dim), rtol=1e-5, atol=1e-5)
    # Every other row of page 2 and all of pages 0/1/3 unchanged.
    mask = np.ones((num_pages, kvh, page_size, head_dim), bool)
    mask[2, :, off] = False
    np.testing.assert_array_equal(np.asarray(kp2)[mask],
                                  np.asarray(kp)[mask])
