"""KV-cache op tests vs numpy oracles (reference pattern:
tests/kernels/test_cache.py)."""
import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.ops.kv_cache import (copy_blocks, gather_pages,
                                             scatter_pages, swap_in_blocks,
                                             swap_out_blocks,
                                             write_to_kv_cache)


def make_cache(rng, kvh=2, pages=8, page_size=4, hd=8):
    # Head-major page interior: [pages, kvh, page_size, hd].
    k = jnp.asarray(rng.randn(pages, kvh, page_size, hd), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(pages, kvh, page_size, hd), dtype=jnp.float32)
    return k, v


def test_write_to_kv_cache():
    rng = np.random.RandomState(0)
    kvh, pages, page_size, hd = 2, 8, 4, 8
    k_pages, v_pages = make_cache(rng, kvh, pages, page_size, hd)
    num_tokens = 5
    k = jnp.asarray(rng.randn(num_tokens, kvh, hd), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(num_tokens, kvh, hd), dtype=jnp.float32)
    # Tokens land in pages 2 and 5; last token is padding (-1, dropped).
    slots = jnp.asarray([8, 9, 10, 20, -1], dtype=jnp.int32)

    k_new, v_new = write_to_kv_cache(k, v, k_pages, v_pages, slots)

    def flat_tokens(pages_arr):
        # [pages, kvh, ps, hd] -> [pages*ps, kvh, hd]
        a = np.asarray(pages_arr).transpose(0, 2, 1, 3)
        return a.reshape(pages * page_size, kvh, hd)

    k_np = flat_tokens(k_pages).copy()
    for t, s in enumerate([8, 9, 10, 20]):
        k_np[s] = np.asarray(k)[t]
    np.testing.assert_array_equal(flat_tokens(k_new), k_np)
    # Padding token wrote nowhere: v cache differs from oracle only at
    # written slots.
    v_np = flat_tokens(v_pages).copy()
    for t, s in enumerate([8, 9, 10, 20]):
        v_np[s] = np.asarray(v)[t]
    np.testing.assert_array_equal(flat_tokens(v_new), v_np)


def test_copy_blocks():
    rng = np.random.RandomState(1)
    k_pages, v_pages = make_cache(rng)
    src = jnp.asarray([0, 3], dtype=jnp.int32)
    dst = jnp.asarray([5, 6], dtype=jnp.int32)
    k_new, v_new = copy_blocks(k_pages, v_pages, src, dst)
    np.testing.assert_array_equal(np.asarray(k_new)[5],
                                  np.asarray(k_pages)[0])
    np.testing.assert_array_equal(np.asarray(v_new)[6],
                                  np.asarray(v_pages)[3])
    # Untouched pages unchanged.
    np.testing.assert_array_equal(np.asarray(k_new)[1],
                                  np.asarray(k_pages)[1])


def test_gather_scatter_roundtrip():
    rng = np.random.RandomState(2)
    k_pages, _ = make_cache(rng)
    idx = jnp.asarray([1, 4, 6], dtype=jnp.int32)
    vals = gather_pages(k_pages, idx)
    zeroed = jnp.zeros_like(k_pages)
    restored = scatter_pages(zeroed, idx, vals)
    np.testing.assert_array_equal(np.asarray(restored)[4],
                                  np.asarray(k_pages)[4])
    np.testing.assert_array_equal(np.asarray(restored)[0],
                                  np.zeros_like(np.asarray(k_pages)[0]))


def test_swap_out_in_roundtrip():
    rng = np.random.RandomState(3)
    k_pages, v_pages = make_cache(rng)
    k_host = np.zeros_like(np.asarray(k_pages))
    v_host = np.zeros_like(np.asarray(v_pages))

    mapping = {2: 0, 5: 1}  # device page -> host page
    swap_out_blocks(k_pages, v_pages, k_host, v_host, mapping)
    np.testing.assert_array_equal(k_host[0], np.asarray(k_pages)[2])
    np.testing.assert_array_equal(v_host[1], np.asarray(v_pages)[5])

    # Swap back into different device pages.
    back = {0: 7, 1: 6}  # host page -> device page
    k_new, v_new = swap_in_blocks(k_pages, v_pages, k_host, v_host, back)
    np.testing.assert_array_equal(np.asarray(k_new)[7],
                                  np.asarray(k_pages)[2])
    np.testing.assert_array_equal(np.asarray(v_new)[6],
                                  np.asarray(v_pages)[5])
