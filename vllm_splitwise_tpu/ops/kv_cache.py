"""Paged KV-cache manipulation ops.

TPU-native equivalents of the reference's cache CUDA kernels
(csrc/cache_kernels.cu: swap_blocks:21, copy_blocks:66,
reshape_and_cache:155): token KV scatter into pages, page-to-page copies
(copy-on-write), and device<->host page swaps.  Scatters/gathers are
expressed as XLA ops (single fused scatter each) — XLA lowers these to
efficient dynamic-update slices on TPU; no hand kernel is needed because
they are pure data movement with no fusion opportunity beyond what XLA
already does.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Cache layout: pages[num_kv_heads, num_pages, page_size, head_dim].
# A "slot" is a flat token position: slot = page_idx * page_size + offset.


def write_to_kv_cache(
    k: jax.Array,            # [num_tokens, num_kv_heads, head_dim]
    v: jax.Array,
    k_pages: jax.Array,      # [num_kv_heads, num_pages, page_size, head_dim]
    v_pages: jax.Array,
    slot_mapping: jax.Array,  # [num_tokens] int32, -1 = padding (dropped)
) -> Tuple[jax.Array, jax.Array]:
    """Scatter freshly computed K/V vectors into their cache slots.

    Functional: returns the updated page arrays (donate them under jit so
    XLA updates in place).  Padding tokens use slot -1 which is dropped by
    the scatter.
    """
    num_kv_heads, num_pages, page_size, head_dim = k_pages.shape

    k = k.astype(k_pages.dtype)
    v = v.astype(v_pages.dtype)

    # [tokens, heads, dim] -> [heads, tokens, dim]
    k_t = k.swapaxes(0, 1)
    v_t = v.swapaxes(0, 1)

    k_flat = k_pages.reshape(num_kv_heads, num_pages * page_size, head_dim)
    v_flat = v_pages.reshape(num_kv_heads, num_pages * page_size, head_dim)

    # Negative (padding) slots would WRAP under numpy indexing semantics;
    # remap them past the end so mode="drop" discards them.
    total_slots = num_pages * page_size
    slots = jnp.where(slot_mapping < 0, total_slots, slot_mapping)
    k_flat = k_flat.at[:, slots, :].set(k_t, mode="drop")
    v_flat = v_flat.at[:, slots, :].set(v_t, mode="drop")

    return (k_flat.reshape(k_pages.shape), v_flat.reshape(v_pages.shape))


def copy_blocks(
    k_pages: jax.Array,
    v_pages: jax.Array,
    src_indices: jax.Array,  # [num_copies] int32
    dst_indices: jax.Array,  # [num_copies] int32, -1 = padding (dropped)
) -> Tuple[jax.Array, jax.Array]:
    """Page-granularity copy (copy-on-write fork divergence)."""
    num_pages = k_pages.shape[1]
    src = jnp.where(src_indices < 0, 0, src_indices)
    dst = jnp.where(dst_indices < 0, num_pages, dst_indices)
    k_src = jnp.take(k_pages, src, axis=1, mode="clip")
    v_src = jnp.take(v_pages, src, axis=1, mode="clip")
    k_pages = k_pages.at[:, dst].set(k_src, mode="drop")
    v_pages = v_pages.at[:, dst].set(v_src, mode="drop")
    return k_pages, v_pages


def gather_pages(pages: jax.Array, indices: jax.Array) -> jax.Array:
    """Pull a set of pages out of the cache (KV migration send side)."""
    return jnp.take(pages, indices, axis=1, mode="clip")


def scatter_pages(pages: jax.Array, indices: jax.Array,
                  values: jax.Array) -> jax.Array:
    """Write a set of pages into the cache (KV migration receive side)."""
    return pages.at[:, indices].set(values.astype(pages.dtype), mode="drop")


def swap_out_blocks(
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_host: np.ndarray,
    v_host: np.ndarray,
    mapping: Dict[int, int],
) -> None:
    """Device -> host page copies (preemption swap).  Eager, not jitted:
    host arrays are mutated in place."""
    if not mapping:
        return
    src = jnp.asarray(sorted(mapping.keys()), dtype=jnp.int32)
    k_gather = np.asarray(gather_pages(k_pages, src))
    v_gather = np.asarray(gather_pages(v_pages, src))
    for i, s in enumerate(sorted(mapping.keys())):
        d = mapping[s]
        k_host[:, d] = k_gather[:, i]
        v_host[:, d] = v_gather[:, i]


def swap_in_blocks(
    k_pages: jax.Array,
    v_pages: jax.Array,
    k_host: np.ndarray,
    v_host: np.ndarray,
    mapping: Dict[int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Host -> device page copies (resume after swap preemption)."""
    if not mapping:
        return k_pages, v_pages
    src = sorted(mapping.keys())
    dst = jnp.asarray([mapping[s] for s in src], dtype=jnp.int32)
    k_vals = jnp.asarray(k_host[:, src])
    v_vals = jnp.asarray(v_host[:, src])
    return (scatter_pages(k_pages, dst, k_vals),
            scatter_pages(v_pages, dst, v_vals))
