"""EXPERIMENT: paged decode attention with HEAD-MAJOR page interior.

Layout [L, P, KVH, PS, HD]: a page is still ONE contiguous DMA, but its
interior is head-major, so the DMA lands as [kvh, ps, hd] directly into a
[kvh, chunk_tokens, hd] VMEM buffer (strided dst, rectangular copy) and
the kernel's batched dot_generals need NO per-chunk relayout — the
production kernel's `swapaxes` of 2 MB per grid cell disappears.

Trade-off: per-token KV writes land strided ([kvh, 1, hd] rows), so the
page read-modify-write path copies the page slab instead of updating in
place.  Promoted only if the attention win clearly beats that cost.
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
V5E_HBM_GBPS = 819.0


def _hm_kernel(
    block_tables_ref, context_lens_ref, layer_ref,
    q_ref,            # [1, kvh, gp, hd]
    k_pages_hbm,      # [L, P, KVH, PS, HD] (ANY)
    v_pages_hbm,
    out_ref,
    k_vmem,           # [2, kvh, chunk_tokens, hd]
    v_vmem,
    sems,             # [2, 2]
    m_ref, l_ref, acc_ref,
    *,
    pages_per_seq, pages_per_chunk, page_size, scale,
):
    layer = layer_ref[0]
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    chunk_tokens = pages_per_chunk * page_size
    ctx_len = context_lens_ref[b]

    def chunk_needed(chunk):
        return chunk * chunk_tokens < ctx_len

    def make_dmas(chunk, slot):
        dmas = []
        for p in range(pages_per_chunk):
            page_idx = block_tables_ref[b * pages_per_seq +
                                        chunk * pages_per_chunk + p]
            dst = pl.ds(p * page_size, page_size)
            # Contiguous [kvh, ps, hd] source -> strided dst slice.
            dmas.append(pltpu.make_async_copy(
                k_pages_hbm.at[layer, page_idx],
                k_vmem.at[slot, :, dst], sems.at[slot, 0]))
            dmas.append(pltpu.make_async_copy(
                v_pages_hbm.at[layer, page_idx],
                v_vmem.at[slot, :, dst], sems.at[slot, 1]))
        return dmas

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(jnp.logical_and(i == 0, chunk_needed(0)))
    def _():
        for d in make_dmas(0, 0):
            d.start()

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(i + 1 < num_chunks, chunk_needed(i + 1)))
    def _():
        for d in make_dmas(i + 1, next_slot):
            d.start()

    @pl.when(chunk_needed(i))
    def _():
        for d in make_dmas(i, slot):
            d.wait()

        q = q_ref[0]                         # [kvh, gp, hd] bf16
        k = k_vmem[slot]                     # [kvh, tok, hd] — no relayout
        s = jax.lax.dot_general(
            q, k,
            dimension_numbers=(((2, ), (2, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32) * scale

        token_pos = i * chunk_tokens + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 2)
        s = jnp.where(token_pos < ctx_len, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:, :, 0:1]
        l_prev = l_ref[:, :, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        v = v_vmem[slot]                     # [kvh, tok, hd]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)

        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(i == num_chunks - 1)
    def _():
        l = l_ref[:, :, 0:1]
        out_ref[0] = (acc_ref[...] /
                      jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pages_per_chunk", "scale"))
def headmajor_paged_attention(q, k_pages, v_pages, block_tables,
                              context_lens, *, pages_per_chunk=8,
                              scale=None, layer_index=None):
    batch, num_q_heads, head_dim = q.shape
    _, num_pages, num_kv_heads, page_size, _ = k_pages.shape
    group = num_q_heads // num_kv_heads
    pages_per_seq = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / (head_dim**0.5)
    num_chunks = pages_per_seq // pages_per_chunk
    group_padded = max(group, 8)
    q_view = q.reshape(batch, num_kv_heads, group, head_dim)
    if group_padded != group:
        q_view = jnp.pad(q_view, ((0, 0), (0, 0),
                                  (0, group_padded - group), (0, 0)))
    chunk_tokens = pages_per_chunk * page_size

    kernel = functools.partial(
        _hm_kernel, pages_per_seq=pages_per_seq,
        pages_per_chunk=pages_per_chunk, page_size=page_size, scale=scale)

    layer_arr = jnp.asarray([layer_index], dtype=jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_chunks),
            in_specs=[
                pl.BlockSpec((1, num_kv_heads, group_padded, head_dim),
                             lambda b, i, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, num_kv_heads, group_padded, head_dim),
                lambda b, i, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, num_kv_heads, chunk_tokens, head_dim),
                           k_pages.dtype),
                pltpu.VMEM((2, num_kv_heads, chunk_tokens, head_dim),
                           v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((num_kv_heads, group_padded, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, group_padded, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, group_padded, head_dim),
                           jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, group_padded, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(block_tables.reshape(-1), context_lens, layer_arr, q_view,
      k_pages, v_pages)
    return out[:, :, :group, :].reshape(batch, num_q_heads, head_dim)


def main(args):
    b, ps, L = args.batch, args.page_size, args.layers
    pages_per_seq = -(-args.context // ps)
    num_pages = b * pages_per_seq

    key = jax.random.PRNGKey(0)
    kk, kv, ka, kb2 = jax.random.split(key, 4)
    shape = (L, num_pages, args.num_kv_heads, ps, args.head_dim)
    k_pages = jax.random.normal(kk, shape, dtype=jnp.bfloat16) * 0.1
    v_pages = jax.random.normal(kv, shape, dtype=jnp.bfloat16) * 0.1
    tables = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(b, pages_per_seq))
    ctx = jnp.full((b, ), args.context, dtype=jnp.int32)
    qshape = (L, b, args.num_heads, args.head_dim)
    qs_a = jax.random.normal(ka, qshape, dtype=jnp.bfloat16)
    qs_b = jax.random.normal(kb2, qshape, dtype=jnp.bfloat16)
    jax.block_until_ready((k_pages, v_pages, qs_a, qs_b))

    # Correctness vs the production kernel (page-major token layout).
    from vllm_splitwise_tpu.ops.paged_attention import paged_attention
    q0 = qs_a[0]
    ref = paged_attention(q0, k_pages.swapaxes(2, 3),
                          v_pages.swapaxes(2, 3), tables, ctx,
                          layer_index=jnp.int32(0))
    got = headmajor_paged_attention(q0, k_pages, v_pages, tables, ctx,
                                    layer_index=jnp.int32(0))
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    print(f"max |headmajor - ref| = {err:.4f}")

    @jax.jit
    def run(qs, k_pages, v_pages):
        def body(carry, inp):
            q_l, layer = inp
            q = q_l + carry * 1e-30
            out = headmajor_paged_attention(
                q, k_pages, v_pages, tables, ctx,
                pages_per_chunk=args.pages_per_chunk, layer_index=layer)
            return out.astype(jnp.float32).max(), None
        acc, _ = lax.scan(body, jnp.float32(0),
                          (qs, jnp.arange(L, dtype=jnp.int32)))
        return acc

    r = run(qs_a, k_pages, v_pages)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(qs_b, k_pages, v_pages)
    jax.block_until_ready(r)
    elapsed = (time.perf_counter() - t0) / L

    kv_bytes = (2 * b * args.context * args.num_kv_heads *
                args.head_dim * 2)
    bw = kv_bytes / elapsed / 1e9
    print(f"headmajor latency: {elapsed*1e6:.1f} us/layer "
          f"(b{b} ctx{args.context} ps{ps} chunk{args.pages_per_chunk})")
    print(f"achieved read BW: {bw:.1f} GB/s "
          f"({100*bw/V5E_HBM_GBPS:.1f}% of v5e HBM roofline)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--context", type=int, default=768)
    parser.add_argument("--num-heads", type=int, default=32)
    parser.add_argument("--num-kv-heads", type=int, default=32)
    parser.add_argument("--head-dim", type=int, default=128)
    parser.add_argument("--page-size", type=int, default=16)
    parser.add_argument("--pages-per-chunk", type=int, default=8)
    parser.add_argument("--layers", type=int, default=32)
    main(parser.parse_args())
