"""EXPERIMENT: separate the paged-attention kernel's DMA ceiling from its
compute cost.

Runs the production-kernel DMA pattern (one strided page DMA per page,
double-buffered chunks) with compute either ON (the real flash inner
loop) or OFF (a single cheap VPU touch of the landed chunk).  If the
no-compute variant is much faster, the kernel is compute-bound at these
shapes (MHA group=1 pads the MXU to 8 rows); if equal, the strided page
DMA itself is the ceiling.
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


def _kernel(
    block_tables_ref, context_lens_ref, layer_ref,
    q_ref,            # [1, kvh, gp, hd]
    k_pages_hbm, v_pages_hbm,
    out_ref,
    k_vmem, v_vmem, sems, m_ref, l_ref, acc_ref,
    *,
    pages_per_seq, pages_per_chunk, page_size, scale, compute,
):
    layer = layer_ref[0]
    b = pl.program_id(0)
    i = pl.program_id(1)
    num_chunks = pl.num_programs(1)
    chunk_tokens = pages_per_chunk * page_size
    ctx_len = context_lens_ref[b]

    def make_dmas(chunk, slot):
        dmas = []
        for p in range(pages_per_chunk):
            page_idx = block_tables_ref[b * pages_per_seq +
                                        chunk * pages_per_chunk + p]
            dst = pl.ds(p * page_size, page_size)
            dmas.append(pltpu.make_async_copy(
                k_pages_hbm.at[layer, page_idx],
                k_vmem.at[slot, :, dst], sems.at[slot, 0]))
            dmas.append(pltpu.make_async_copy(
                v_pages_hbm.at[layer, page_idx],
                v_vmem.at[slot, :, dst], sems.at[slot, 1]))
        return dmas

    slot = jax.lax.rem(i, 2)
    next_slot = jax.lax.rem(i + 1, 2)

    @pl.when(i == 0)
    def _():
        for d in make_dmas(0, 0):
            d.start()
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(i + 1 < num_chunks)
    def _():
        for d in make_dmas(i + 1, next_slot):
            d.start()

    for d in make_dmas(i, slot):
        d.wait()

    if compute:
        q = q_ref[0]
        k = k_vmem[slot]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2, ), (2, )), ((0, ), (0, ))),
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
        v = v_vmem[slot]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v,
            dimension_numbers=(((2, ), (1, )), ((0, ), (0, ))),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
    else:
        # Touch one sublane of each buffer so the DMAs cannot be elided.
        acc_ref[...] += (k_vmem[slot, :, 0:acc_ref.shape[1], :] +
                         v_vmem[slot, :, 0:acc_ref.shape[1], :]
                         ).astype(jnp.float32)

    @pl.when(i == num_chunks - 1)
    def _():
        l = l_ref[:, :, 0:1]
        denom = jnp.maximum(l, 1e-20) if compute else 1.0
        out_ref[0] = (acc_ref[...] / denom).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("pages_per_chunk", "compute"))
def run_kernel(q, k_pages, v_pages, block_tables, context_lens,
               layer_index, *, pages_per_chunk, compute):
    batch, num_q_heads, head_dim = q.shape
    _, num_pages, num_kv_heads, page_size, _ = k_pages.shape
    group = num_q_heads // num_kv_heads
    pages_per_seq = block_tables.shape[1]
    scale = 1.0 / (head_dim**0.5)
    num_chunks = pages_per_seq // pages_per_chunk
    gp = max(group, 8)
    q_view = q.reshape(batch, num_kv_heads, group, head_dim)
    if gp != group:
        q_view = jnp.pad(q_view, ((0, 0), (0, 0), (0, gp - group), (0, 0)))
    chunk_tokens = pages_per_chunk * page_size

    kernel = functools.partial(
        _kernel, pages_per_seq=pages_per_seq,
        pages_per_chunk=pages_per_chunk, page_size=page_size, scale=scale,
        compute=compute)
    layer_arr = jnp.asarray([layer_index], jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_chunks),
            in_specs=[
                pl.BlockSpec((1, num_kv_heads, gp, head_dim),
                             lambda b, i, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((1, num_kv_heads, gp, head_dim),
                                   lambda b, i, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, num_kv_heads, chunk_tokens, head_dim),
                           k_pages.dtype),
                pltpu.VMEM((2, num_kv_heads, chunk_tokens, head_dim),
                           v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((num_kv_heads, gp, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, gp, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads, gp, head_dim), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, num_kv_heads, gp, head_dim),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(block_tables.reshape(-1), context_lens, layer_arr, q_view,
      k_pages, v_pages)
    return out


def main(args):
    b, ps, L = args.batch, args.page_size, args.layers
    pages_per_seq = -(-args.context // ps)
    num_pages = b * pages_per_seq
    key = jax.random.PRNGKey(0)
    kk, ka = jax.random.split(key)
    shape = (L, num_pages, args.num_kv_heads, ps, args.head_dim)
    k_pages = jax.random.normal(kk, shape, dtype=jnp.bfloat16) * 0.1
    v_pages = k_pages + 0.01
    tables = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(b, pages_per_seq))
    ctx = jnp.full((b, ), args.context, dtype=jnp.int32)
    qs = jax.random.normal(ka, (L, b, args.num_heads, args.head_dim),
                           dtype=jnp.bfloat16)
    jax.block_until_ready((k_pages, v_pages, qs))

    for compute in (True, False):
        @jax.jit
        def run(qs, k_pages, v_pages):
            def body(carry, inp):
                q_l, layer = inp
                q = q_l + carry * 1e-30
                out = run_kernel(q, k_pages, v_pages, tables, ctx, layer,
                                 pages_per_chunk=args.pages_per_chunk,
                                 compute=compute)
                return out.astype(jnp.float32).max(), None
            acc, _ = lax.scan(body, jnp.float32(0),
                              (qs, jnp.arange(L, dtype=jnp.int32)))
            return acc

        r = run(qs, k_pages, v_pages)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = run(qs, k_pages, v_pages)
        jax.block_until_ready(r)
        el = (time.perf_counter() - t0) / args.reps / L
        nbytes = (2 * num_pages * args.num_kv_heads * ps * args.head_dim *
                  k_pages.dtype.itemsize)
        print(f"compute={compute}: {el*1e6:7.1f} us/layer, "
              f"{nbytes/el/1e9:6.1f} GB/s "
              f"({100*nbytes/el/1e9/V5E_HBM_GBPS:.1f}% roofline)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--context", type=int, default=768)
    p.add_argument("--num-heads", type=int, default=32)
    p.add_argument("--num-kv-heads", type=int, default=32)
    p.add_argument("--head-dim", type=int, default=128)
    p.add_argument("--page-size", type=int, default=16)
    p.add_argument("--pages-per-chunk", type=int, default=8)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--reps", type=int, default=8)
    main(p.parse_args())
