"""EXPERIMENT (closed): paged decode attention with FLAT token-major
pages.

Layout [P, PS, KVH*HD]: one page is a fully CONTIGUOUS [ps, kvh*hd]
slab, so each page DMA lands in the [chunk_tokens, kvh*hd] VMEM buffer
as one contiguous copy — no strided 4 KB pieces.  Compute slices each
head's 128-lane column band statically: qk is dot(q[h] [gp, hd],
kbuf[:, h*hd:(h+1)*hd] [tok, hd]) contracting hd, pv contracts tok.

VERDICT (v5e, 2026-08-17, identical scan harness, b8 ctx768 ps16
chunk8 L32): flat 196.8 us/layer vs production head-major 196.6
us/layer — both 512 GB/s (62.5%% of roofline).  The earlier "flat is
25%% faster" reading compared numbers from two different harnesses (the
exact microbench hazard this file was built to remove).  The strided
rectangular dst of the head-major page DMA costs nothing measurable, so
the production layout stays head-major, which also keeps the batched
(non-unrolled) dot_generals and the cheaper GQA form.  Kept as the
canonical same-harness A/B rig: --impl {flat,production}.
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


def _flat_kernel(
    block_tables_ref, context_lens_ref, layer_ref,
    q_ref,            # [1, kvh, gp, hd]
    k_pages_hbm,      # [L, P, PS, KVH*HD] (ANY)
    v_pages_hbm,
    out_ref,          # [1, kvh, gp, hd]
    k_vmem,           # [2, chunk_tokens, kvh*hd]
    v_vmem,
    sems,             # [2, 2]
    m_ref, l_ref, acc_ref, s_ref, p_ref,
    *,
    pages_per_seq, pages_per_chunk, page_size, num_kv_heads, head_dim,
    scale, mode,
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
            dmas.append(pltpu.make_async_copy(
                k_pages_hbm.at[layer, page_idx],
                k_vmem.at[slot, dst], sems.at[slot, 0]))
            dmas.append(pltpu.make_async_copy(
                v_pages_hbm.at[layer, page_idx],
                v_vmem.at[slot, dst], sems.at[slot, 1]))
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

        kbuf = k_vmem[slot]                  # [tok, kvh*hd]
        vbuf = v_vmem[slot]

        if mode == "dma":
            gp = acc_ref.shape[1]
            acc_ref[...] += (
                kbuf[0:gp, 0:head_dim] +
                vbuf[0:gp, 0:head_dim]).astype(jnp.float32)[None]
            return

        # Phase 1: per-head MXU dots fill the score scratch.
        for h in range(num_kv_heads):
            qh = q_ref[0, h]                 # [gp, hd]
            kh = kbuf[:, h * head_dim:(h + 1) * head_dim]  # [tok, hd]
            s_ref[h] = jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((1, ), (1, )), ((), ())),
                preferred_element_type=jnp.float32)

        # Phase 2: ONE batched online-softmax over [kvh, gp, tok].
        token_pos = i * chunk_tokens + jax.lax.broadcasted_iota(
            jnp.int32, s_ref.shape, 2)
        s = jnp.where(token_pos < ctx_len, s_ref[...] * scale,
                      DEFAULT_MASK_VALUE)
        m_prev = m_ref[:, :, 0:1]
        l_prev = l_ref[:, :, 0:1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        p_ref[...] = p.astype(v_vmem.dtype)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

        # Phase 3: per-head pv dots.
        for h in range(num_kv_heads):
            vh = vbuf[:, h * head_dim:(h + 1) * head_dim]  # [tok, hd]
            pv = jax.lax.dot_general(
                p_ref[h], vh,
                dimension_numbers=(((1, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32)          # [gp, hd]
            acc_ref[h] = acc_ref[h] * alpha[h] + pv

    @pl.when(i == num_chunks - 1)
    def _():
        l = l_ref[:, :, 0:1]
        out_ref[0] = (acc_ref[...] /
                      jnp.maximum(l, 1e-20)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("pages_per_chunk", "scale",
                                              "num_kv_heads", "mode"))
def flat_paged_attention(q, k_pages, v_pages, block_tables, context_lens,
                         *, pages_per_chunk=8, scale=None,
                         layer_index=None, num_kv_heads=None,
                         mode="full"):
    batch, num_q_heads, head_dim = q.shape
    kvh = num_kv_heads or num_q_heads
    group = num_q_heads // kvh
    pages_per_seq = block_tables.shape[1]
    if scale is None:
        scale = 1.0 / (head_dim**0.5)
    num_chunks = pages_per_seq // pages_per_chunk
    gp = max(group, 8)
    q_view = q.reshape(batch, kvh, group, head_dim)
    if gp != group:
        q_view = jnp.pad(q_view, ((0, 0), (0, 0), (0, gp - group),
                                  (0, 0)))
    _, _, page_size, flat = k_pages.shape
    assert flat == kvh * head_dim
    chunk_tokens = pages_per_chunk * page_size

    kernel = functools.partial(
        _flat_kernel, pages_per_seq=pages_per_seq,
        pages_per_chunk=pages_per_chunk, page_size=page_size,
        num_kv_heads=kvh, head_dim=head_dim, scale=scale, mode=mode)
    layer_arr = jnp.asarray([layer_index], jnp.int32).reshape(1)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_chunks),
            in_specs=[
                pl.BlockSpec((1, kvh, gp, head_dim),
                             lambda b, i, *_: (b, 0, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
                pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
            ],
            out_specs=pl.BlockSpec((1, kvh, gp, head_dim),
                                   lambda b, i, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_tokens, kvh * head_dim),
                           k_pages.dtype),
                pltpu.VMEM((2, chunk_tokens, kvh * head_dim),
                           v_pages.dtype),
                pltpu.SemaphoreType.DMA((2, 2)),
                pltpu.VMEM((kvh, gp, 128), jnp.float32),
                pltpu.VMEM((kvh, gp, 128), jnp.float32),
                pltpu.VMEM((kvh, gp, head_dim), jnp.float32),
                pltpu.VMEM((kvh, gp, chunk_tokens), jnp.float32),
                pltpu.VMEM((kvh, gp, chunk_tokens), k_pages.dtype),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((batch, kvh, gp, head_dim),
                                       q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(block_tables.reshape(-1), context_lens, layer_arr, q_view,
      k_pages, v_pages)
    return out[:, :, :group, :].reshape(batch, num_q_heads, head_dim)


def main(args):
    b, ps, L = args.batch, args.page_size, args.layers
    kvh, hd = args.num_kv_heads, args.head_dim
    pages_per_seq = -(-args.context // ps)
    num_pages = b * pages_per_seq
    key = jax.random.PRNGKey(0)
    kk, kv, ka = jax.random.split(key, 3)
    shape = (L, num_pages, ps, kvh * hd)
    k_pages = jax.random.normal(kk, shape, dtype=jnp.bfloat16) * 0.1
    v_pages = jax.random.normal(kv, shape, dtype=jnp.bfloat16) * 0.1
    tables = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(b, pages_per_seq))
    ctx = jnp.full((b, ), args.context, dtype=jnp.int32)
    qs = jax.random.normal(ka, (L, b, args.num_heads, hd),
                           dtype=jnp.bfloat16)
    jax.block_until_ready((k_pages, v_pages, qs))

    # Correctness vs the production kernel (head-major interior).
    if args.skip_check:
        print("skipping correctness check", flush=True)
    else:
        _check(args, qs, k_pages, v_pages, tables, ctx, L, num_pages, ps,
               kvh, hd)

    run_timing(args, qs, k_pages, v_pages, tables, ctx, L, kvh, hd, b)


def _check(args, qs, k_pages, v_pages, tables, ctx, L, num_pages, ps, kvh,
           hd):
    from vllm_splitwise_tpu.ops.paged_attention import paged_attention
    q0 = qs[0]
    hm = k_pages.reshape(L, num_pages, ps, kvh, hd).transpose(0, 1, 3, 2,
                                                              4)
    hm_v = v_pages.reshape(L, num_pages, ps, kvh, hd).transpose(0, 1, 3,
                                                                2, 4)
    ref = paged_attention(q0, hm, hm_v, tables, ctx,
                          layer_index=jnp.int32(0))
    got = flat_paged_attention(q0, k_pages, v_pages, tables, ctx,
                               layer_index=jnp.int32(0),
                               num_kv_heads=kvh)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) -
                                got.astype(jnp.float32))))
    print(f"max |flat - headmajor| = {err:.4f}", flush=True)


def run_timing(args, qs, k_pages, v_pages, tables, ctx, L, kvh, hd, b):
    if args.impl == "production":
        # Same scan harness, production head-major kernel + layout.
        from vllm_splitwise_tpu.ops.paged_attention import paged_attention
        num_pages, ps = k_pages.shape[1], k_pages.shape[2]
        k_pages = k_pages.reshape(L, num_pages, ps, kvh,
                                  hd).transpose(0, 1, 3, 2, 4)
        v_pages = v_pages.reshape(L, num_pages, ps, kvh,
                                  hd).transpose(0, 1, 3, 2, 4)
        k_pages, v_pages = jnp.asarray(k_pages), jnp.asarray(v_pages)

        def attend(q, k_pages, v_pages, layer):
            return paged_attention(q, k_pages, v_pages, tables, ctx,
                                   pages_per_chunk=args.pages_per_chunk,
                                   layer_index=layer)
    else:
        def attend(q, k_pages, v_pages, layer):
            return flat_paged_attention(
                q, k_pages, v_pages, tables, ctx,
                pages_per_chunk=args.pages_per_chunk, layer_index=layer,
                num_kv_heads=kvh, mode=args.mode)

    @jax.jit
    def run(qs, k_pages, v_pages):
        def body(carry, inp):
            q_l, layer = inp
            q = q_l + carry * 1e-30
            out = attend(q, k_pages, v_pages, layer)
            return out.astype(jnp.float32).max(), None
        acc, _ = lax.scan(body, jnp.float32(0),
                          (qs, jnp.arange(L, dtype=jnp.int32)))
        return acc

    t0 = time.perf_counter()
    r = run(qs, k_pages, v_pages)
    jax.block_until_ready(r)
    print(f"compile+first: {time.perf_counter()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.reps):
        r = run(qs, k_pages, v_pages)
    jax.block_until_ready(r)
    el = (time.perf_counter() - t0) / args.reps / L
    kv_bytes = 2 * b * args.context * kvh * hd * 2
    bw = kv_bytes / el / 1e9
    print(f"{args.impl} latency: {el*1e6:.1f} us/layer "
          f"(b{b} ctx{args.context} ps{args.page_size} "
          f"chunk{args.pages_per_chunk})")
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
    parser.add_argument("--reps", type=int, default=8)
    parser.add_argument("--skip-check", action="store_true")
    parser.add_argument("--mode", choices=["full", "dma"],
                        default="full")
    parser.add_argument("--impl", choices=["flat", "production"],
                        default="flat")
    main(parser.parse_args())
