"""Paged-attention decode kernel microbenchmark (reference role:
benchmarks/kernels/benchmark_paged_attention.py) + roofline report.

Mirrors the engine's real decode configuration: a STACKED page-major KV
cache [L, P, PS, KVH, HD] attended layer-by-layer inside one jitted
lax.scan, with the layer index varying per iteration.  The multi-GB stack
cannot be VMEM-hoisted and no two iterations are identical, which defeats
the two tunneled-transport measurement hazards (result dedup and
loop-invariant hoisting) that make naive repeat-timing loops report
impossible bandwidths.
"""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec)


def main(args):
    from vllm_splitwise_tpu.ops.paged_attention import paged_attention

    rng = np.random.RandomState(0)
    b, ps, L = args.batch, args.page_size, args.layers
    pages_per_seq = -(-args.context // ps)
    num_pages = b * pages_per_seq

    # GB-scale inputs are generated ON DEVICE: shipping numpy arrays
    # through a tunneled transport takes minutes.
    shape = (L, num_pages, ps, args.num_kv_heads, args.head_dim)
    key = jax.random.PRNGKey(0)
    kk, kv, ka, kb2 = jax.random.split(key, 4)
    k_pages = jax.random.normal(kk, shape, dtype=jnp.bfloat16) * 0.1
    v_pages = jax.random.normal(kv, shape, dtype=jnp.bfloat16) * 0.1
    tables = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(b, pages_per_seq))
    ctx = jnp.full((b, ), args.context, dtype=jnp.int32)

    if args.fused:
        # Production fused interleaved layout: ONE array, K of logical
        # block p at physical page 2p, V at 2p+1 -> one DMA per logical
        # page (same harness, so directly comparable to the split run).
        fused = jnp.stack([k_pages, v_pages], axis=2).reshape(
            (L, 2 * num_pages) + shape[2:])
        k_pages, v_pages = fused, None

    qshape = (L, b, args.num_heads, args.head_dim)
    qs_a = jax.random.normal(ka, qshape, dtype=jnp.bfloat16)
    qs_b = jax.random.normal(kb2, qshape, dtype=jnp.bfloat16)
    jax.block_until_ready((k_pages, v_pages, qs_a, qs_b))

    # KV arrays must be jit ARGUMENTS: closure-captured GB-scale
    # constants stall remote compilation.
    @jax.jit
    def run(qs, k_pages, v_pages):
        def body(carry, inp):
            q_l, layer = inp
            q = q_l + carry * 1e-30      # serialize on the previous output
            out = paged_attention(q, k_pages, v_pages, tables, ctx,
                                  pages_per_chunk=args.pages_per_chunk,
                                  layer_index=layer)
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
    print(f"latency: {elapsed*1e6:.1f} us/layer "
          f"(b{b} ctx{args.context} kvh{args.num_kv_heads} "
          f"ps{ps} chunk{args.pages_per_chunk}"
          f"{' FUSED' if args.fused else ''})")
    print(f"KV bytes/layer: {kv_bytes/1e6:.2f} MB")
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
    parser.add_argument("--fused", action="store_true",
                        help="interleaved fused K/V layout (one DMA per "
                        "logical page)")
    parser.add_argument("--layers", type=int, default=32)
    main(parser.parse_args())
