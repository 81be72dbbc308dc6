"""Paged-attention kernel microbenchmark (reference role:
benchmarks/kernels/benchmark_paged_attention.py) + roofline report."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.ops.paged_attention import paged_attention

V5E_HBM_GBPS = 819.0  # v5e HBM bandwidth (public spec)


def main(args):
    rng = np.random.RandomState(0)
    pages_per_seq = -(-args.context // args.page_size)
    num_pages = args.batch * pages_per_seq

    q = jnp.asarray(rng.standard_normal(
        (args.batch, args.num_heads, args.head_dim)), dtype=jnp.bfloat16)
    shape = (args.num_kv_heads, num_pages, args.page_size, args.head_dim)
    k_pages = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    v_pages = jnp.asarray(rng.standard_normal(shape), dtype=jnp.bfloat16)
    tables = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(args.batch,
                                                     pages_per_seq))
    ctx = jnp.full((args.batch, ), args.context, dtype=jnp.int32)

    out = paged_attention(q, k_pages, v_pages, tables, ctx)
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(args.iters):
        out = paged_attention(q, k_pages, v_pages, tables, ctx)
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - start) / args.iters

    kv_bytes = (2 * args.batch * args.context * args.num_kv_heads *
                args.head_dim * 2)
    bw = kv_bytes / elapsed / 1e9
    print(f"latency: {elapsed*1e6:.1f} us")
    print(f"KV bytes/step: {kv_bytes/1e6:.2f} MB")
    print(f"achieved read BW: {bw:.1f} GB/s "
          f"({100*bw/V5E_HBM_GBPS:.1f}% of v5e HBM roofline)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--context", type=int, default=1024)
    parser.add_argument("--num-heads", type=int, default=32)
    parser.add_argument("--num-kv-heads", type=int, default=32)
    parser.add_argument("--head-dim", type=int, default=128)
    parser.add_argument("--page-size", type=int, default=16)
    parser.add_argument("--iters", type=int, default=20)
    main(parser.parse_args())
