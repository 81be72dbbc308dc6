"""Fused int4/int8 dequant-matmul microbenchmark vs bf16 (reference role:
benchmarks/kernels microbenches for the quant GEMMs) + speed-of-light
report: the kernel is weight-bandwidth-bound at decode batch sizes, so
the roofline is weight-bytes / HBM bandwidth."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vllm_splitwise_tpu.ops.quant_matmul import (quant_matmul_int4,
                                                 quant_matmul_int8)

V5E_HBM_GBPS = 819.0


def bench(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main(args):
    rng = np.random.RandomState(0)
    m, k, n, g = args.m, args.k, args.n, args.group_size
    x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)

    w_bf16 = jnp.asarray(rng.standard_normal((k, n)), dtype=jnp.bfloat16)
    t_bf16 = bench(lambda a, b: jnp.dot(a, b), x, w_bf16, iters=args.iters)

    qw4 = jnp.asarray(rng.randint(-128, 128, size=(k // 2, n)),
                      dtype=jnp.int8)
    s4 = jnp.full((k // g, n), 0.01, dtype=jnp.float32)
    z4 = jnp.full((k // g, n), 8.0, dtype=jnp.float32)
    t_int4 = bench(
        lambda a, w, s, z: quant_matmul_int4(a, w, s, z, group_size=g),
        x, qw4, s4, z4, iters=args.iters)

    qw8 = jnp.asarray(rng.randint(-128, 128, size=(k, n)), dtype=jnp.int8)
    s8 = jnp.full((1, n), 0.01, dtype=jnp.float32)
    t_int8 = bench(quant_matmul_int8, x, qw8, s8, iters=args.iters)

    for name, t, bytes_w in (("bf16", t_bf16, 2 * k * n),
                             ("int8", t_int8, k * n),
                             ("int4", t_int4, k * n // 2)):
        bw = bytes_w / t / 1e9
        print(f"{name}: {t*1e6:8.1f} us  weight-BW {bw:7.1f} GB/s "
              f"({100*bw/V5E_HBM_GBPS:5.1f}% roofline)  "
              f"speedup vs bf16 {t_bf16/t:4.2f}x")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--m", type=int, default=8)
    parser.add_argument("--k", type=int, default=4096)
    parser.add_argument("--n", type=int, default=11008)
    parser.add_argument("--group-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=50)
    main(parser.parse_args())
