"""Stacked (layer-indexed) quant-matmul microbenchmark.

Measures the kernel the decode step actually runs: a lax.scan over L
layers reading each layer's weights from a [L, ...] HBM stack.  The scan
chains iterations (next x depends on the previous output) so results are
robust against two measurement hazards on tunneled transports:

* unobserved dispatches being elided entirely;
* XLA hoisting loop-invariant weights into VMEM (a single-matmul
  microbench shows "50 TB/s" because the weight never leaves VMEM —
  the [L, ...] stack cannot be hoisted, matching the real model).
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, ".")

V5E_HBM_GBPS = 819.0


def main(args):
    from vllm_splitwise_tpu.ops.quant_matmul import (
        quant_matmul_int4_mxu_stacked, quant_matmul_int4_stacked,
        pack_sz_bands)

    m, k, n, g, L = args.m, args.k, args.n, args.group_size, args.layers
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)

    qw = jax.random.randint(key, (L, k // 2, n), -128, 128, dtype=jnp.int8)
    sz = pack_sz_bands(jnp.full((L, k // g, n), 0.01, jnp.float32),
                       jnp.full((L, k // g, n), 8.0, jnp.float32), g)

    kxa, kxb = jax.random.split(jax.random.PRNGKey(1))
    xs_a = jax.random.normal(kxa, (L, m, k), dtype=jnp.bfloat16)
    xs_b = jax.random.normal(kxb, (L, m, k), dtype=jnp.bfloat16)
    jax.block_until_ready((qw, xs_a, xs_b))

    # Weights must be jit ARGUMENTS: closure-captured GB-scale constants
    # stall remote compilation.
    @jax.jit
    def run(xs, qw, sz):
        def body(carry, inp):
            x_l, l = inp
            x = x_l + carry * 1e-30        # serialize: depends on prev out
            fn = (quant_matmul_int4_mxu_stacked if args.mxu
                  else quant_matmul_int4_stacked)
            out = fn(x, qw, sz, l, group_size=g)
            return out.astype(jnp.float32).max(), None
        acc, _ = lax.scan(body, jnp.float32(0),
                          (xs, jnp.arange(L, dtype=jnp.int32)))
        return acc

    r = run(xs_a, qw, sz)
    jax.block_until_ready(r)
    # Host wall-clock lies on tunneled transports (block_until_ready on
    # a scalar can return ~50x early) — read the DEVICE lane instead.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trace_timing import device_kernel_times
    times = device_kernel_times(
        lambda: jax.block_until_ready(run(xs_b, qw, sz)))
    # Per-LAYER time = family total / layers.  Dividing by launch count
    # is wrong since the fused act-quantize prologue ships as a second
    # "quant_matmul*" launch per layer (r2+): that halved reported
    # per-layer times and "measured" 1.3 TB/s on an 819 GB/s part.
    kern_ms = sum(ms for name, (ms, _) in times.items()
                  if name.startswith("quant_matmul"))
    t = kern_ms / 1000.0 / L

    w_bytes = (k // 2) * n
    sz_bytes = int(sz.shape[1]) * n * 4 // 1
    bw = (w_bytes + sz_bytes) / t / 1e9
    bw_w = w_bytes / t / 1e9
    tag = "int4_mxu" if args.mxu else "int4_stacked"
    print(f"{tag} {m}x{k}x{n} g{g} L{L}: {t*1e6:7.1f} us/layer  "
          f"stream {bw:6.1f} GB/s ({100*bw/V5E_HBM_GBPS:5.1f}% roofline; "
          f"weights-only {bw_w:6.1f} GB/s)  "
          f"[w {w_bytes/2**20:.1f} MiB + s/z {sz_bytes/2**20:.1f} MiB]")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=8)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--n", type=int, default=11008)
    p.add_argument("--group-size", type=int, default=128)
    p.add_argument("--layers", type=int, default=32)
    p.add_argument("--mxu", action="store_true",
                   help="W4A8 int8-MXU kernel instead of bf16 dequant")
    main(p.parse_args())
