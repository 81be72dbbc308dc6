"""Probe: quant_matmul_int8 at the LM-head shape (m=24, K=4096, N=32000).

Finds which (block_n, block_k) tiles fit the 16 MB scoped-VMEM limit on a
real chip and which is fastest — used to set the VMEM guard in
ops/quant_matmul.py (the r3 snapshot shipped an unguarded config that
chose bn=3200/bk=512 and blew the limit: BENCH_r03.json rc=1).

Run:  python benchmarks/kernels/probe_int8_head.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_splitwise_tpu.ops.quant_matmul import _int8_matmul_kernel, _cdiv, _round_up


def run_config(m, k, n, bm, bn, bk, iters=50):
    x = jnp.ones((m, k), jnp.bfloat16)
    qw = jnp.ones((k, n), jnp.int8)
    sc = jnp.ones((1, n), jnp.float32)
    m_pad = _round_up(m, bm) - m
    xp = jnp.pad(x, ((0, m_pad), (0, 0))) if m_pad else x

    @jax.jit
    def f(xp, qw, sc):
        return pl.pallas_call(
            functools.partial(_int8_matmul_kernel, out_dtype=jnp.float32),
            grid=(_cdiv(m, bm), n // bn, k // bk),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kb: (i, kb)),
                pl.BlockSpec((bk, bn), lambda i, j, kb: (kb, j)),
                pl.BlockSpec((1, bn), lambda i, j, kb: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, kb: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m + m_pad, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(xp, qw, sc)

    try:
        out = f(xp, qw, sc)
        out.block_until_ready()
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        if "vmem" in msg.lower() or "memory" in msg.lower():
            # pull the size out of the error if present
            import re
            mm = re.search(r"size ([0-9.]+)M", msg)
            return None, (mm.group(1) + "M" if mm else "OOM")
        raise

    # Host wall timing over the tunnel is unreliable (see trace_timing.py
    # docstring) — use the device lane of a profiler trace.
    from trace_timing import device_kernel_times, aggregate

    def loop():
        o = None
        for _ in range(iters):
            o = f(xp, qw, sc)
        o.block_until_ready()

    times = device_kernel_times(loop)
    # The trace carries NESTED events (the jit module + `while` wrappers
    # cover the same device time as their child kernels) — summing all
    # of them double-counts.  Count only the leaf kernel events.
    ms = sum(t for name, (t, _) in times.items()
             if not name.startswith(("jit_", "while")))
    return ms / 1000.0 / iters, None


def main():
    m, k, n = 24, 4096, 32000
    # HBM bytes to read: 4096*32000 int8 = 131 MB -> SoL @ ~820 GB/s ~ 160 us
    configs = []
    for bn in (640, 1280, 3200, 6400):
        for bk in (256, 512, 1024, 2048, 4096):
            if k % bk == 0 and n % bn == 0:
                configs.append((bn, bk))
    print(f"shape m={m} k={k} n={n}, f32 out")
    results = []
    for bn, bk in configs:
        dt, err = run_config(m, k, n, 24, bn, bk)
        if err:
            print(f"  bn={bn:5d} bk={bk:5d}  OOM ({err})")
        else:
            print(f"  bn={bn:5d} bk={bk:5d}  {dt*1e6:8.1f} us")
            results.append((dt, bn, bk))
    if results:
        dt, bn, bk = min(results)
        print(f"best: bn={bn} bk={bk} {dt*1e6:.1f} us "
              f"({131.1e6/dt/1e9:.0f} GB/s effective)")


if __name__ == "__main__":
    main()
