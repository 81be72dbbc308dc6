"""Per-kernel speed-of-light report for the REAL decode step.

Traces bench.measure_decode (the exact jitted step the engine runs) and
attributes device time to each kernel family, printing achieved GB/s
against the v5e HBM roofline (819 GB/s).  BASELINE.json: "every
dequant+matmul kernel must hit speed-of-light per chip" — this is the
measurement backing docs/roofline.md.

    python benchmarks/kernels/roofline_report.py --size 7b --quant int4 \
        --batch 16 --context 768
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

V5E_HBM_GBPS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="7b")
    p.add_argument("--quant", default="int4",
                   choices=["int4", "int8", "bf16"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--context", type=int, default=768)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--kv-dtype", default="int8")
    p.add_argument("--page-size", type=int, default=16)
    args = p.parse_args()

    import bench
    from benchmarks.kernels.trace_timing import (aggregate,
                                                 device_kernel_times)

    model, params, config = bench.build(args.size, args.quant)
    h, inter, layers, heads, kv_heads, vocab = bench._SHAPES[args.size]
    hd = model.head_dim
    kv_dtype = "bf16" if args.quant == "bf16" else args.kv_dtype

    holder = {}

    def run():
        holder["toks"], _ = bench.measure_decode(
            model, params, config, args.batch, args.context, args.steps,
            page_size=args.page_size, kv_dtype=kv_dtype)

    times = device_kernel_times(run)

    step_ms, nsteps = aggregate(times, "jit_step")
    step_ms /= max(nsteps, 1)

    # ---- byte model -------------------------------------------------
    # qkv (q + k + v outputs) + o + gate_up (2x inter) + down.
    wpl = (h * (heads * hd + 2 * kv_heads * hd) + (heads * hd) * h +
           h * 2 * inter + inter * h)
    if args.quant == "int4":
        layer_w = wpl / 2 + wpl / 16          # packed nibbles + sz bands
    elif args.quant == "int8":
        layer_w = wpl + 4 * (heads * hd + h + 2 * inter + h)
    else:
        layer_w = 2 * wpl
    matmul_bytes = layers * layer_w
    kv_elem = {"bf16": 2, "fp8": 1, "int8": 1, "int4": 0.5}[kv_dtype]
    pages = -(-args.context // args.page_size)
    kv_bytes = (layers * args.batch * pages * args.page_size * kv_heads *
                hd * 2 * kv_elem)
    lm_head_bytes = 2 * h * model.padded_vocab

    rows = []
    mm_ms = sum(ms for name, (ms, _) in times.items()
                if name.startswith("quant_matmul") or
                (args.quant == "bf16" and name.startswith("fusion") and
                 False))
    if args.quant == "bf16":
        # bf16 matmuls lower to XLA fusions; attribute the residual.
        attn_ms, _ = aggregate(times, "paged_attention")
        mm_ms = 0.0
    else:
        attn_ms, _ = aggregate(times, "paged_attention")
    mm_ms /= max(nsteps, 1)
    attn_ms /= max(nsteps, 1)

    def row(name, ms, nbytes):
        bw = nbytes / (ms / 1000.0) / 1e9 if ms else 0.0
        rows.append((name, ms, nbytes / 2**30, bw,
                     100.0 * bw / V5E_HBM_GBPS))

    if mm_ms:
        row("quant matmuls (all four, stacked)", mm_ms, matmul_bytes)
    row("paged attention (decode)", attn_ms, kv_bytes)
    other = step_ms - mm_ms - attn_ms
    row("everything else (lm_head, norms, sampler, KV write)", other,
        lm_head_bytes)
    row("WHOLE STEP", step_ms,
        matmul_bytes + kv_bytes + lm_head_bytes)

    print(f"\nconfig: {args.size} {args.quant} kv={kv_dtype} "
          f"b{args.batch} ctx{args.context}; device step = "
          f"{step_ms:.2f} ms ({args.batch / step_ms * 1000:.0f} tok/s)")
    print(f"{'kernel':52s} {'ms/step':>8s} {'GiB':>7s} "
          f"{'GB/s':>7s} {'%SoL':>6s}")
    for name, ms, gib, bw, pct in rows:
        print(f"{name:52s} {ms:8.2f} {gib:7.2f} {bw:7.0f} {pct:6.1f}")


if __name__ == "__main__":
    main()
