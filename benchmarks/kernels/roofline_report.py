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


V5E_BF16_TFLOPS = 197.0   # per-chip MXU peak (prefill is compute-bound)
V5E_INT8_TOPS = 394.0


def prefill_report(args):
    """Prefill-side roofline: traces bench.measure_prefill at several
    prompt lengths, attributes device time to flash attention vs the
    matmul family, and scores against the MXU FLOPs roofline (prefill
    at these lengths is compute-bound, unlike decode's HBM bound).
    Also measures segmented-dispatch overhead: the splitwise engine
    prefills in kv_stream_segments layer groups (model_runner
    _execute_prefill_segmented) so KV migration can overlap compute —
    this prints what those extra dispatch boundaries cost."""
    import bench
    from benchmarks.kernels.trace_timing import (aggregate,
                                                 device_kernel_times)

    model, params, config = bench.build(args.size, args.quant)
    h, inter, layers, heads, kv_heads, vocab = bench._SHAPES[args.size]
    hd = model.head_dim

    print(f"\n== prefill roofline: {args.size} {args.quant} "
          f"b{args.batch} ==")
    print(f"{'T':>6s} {'ms':>8s} {'attn ms':>8s} {'mm ms':>8s} "
          f"{'other':>7s} {'TFLOP/s':>8s} {'%MXU':>6s} {'tok/s':>9s}")
    for t in args.prefill_lens:
        holder = {}

        def run():
            holder["ttft"], holder["tput"] = bench.measure_prefill(
                model, params, config, args.batch, t,
                max(2, args.steps // 4), page_size=args.page_size)

        times = device_kernel_times(run)
        step_ms, nsteps = aggregate(times, "jit_prefill")
        if nsteps == 0:
            step_ms = sum(ms for ms, _ in times.values())
            nsteps = max(2, args.steps // 4) + 1
        step_ms /= max(nsteps, 1)
        attn_ms = sum(ms for name, (ms, _) in times.items()
                      if "flash" in name or "attention" in name)
        mm_ms = sum(ms for name, (ms, _) in times.items()
                    if "matmul" in name or "dot" in name)
        attn_ms /= max(nsteps, 1)
        mm_ms /= max(nsteps, 1)
        # FLOP model: matmul 2*T*params/layer; attention 4*T^2*h per
        # layer (causal halves it; keep the dense count, matching how
        # flash kernels are conventionally scored).
        wpl = (h * (heads * hd + 2 * kv_heads * hd) + (heads * hd) * h +
               h * 2 * inter + inter * h)
        flops = (args.batch * (2 * t * wpl + 4 * t * t * h) * layers
                 + 2 * args.batch * h * model.padded_vocab)  # + lm head
        tflops = flops / (step_ms / 1000.0) / 1e12
        print(f"{t:6d} {step_ms:8.2f} {attn_ms:8.2f} {mm_ms:8.2f} "
              f"{step_ms - attn_ms - mm_ms:7.2f} {tflops:8.1f} "
              f"{100 * tflops / V5E_BF16_TFLOPS:6.1f} "
              f"{args.batch * t / step_ms * 1000:9.0f}")

    # ---- segmentation overhead (kv_stream_segments) -----------------
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_splitwise_tpu.models.input_metadata import PrefillMetadata
    if not all(hasattr(model, a)
               for a in ("embed", "forward_layers", "finalize")):
        print("model has no segment API; skipping segmentation probe")
        return
    t = args.prefill_lens[len(args.prefill_lens) // 2]
    b = args.batch
    page_size = args.page_size
    pages_per_seq = -(-t // page_size) + 2
    num_pages = b * pages_per_seq
    kv = tuple(
        jnp.zeros((model.num_layers, num_pages, model.num_kv_heads,
                   page_size, model.head_dim), dtype=jnp.bfloat16)
        for _ in range(2))
    slots = np.stack([
        np.arange(i * pages_per_seq * page_size,
                  i * pages_per_seq * page_size + t, dtype=np.int32)
        for i in range(b)
    ])
    md = PrefillMetadata(seq_lens=jnp.full((b, ), t, jnp.int32),
                         slot_mapping=jnp.asarray(slots),
                         start_positions=jnp.zeros((b, ), jnp.int32))
    tokens = jnp.ones((b, t), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))

    import functools
    embed = jax.jit(model.embed)
    fwd = jax.jit(functools.partial(model.forward_layers),
                  static_argnames=("layer_start", "num_layers"),
                  donate_argnums=(3, ))

    def run_segmented(num_segs, caches):
        # The caches are donated through each group dispatch and the
        # final ones returned, so reps chain without reallocation.
        hidden = embed(params, tokens)
        size = -(-model.num_layers // num_segs)
        start = 0
        while start < model.num_layers:
            n = min(size, model.num_layers - start)
            hidden, caches = fwd(params, hidden, positions, caches, md,
                                 layer_start=start, num_layers=n)
            start += n
        return hidden, caches

    import time as _time
    caches = kv
    for segs in (1, 2, 4, 8):
        try:
            out, caches = run_segmented(segs, caches)  # compile
            jax.block_until_ready(out)
        except TypeError:
            print("segment API signature mismatch; skipping probe")
            return
        t0 = _time.perf_counter()
        reps = 6
        for _ in range(reps):
            out, caches = run_segmented(segs, caches)
        jax.block_until_ready(out)
        ms = (_time.perf_counter() - t0) / reps * 1000
        print(f"segments={segs}: {ms:.2f} ms/prefill (T={t}, host-timed "
              "incl. dispatch boundaries)")


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
    p.add_argument("--prefill", action="store_true",
                   help="prefill-side report instead of decode")
    p.add_argument("--prefill-lens", type=int, nargs="+",
                   default=[512, 1024, 2048])
    args = p.parse_args()
    if args.prefill:
        prefill_report(args)
        return

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
