"""Speculative-decoding step-cost benchmark (TPU extension; no reference
analog — the reference never wires spec decode into its engine).

Measures, on the real engine with a synthetic 7B GPTQ target and a
llama-160m-shaped draft: plain decode TPOT vs fused spec-step latency,
plus the measured acceptance rate.  With RANDOM weights the draft never
matches the target (acceptance ~0, every step emits exactly 1 token), so
the spec numbers here are the WORST CASE; the implied speedup at a given
real-world acceptance rate a is

    speedup(a) = [ (1 - a^(k+1)) / (1 - a) ] * T_plain / T_spec.

Usage:
    python benchmarks/benchmark_spec_decode.py \
        --model /root/syn7b-gptq --draft /root/syn-draft -k 4
"""
import argparse
import json
import time


def run(args, spec: bool):
    from vllm_splitwise_tpu import LLM, SamplingParams
    kwargs = dict(model=args.model, quantization=args.quantization,
                  kv_cache_dtype=args.kv_cache_dtype,
                  max_model_len=args.max_model_len,
                  max_num_seqs=args.batch)
    if spec:
        kwargs.update(speculative_model=args.draft,
                      num_speculative_tokens=args.k)
    llm = LLM(**kwargs)
    engine = llm.llm_engine
    import numpy as np
    rng = np.random.RandomState(0)
    vocab = engine.model_config.get_vocab_size()
    for i in range(args.batch):
        engine.add_request(
            str(i), None,
            SamplingParams(temperature=0.0, max_tokens=args.steps * 8,
                           ignore_eos=True),
            prompt_token_ids=rng.randint(10, vocab,
                                         size=args.input_len).tolist())
    # prefill + first window (compile already warmed by startup warmup)
    engine.step()
    engine.step()
    t0 = time.perf_counter()
    emitted0 = None
    runner = engine.executor.worker.model_runner
    if spec:
        emitted0 = runner.spec_stats.num_emitted
    n = 0
    for _ in range(args.steps):
        engine.step()
        n += 1
    dt = (time.perf_counter() - t0) / n
    out = {"step_ms": round(dt * 1000, 2), "batch": args.batch}
    if getattr(args, "profile", False):
        # Device-lane decomposition of the steady-state step: where the
        # spec window's milliseconds actually go (draft scan vs verify
        # vs sampling vs host gaps) — host wall-clock can't see this.
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "kernels"))
        from trace_timing import device_kernel_times
        times = device_kernel_times(lambda: [engine.step()
                                             for _ in range(4)])
        top = sorted(times.items(), key=lambda kv: -kv[1][0])[:14]
        dev_total = sum(ms for ms, _ in times.values())
        print(json.dumps({"profile_device_ms_per_step":
                          round(dev_total / 4, 2)}), flush=True)
        for name, (ms, cnt) in top:
            print(f"  {ms/4:8.2f} ms/step x{cnt//4:<4d} {name[:90]}",
                  file=sys.stderr, flush=True)
    if spec:
        s = runner.spec_stats
        tokens = s.num_emitted - emitted0
        out.update(acceptance=round(s.acceptance_rate, 4),
                   tokens_per_step=round(s.mean_tokens_per_step, 3),
                   ms_per_token=round(dt * 1000 * n * args.batch /
                                      max(tokens, 1), 2))
    else:
        # plain engine: num_decode_steps=1 -> one token per seq per step
        out.update(ms_per_token=round(dt * 1000, 2))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--draft", required=True)
    p.add_argument("--quantization", "-q", default="gptq")
    p.add_argument("--kv-cache-dtype", default="int8")
    p.add_argument("--max-model-len", type=int, default=1024)
    p.add_argument("--input-len", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=24)
    p.add_argument("-k", type=int, default=4)
    p.add_argument("--profile", action="store_true",
                   help="device-trace the steady-state step and print "
                   "the top kernels (needs real TPU)")
    p.add_argument("--spec-only", action="store_true",
                   help="skip the plain-engine leg")
    args = p.parse_args()

    if args.spec_only:
        spec = run(args, spec=True)
        print(json.dumps({"mode": f"spec_k{args.k}", **spec}), flush=True)
        return

    plain = run(args, spec=False)
    print(json.dumps({"mode": "plain", **plain}), flush=True)
    spec = run(args, spec=True)
    print(json.dumps({"mode": f"spec_k{args.k}", **spec}), flush=True)
    tp, ts = plain["step_ms"], spec["step_ms"]
    for a in (0.0, 0.5, 0.7, 0.8):
        exp_tokens = sum(a**i for i in range(args.k + 1))
        print(json.dumps({
            "implied_speedup_at_acceptance": a,
            "value": round(exp_tokens * tp / ts, 3)
        }), flush=True)


if __name__ == "__main__":
    main()
