"""Offline single-batch latency benchmark (reference role:
benchmarks/benchmark_latency.py, incl. its profiler option — here the JAX
profiler, traces viewable in TensorBoard/XProf)."""
import argparse
import json
import time

import numpy as np


def main(args):
    from vllm_splitwise_tpu import LLM, SamplingParams

    llm = LLM(model=args.model,
              tokenizer=args.tokenizer,
              quantization=args.quantization,
              tensor_parallel_size=args.tensor_parallel_size,
              sep_prompt_token=args.sep_prompt_token,
              trust_remote_code=args.trust_remote_code,
              dtype=args.dtype,
              enforce_eager=args.enforce_eager,
              kv_cache_dtype=args.kv_cache_dtype)

    sampling_params = SamplingParams(
        n=args.n,
        temperature=0.0 if args.use_beam_search else 1.0,
        top_p=1.0,
        use_beam_search=args.use_beam_search,
        ignore_eos=True,
        max_tokens=args.output_len,
    )
    vocab = llm.llm_engine.model_config.get_vocab_size()
    dummy_prompt_token_ids = np.random.randint(
        10, min(10000, vocab), size=(args.batch_size,
                                     args.input_len)).tolist()

    def run_to_completion(profile_dir=None):
        if profile_dir:
            import jax
            jax.profiler.start_trace(profile_dir)
        start_time = time.perf_counter()
        llm.generate(prompt_token_ids=dummy_prompt_token_ids,
                     sampling_params=sampling_params,
                     use_tqdm=False)
        end_time = time.perf_counter()
        if profile_dir:
            import jax
            jax.profiler.stop_trace()
        return end_time - start_time

    print("Warming up...")
    run_to_completion()

    if args.profile:
        profile_dir = args.profile_result_dir or "jax_profile_latency"
        print(f"Profiling (traces -> {profile_dir})...")
        run_to_completion(profile_dir=profile_dir)
        return

    latencies = [run_to_completion() for _ in range(args.num_iters)]
    print(json.dumps({
        "avg_latency": float(np.mean(latencies)),
        "p50_latency": float(np.percentile(latencies, 50)),
        "p99_latency": float(np.percentile(latencies, 99)),
        "latencies": latencies,
    }))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark the latency of processing a single batch "
        "of requests till completion.")
    parser.add_argument("--model", type=str, default="facebook/opt-125m")
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--quantization", "-q", type=str, default=None)
    parser.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    parser.add_argument("--sep-prompt-token", action="store_true")
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--use-beam-search", action="store_true")
    parser.add_argument("--num-iters", type=int, default=3)
    parser.add_argument("--trust-remote-code", action="store_true")
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--enforce-eager", action="store_true")
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--profile", action="store_true",
                        help="profile with the JAX profiler")
    parser.add_argument("--profile-result-dir", type=str, default=None)
    main(parser.parse_args())
