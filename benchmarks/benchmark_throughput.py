"""Offline throughput benchmark (reference role:
benchmarks/benchmark_throughput.py): N requests, random or dataset
lengths, tokens/s."""
import argparse
import json
import random
import time


def sample_requests(num: int, input_len: int, output_len: int,
                    dataset=None, tokenizer=None, seed: int = 0,
                    vocab_size: int = 10000):
    random.seed(seed)
    if dataset is None:
        hi = min(10000, vocab_size)
        return [(None,
                 [random.randint(10, hi - 1) for _ in range(input_len)],
                 output_len) for _ in range(num)]
    # ShareGPT-style dataset: [{"conversations": [{"value": ...}, ...]}]
    with open(dataset) as f:
        data = json.load(f)
    data = [d for d in data if len(d.get("conversations", [])) >= 2]
    sampled = random.sample(data, min(num, len(data)))
    out = []
    for d in sampled:
        prompt = d["conversations"][0]["value"]
        completion = d["conversations"][1]["value"]
        prompt_ids = tokenizer.encode(prompt)
        out_len = len(tokenizer.encode(completion))
        out.append((prompt, prompt_ids, max(out_len, 4)))
    return out


def main(args):
    from vllm_splitwise_tpu import LLM, SamplingParams

    llm = LLM(model=args.model,
              tokenizer=args.tokenizer,
              quantization=args.quantization,
              tensor_parallel_size=args.tensor_parallel_size,
              sep_prompt_token=args.sep_prompt_token,
              trust_remote_code=args.trust_remote_code,
              dtype=args.dtype,
              max_model_len=args.max_model_len,
              kv_cache_dtype=args.kv_cache_dtype,
              max_num_seqs=args.max_num_seqs,
              num_decode_steps=args.num_decode_steps)

    requests = sample_requests(
        args.num_prompts, args.input_len, args.output_len, args.dataset,
        llm.get_tokenizer(), args.seed,
        vocab_size=llm.llm_engine.model_config.get_vocab_size())
    for prompt, prompt_ids, out_len in requests:
        llm._add_request(prompt if prompt_ids is None else None,
                         SamplingParams(n=args.n,
                                        temperature=0.0,
                                        ignore_eos=True,
                                        max_tokens=out_len),
                         prompt_ids)
    start = time.perf_counter()
    outputs = llm._run_engine(use_tqdm=True)
    elapsed = time.perf_counter() - start

    total_in = sum(len(p) for _, p, _ in requests)
    total_out = sum(sum(len(c.token_ids) for c in o.outputs)
                    for o in outputs)
    print(json.dumps({
        "elapsed_s": elapsed,
        "requests_per_s": len(requests) / elapsed,
        "input_tokens_per_s": total_in / elapsed,
        "output_tokens_per_s": total_out / elapsed,
        "total_tokens_per_s": (total_in + total_out) / elapsed,
    }))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Benchmark throughput.")
    parser.add_argument("--model", type=str, default="facebook/opt-125m")
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--quantization", "-q", type=str, default=None)
    parser.add_argument("--tensor-parallel-size", "-tp", type=int, default=1)
    parser.add_argument("--sep-prompt-token", action="store_true")
    parser.add_argument("--dataset", type=str, default=None,
                        help="ShareGPT-style JSON; random lengths if unset")
    parser.add_argument("--input-len", type=int, default=256)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--num-prompts", type=int, default=100)
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--trust-remote-code", action="store_true")
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--max-num-seqs", type=int, default=256)
    parser.add_argument("--num-decode-steps", type=int, default=1,
                        help="decode steps fused per device dispatch")
    main(parser.parse_args())
