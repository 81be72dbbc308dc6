"""Offline speculative decoding (TPU extension — the reference ships
vllm/spec_decode as unwired scaffolding; here a draft model accelerates
decode losslessly in one fused device dispatch per window).

Greedy outputs are token-identical to a non-speculative run; draft
quality only changes speed.  Pick a draft sharing the target tokenizer,
e.g. JackFram/llama-68m for Llama-2-7B.
"""
import argparse

from vllm_splitwise_tpu import LLM, SamplingParams


def main(args):
    llm = LLM(model=args.model,
              quantization=args.quantization,
              speculative_model=args.speculative_model,
              num_speculative_tokens=args.num_speculative_tokens)
    prompts = [
        "The future of AI is",
        "The capital of France is",
        "In a shocking turn of events,",
    ]
    params = SamplingParams(temperature=0.0, max_tokens=64)
    for out in llm.generate(prompts, params):
        print(f"{out.prompt!r} -> {out.outputs[0].text!r}")

    stats = llm.llm_engine.executor.worker.model_runner.spec_stats
    print(f"draft acceptance: {stats.acceptance_rate:.1%}, "
          f"tokens/step: {stats.mean_tokens_per_step:.2f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="meta-llama/Llama-2-7b-hf")
    p.add_argument("--quantization", "-q", default=None)
    p.add_argument("--speculative-model", default="JackFram/llama-68m")
    p.add_argument("--num-speculative-tokens", type=int, default=4)
    main(p.parse_args())
