"""Phase-disaggregated (Splitwise) offline generation (reference role:
examples/offline_splitwise_inference.py).

Run:
    python examples/offline_splitwise_inference.py \
        --model <path> --sep-prompt-token

With --sep-prompt-token the engine builds a prefill pool and a decode
pool; prompt KV pages stream to the decode pool layer-by-layer during
prefill (see docs/splitwise.md).
"""
import argparse

from vllm_splitwise_tpu import LLM, SamplingParams
from vllm_splitwise_tpu.engine.arg_utils import EngineArgs

prompts = [
    "Life blooms like a flower. Far away or by the road. Waiting",
    "A quick brown fox",
    "Artificial intelligence is",
    "The future of serving systems is",
]


def main():
    from vllm_splitwise_tpu.engine.llm_engine import LLMEngine

    parser = argparse.ArgumentParser(description="Splitwise example")
    parser = EngineArgs.add_cli_args(parser)
    args = parser.parse_args()

    engine = LLMEngine.from_engine_args(EngineArgs.from_cli_args(args))
    sampling_params = SamplingParams(temperature=0.0, max_tokens=32)
    for i, prompt in enumerate(prompts):
        engine.add_request(str(i), prompt, sampling_params)
    finished = []
    while engine.has_unfinished_requests():
        finished.extend(o for o in engine.step() if o.finished)
    for output in sorted(finished, key=lambda o: int(o.request_id)):
        print(f"Prompt: {output.prompt!r}")
        print(f"  -> {output.outputs[0].text!r}")


if __name__ == "__main__":
    main()
