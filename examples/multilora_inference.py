"""Multi-LoRA offline serving (reference role:
examples/multilora_inference.py): mix base-model and adapter requests in
one continuously-batched engine; with max_loras=1 the second adapter's
requests wait until the first adapter's finish.

Point --lora-path at a local PEFT checkout (adapter_config.json +
adapter weights); zero-egress environments must have it on disk.
"""
import argparse
from typing import List, Optional, Tuple

from vllm_splitwise_tpu import SamplingParams
from vllm_splitwise_tpu.engine.arg_utils import EngineArgs
from vllm_splitwise_tpu.engine.llm_engine import LLMEngine
from vllm_splitwise_tpu.lora.request import LoRARequest


def create_test_prompts(
    lora_path: str,
) -> List[Tuple[str, SamplingParams, Optional[LoRARequest]]]:
    """2 base-model requests + 2 requests for each of 2 adapters (the
    same weights under two ids, for demo purposes)."""
    lora1 = LoRARequest("adapter-1", 1, lora_path)
    lora2 = LoRARequest("adapter-2", 2, lora_path)
    return [
        ("A robot may not injure a human being",
         SamplingParams(temperature=0.0, max_tokens=64), None),
        ("To be or not to be,",
         SamplingParams(temperature=0.8, top_k=5, max_tokens=64), None),
        ("Write a SQL query listing all airports in Malawi.",
         SamplingParams(temperature=0.0, max_tokens=64), lora1),
        ("Write a SQL query counting flights per airline.",
         SamplingParams(temperature=0.0, max_tokens=64), lora1),
        ("Summarize the plot of Hamlet.",
         SamplingParams(temperature=0.0, max_tokens=64), lora2),
        ("Translate 'good morning' to French.",
         SamplingParams(temperature=0.0, max_tokens=64), lora2),
    ]


def main(args: argparse.Namespace):
    engine_args = EngineArgs.from_cli_args(args)
    engine_args.enable_lora = True
    engine_args.max_loras = 1
    engine_args.max_lora_rank = 8
    engine = LLMEngine.from_engine_args(engine_args)

    pending = create_test_prompts(args.lora_path)
    request_id = 0
    while pending or engine.has_unfinished_requests():
        if pending:
            prompt, params, lora_request = pending.pop(0)
            engine.add_request(str(request_id), prompt, params,
                               lora_request=lora_request)
            request_id += 1
        for out in engine.step():
            if out.finished:
                print(out.request_id, out.outputs[0].text[:80])


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Multi-LoRA demo")
    parser.add_argument("--lora-path", required=True,
                        help="local PEFT adapter directory")
    parser = EngineArgs.add_cli_args(parser)
    main(parser.parse_args())
