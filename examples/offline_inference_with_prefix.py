"""Shared-prefix generation with prefix caching (reference role:
examples/offline_inference_with_prefix.py): the long shared prefix's KV
pages are computed once and reused by every later request."""
from vllm_splitwise_tpu import LLM, SamplingParams

prefix = (
    "You are an expert school principal, skilled in effectively managing "
    "faculty and staff. Draft 10-15 questions for a potential first grade "
    "Head Teacher for my K-12, all-girls', independent school that "
    "emphasizes community, joyful discovery, and life-long learning. The "
    "candidate is coming in for a first-round panel interview for a 8th "
    "grade Math teaching role. Based on these information, fulfill "
    "the following paragraph: ")

prompts = [
    "Hello, my name is",
    "The president of the United States is",
    "The capital of France is",
    "The future of AI is",
]
sampling_params = SamplingParams(temperature=0.0)

llm = LLM(model="facebook/opt-125m", enable_prefix_caching=True)
generating_prompts = [prefix + prompt for prompt in prompts]

# First batch computes the prefix KV once per unique prefix block run.
outputs = llm.generate(generating_prompts, sampling_params)
for output in outputs:
    print(f"Prompt: {output.prompt[:40]!r}..., "
          f"Generated: {output.outputs[0].text!r}")

print("-" * 80)

# Subsequent requests sharing the prefix hit the cached pages: only the
# unique suffix is prefetched, cutting TTFT for long system prompts.
outputs = llm.generate(generating_prompts, sampling_params)
for output in outputs:
    print(f"Prompt: {output.prompt[:40]!r}..., "
          f"Generated: {output.outputs[0].text!r}")
