"""Query the OpenAI-compatible server (reference role:
examples/openai_completion_client.py).  Start the server first:

  python -m vllm_splitwise_tpu.entrypoints.openai.api_server \
      --model facebook/opt-125m
"""
import json

import httpx

BASE = "http://localhost:8000"

# Completions
r = httpx.post(f"{BASE}/v1/completions", json={
    "model": "facebook/opt-125m",
    "prompt": "The capital of France is",
    "max_tokens": 32,
    "temperature": 0.0,
}, timeout=None)
print(json.dumps(r.json(), indent=2))

# Chat with streaming
with httpx.stream("POST", f"{BASE}/v1/chat/completions", json={
    "model": "facebook/opt-125m",
    "messages": [{"role": "user", "content": "Hello!"}],
    "max_tokens": 32,
    "stream": True,
}, timeout=None) as r:
    for line in r.iter_lines():
        if line.startswith("data: ") and line != "data: [DONE]":
            chunk = json.loads(line[len("data: "):])
            delta = chunk["choices"][0]["delta"].get("content", "")
            print(delta, end="", flush=True)
print()
