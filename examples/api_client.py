"""Example Python client for the demo /generate API server (reference
role: examples/api_client.py).

Start the server first:
    python -m vllm_splitwise_tpu.entrypoints.api_server --model <path>
"""
import argparse
import json
from typing import Iterable, List

import requests


def clear_line(n: int = 1) -> None:
    LINE_UP = "\033[1A"
    LINE_CLEAR = "\x1b[2K"
    for _ in range(n):
        print(LINE_UP, end=LINE_CLEAR, flush=True)


def post_http_request(prompt: str, api_url: str, n: int = 1,
                      stream: bool = False) -> requests.Response:
    headers = {"User-Agent": "Test Client"}
    pload = {
        "prompt": prompt,
        "n": n,
        "temperature": 0.0,
        "max_tokens": 16,
        "stream": stream,
    }
    return requests.post(api_url, headers=headers, json=pload,
                         stream=stream)


def get_streaming_response(response: requests.Response) -> Iterable[List[str]]:
    for chunk in response.iter_lines(chunk_size=8192, delimiter=b"\0"):
        if chunk:
            data = json.loads(chunk.decode("utf-8"))
            yield data["text"]


def get_response(response: requests.Response) -> List[str]:
    return json.loads(response.content)["text"]


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--prompt", type=str, default="San Francisco is a")
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()

    api_url = f"http://{args.host}:{args.port}/generate"
    print(f"Prompt: {args.prompt!r}\n", flush=True)
    response = post_http_request(args.prompt, api_url, args.n, args.stream)

    if args.stream:
        num_printed_lines = 0
        for h in get_streaming_response(response):
            clear_line(num_printed_lines)
            num_printed_lines = 0
            for i, line in enumerate(h):
                num_printed_lines += 1
                print(f"Beam candidate {i}: {line!r}", flush=True)
    else:
        for i, line in enumerate(get_response(response)):
            print(f"Output {i}: {line!r}", flush=True)
