"""Gradio demo UI over the plain /generate API server (reference role:
examples/gradio_webserver.py).

Start the engine server first:

    python -m vllm_splitwise_tpu.entrypoints.api_server --model <path>

then this UI (requires `pip install gradio`, not bundled in the TPU
image):

    python examples/gradio_webserver.py --model-url http://localhost:8000/generate
"""
import argparse
import json

import requests


def http_bot(prompt, model_url, max_tokens):
    headers = {"User-Agent": "vllm-splitwise-tpu gradio client"}
    payload = {
        "prompt": prompt,
        "stream": True,
        "max_tokens": int(max_tokens),
    }
    response = requests.post(model_url, headers=headers, json=payload,
                             stream=True)
    for chunk in response.iter_lines(chunk_size=8192,
                                     decode_unicode=False,
                                     delimiter=b"\0"):
        if chunk:
            data = json.loads(chunk.decode("utf-8"))
            yield data["text"][0]


def build_demo(args):
    try:
        import gradio as gr
    except ImportError as exc:  # pragma: no cover - UI-only dependency
        raise SystemExit(
            "gradio is not installed in this image; `pip install gradio` "
            "in a networked environment to run this demo") from exc

    with gr.Blocks() as demo:
        gr.Markdown("# vllm_splitwise_tpu text completion demo\n")
        inputbox = gr.Textbox(label="Input",
                              placeholder="Enter text and press ENTER")
        outputbox = gr.Textbox(label="Output",
                               placeholder="Generated result")
        max_tokens = gr.Slider(1, 1024, value=128, step=1,
                               label="Max new tokens")
        inputbox.submit(
            lambda p, m: next(iter([None])) or _drain(p, args.model_url, m),
            [inputbox, max_tokens], [outputbox])
    return demo


def _drain(prompt, url, max_tokens):
    text = prompt
    for text in http_bot(prompt, url, max_tokens):
        pass
    return text


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default=None)
    parser.add_argument("--port", type=int, default=8001)
    parser.add_argument("--model-url", type=str,
                        default="http://localhost:8000/generate")
    args = parser.parse_args()
    demo = build_demo(args)
    demo.queue().launch(server_name=args.host, server_port=args.port,
                        share=False)
