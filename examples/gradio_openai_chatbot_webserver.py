"""Gradio chatbot UI over the OpenAI-compatible server (reference role:
examples/gradio_openai_chatbot_webserver.py).

Start the OpenAI server first:

    python -m vllm_splitwise_tpu.entrypoints.openai.api_server \
        --model <path> --served-model-name mymodel

then this UI (requires `pip install gradio openai`, not bundled in the
TPU image):

    python examples/gradio_openai_chatbot_webserver.py \
        --model-url http://localhost:8000/v1 --model mymodel
"""
import argparse


def predict_factory(args):
    from openai import OpenAI
    client = OpenAI(api_key=args.api_key, base_url=args.model_url)

    def predict(message, history):
        messages = []
        for user, assistant in history:
            messages.append({"role": "user", "content": user})
            messages.append({"role": "assistant", "content": assistant})
        messages.append({"role": "user", "content": message})
        stream = client.chat.completions.create(
            model=args.model,
            messages=messages,
            temperature=args.temp,
            stream=True,
            extra_body={
                "repetition_penalty": 1.0,
                "stop_token_ids": ([int(t) for t in
                                    args.stop_token_ids.split(",")]
                                   if args.stop_token_ids else []),
            })
        partial = ""
        for chunk in stream:
            delta = chunk.choices[0].delta.content or ""
            partial += delta
            yield partial

    return predict


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Chatbot interface over the OpenAI-compatible server")
    parser.add_argument("--model-url", type=str,
                        default="http://localhost:8000/v1")
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--api-key", type=str, default="EMPTY")
    parser.add_argument("--temp", type=float, default=0.8)
    parser.add_argument("--stop-token-ids", type=str, default="")
    parser.add_argument("--host", type=str, default=None)
    parser.add_argument("--port", type=int, default=8002)
    args = parser.parse_args()

    try:
        import gradio as gr
    except ImportError as exc:  # pragma: no cover - UI-only dependency
        raise SystemExit(
            "gradio is not installed in this image; `pip install gradio` "
            "in a networked environment to run this demo") from exc

    gr.ChatInterface(predict_factory(args)).queue().launch(
        server_name=args.host, server_port=args.port, share=False)
