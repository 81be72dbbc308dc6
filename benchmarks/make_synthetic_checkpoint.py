"""Synthesize a GPTQ-serialized Llama checkpoint with random weights.

The serving benchmarks need a full-size quantized checkpoint that loads
through the REAL engine path (HF config + safetensors + AutoGPTQ tensor
layout, reference loader parity: vllm/model_executor/weight_utils.py +
layers/quantization/gptq.py) without any network access.  Weights are
random — throughput/latency numbers are exact, outputs are gibberish.

    python benchmarks/make_synthetic_checkpoint.py --size 7b --out /tmp/syn7b

Sizes match bench.py's _SHAPES.  Also writes a self-contained WordLevel
tokenizer so detokenization works offline.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

_SHAPES = {
    # name: (hidden, inter, layers, heads, kv_heads, vocab)
    "7b": (4096, 11008, 32, 32, 32, 32000),
    "1b": (2048, 5504, 22, 16, 4, 32000),
    # llama-160m-shaped: the classic speculative-decoding draft size
    "draft": (768, 2048, 12, 12, 12, 32000),
    "tiny": (1024, 2048, 4, 8, 8, 1024),
}


def make_gptq_tensors(rng, in_dim, out_dim, group):
    """Random AutoGPTQ-layout tensors for one linear layer."""
    ng = in_dim // group
    qweight = rng.integers(np.iinfo(np.int32).min,
                           np.iinfo(np.int32).max,
                           size=(in_dim // 8, out_dim),
                           dtype=np.int32)
    # Zeros near the int4 midpoint (AutoGPTQ stores zero-1; 0x7777...
    # unpacks to 7 everywhere => zero point 8).
    qzeros = np.full((ng, out_dim // 8), 0x77777777, dtype=np.int32)
    scales = (rng.random((ng, out_dim), dtype=np.float32) * 0.01 +
              0.005).astype(np.float16)
    g_idx = (np.arange(in_dim, dtype=np.int32) // group)
    return qweight, qzeros, scales, g_idx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", choices=list(_SHAPES), default="7b")
    parser.add_argument("--out", required=True)
    parser.add_argument("--group-size", type=int, default=128)
    parser.add_argument("--format", choices=["gptq", "fp16"],
                        default="gptq",
                        help="fp16 writes a plain (unquantized) "
                        "checkpoint - e.g. a speculative draft model")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-pos", type=int, default=4096)
    args = parser.parse_args()

    from safetensors.numpy import save_file
    from transformers import LlamaConfig

    from models.utils import save_tiny_tokenizer

    h, inter, layers, heads, kv, vocab = _SHAPES[args.size]
    hd = h // heads
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    config = LlamaConfig(
        vocab_size=vocab, hidden_size=h, intermediate_size=inter,
        num_hidden_layers=layers, num_attention_heads=heads,
        num_key_value_heads=kv, max_position_embeddings=args.max_pos,
        tie_word_embeddings=False,
        architectures=["LlamaForCausalLM"])
    if args.format == "gptq":
        config.quantization_config = {
            "quant_method": "gptq", "bits": 4,
            "group_size": args.group_size, "desc_act": False,
        }
    config.save_pretrained(args.out)
    save_tiny_tokenizer(args.out, vocab)

    tensors = {}

    def emb(shape):
        return (rng.standard_normal(shape, dtype=np.float32) *
                0.02).astype(np.float16)

    tensors["model.embed_tokens.weight"] = emb((vocab, h))
    tensors["lm_head.weight"] = emb((vocab, h))
    tensors["model.norm.weight"] = np.ones((h, ), dtype=np.float16)

    shapes = {
        "self_attn.q_proj": (h, heads * hd),
        "self_attn.k_proj": (h, kv * hd),
        "self_attn.v_proj": (h, kv * hd),
        "self_attn.o_proj": (heads * hd, h),
        "mlp.gate_proj": (h, inter),
        "mlp.up_proj": (h, inter),
        "mlp.down_proj": (inter, h),
    }
    for layer in range(layers):
        p = f"model.layers.{layer}."
        tensors[p + "input_layernorm.weight"] = np.ones((h, ),
                                                        dtype=np.float16)
        tensors[p + "post_attention_layernorm.weight"] = np.ones(
            (h, ), dtype=np.float16)
        for name, (din, dout) in shapes.items():
            if args.format == "fp16":
                # HF stores [out, in].
                tensors[p + name + ".weight"] = emb((dout, din))
                continue
            qw, qz, sc, gi = make_gptq_tensors(rng, din, dout,
                                               args.group_size)
            tensors[p + name + ".qweight"] = qw
            tensors[p + name + ".qzeros"] = qz
            tensors[p + name + ".scales"] = sc
            tensors[p + name + ".g_idx"] = gi
        print(f"layer {layer + 1}/{layers} generated", flush=True)

    path = os.path.join(args.out, "model.safetensors")
    save_file(tensors, path)
    gb = os.path.getsize(path) / 1e9
    print(f"wrote {path} ({gb:.2f} GB)")


if __name__ == "__main__":
    main()
