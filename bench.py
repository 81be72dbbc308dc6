"""Headline benchmark: steady-state decode throughput (tokens/s/chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Workload: Llama-2-7B-shaped model (dummy weights), bf16, continuous
decode at fixed batch over the paged KV cache on one chip — the engine's
hot loop.  ``vs_baseline`` compares single-stream decode speed against the
reference fork's committed Llama-3-8B serving results (p50 TPOT 15.2 ms @
0.25 req/s => 65.8 tok/s/stream on a >=24GB GPU; see BASELINE.md) — the
closest hardware-normalized number the reference publishes.

Auto-sizes the model to the chip's HBM so the bench also runs on smaller
devices (and with --smoke on CPU).
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# p50 single-stream decode tok/s of the reference fork's own committed
# Llama-3-8B @0.25req/s run (1/15.2ms, BASELINE.md).
_BASELINE_STREAM_TOKS = 65.8

_SHAPES = {
    # name: (hidden, inter, layers, heads, kv_heads, vocab, ~bf16 GiB)
    "7b": (4096, 11008, 32, 32, 32, 32000, 13.5),
    "1b": (2048, 5504, 22, 16, 4, 32000, 2.2),
    "tiny": (1024, 2048, 4, 8, 8, 1024, 0.08),
}


def pick_size(smoke: bool) -> str:
    if smoke:
        return "tiny"
    stats = jax.devices()[0].memory_stats() or {}
    limit = stats.get("bytes_limit", 0)
    if limit >= 17 * 2**30:
        return "7b"
    if limit >= 4 * 2**30:
        return "1b"
    return "tiny"


def build(size: str):
    from transformers import LlamaConfig

    from vllm_splitwise_tpu.layers.sampler import SamplingTensors, sample
    from vllm_splitwise_tpu.models.input_metadata import DecodeMetadata
    from vllm_splitwise_tpu.models.llama import LlamaForCausalLM

    h, inter, layers, heads, kv, vocab, _ = _SHAPES[size]
    config = LlamaConfig(vocab_size=vocab, hidden_size=h,
                         intermediate_size=inter, num_hidden_layers=layers,
                         num_attention_heads=heads, num_key_value_heads=kv,
                         max_position_embeddings=4096,
                         tie_word_embeddings=False)
    model = LlamaForCausalLM(config, dtype=jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params, config, (SamplingTensors, sample, DecodeMetadata)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--smoke", action="store_true",
                        help="tiny model (CI/CPU)")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--context", type=int, default=768,
                        help="KV context length per sequence (matches the "
                        "reference workload's ~772-token mean prompts)")
    parser.add_argument("--steps", type=int, default=64)
    parser.add_argument("--size", choices=list(_SHAPES), default=None)
    args = parser.parse_args()

    size = args.size or pick_size(args.smoke)
    model, params, config, (SamplingTensors, sample, DecodeMetadata) = \
        build(size)

    page_size = 16
    pages_per_seq = -(-args.context // page_size) + 8
    num_pages = args.batch * pages_per_seq
    b = args.batch

    kv_caches = [(jnp.zeros((model.num_kv_heads, num_pages, page_size,
                             model.head_dim), dtype=jnp.bfloat16),
                  jnp.zeros((model.num_kv_heads, num_pages, page_size,
                             model.head_dim), dtype=jnp.bfloat16))
                 for _ in range(model.num_layers)]

    tables = np.zeros((b, pages_per_seq), dtype=np.int32)
    for i in range(b):
        tables[i] = np.arange(i * pages_per_seq, (i + 1) * pages_per_seq)
    ctx0 = args.context

    tensors = SamplingTensors(
        temperature=jnp.ones((b, ), jnp.float32),
        top_p=jnp.ones((b, ), jnp.float32),
        top_k=jnp.full((b, ), config.vocab_size, jnp.int32),
        min_p=jnp.zeros((b, ), jnp.float32),
        greedy_mask=jnp.ones((b, ), bool),
        presence_penalty=jnp.zeros((b, ), jnp.float32),
        frequency_penalty=jnp.zeros((b, ), jnp.float32),
        repetition_penalty=jnp.ones((b, ), jnp.float32),
        prompt_tokens=jnp.zeros((b, 0), jnp.int32),
        output_tokens=jnp.zeros((b, 0), jnp.int32),
    )

    def step(params, tokens, positions, kv_caches, md, tensors, seeds):
        hidden, caches = model(params, tokens, positions, kv_caches, md)
        logits = model.compute_logits(params, hidden[:, 0])
        out = sample(logits, tensors, seeds, needs_filtering=False)
        return out.sampled_tokens, caches

    step = jax.jit(step, donate_argnums=(3, ))

    tables_j = jnp.asarray(tables)
    tokens = jnp.ones((b, 1), dtype=jnp.int32)
    seeds = jnp.zeros((b, ), jnp.uint32)

    def make_md(ctx):
        base = (np.arange(b) * pages_per_seq * page_size).astype(np.int32)
        return DecodeMetadata(
            block_tables=tables_j,
            context_lens=jnp.full((b, ), ctx + 1, dtype=jnp.int32),
            slot_mapping=jnp.asarray(base + ctx),
        )

    # Warmup (compile).
    t, kv_caches = step(params, tokens, jnp.full((b, 1), ctx0, jnp.int32),
                        kv_caches, make_md(ctx0), tensors, seeds)
    jax.block_until_ready(t)

    start = time.perf_counter()
    for i in range(args.steps):
        ctx = ctx0 + 1 + i
        t, kv_caches = step(params, t.reshape(b, 1),
                            jnp.full((b, 1), ctx, jnp.int32), kv_caches,
                            make_md(ctx), tensors, seeds)
    jax.block_until_ready(t)
    elapsed = time.perf_counter() - start

    toks_per_s = args.steps * b / elapsed
    stream_toks = args.steps / elapsed
    print(json.dumps({
        "metric": f"decode_tokens_per_s_per_chip_llama_{size}_bf16_b{b}",
        "value": round(toks_per_s, 2),
        "unit": "tokens/s/chip",
        "vs_baseline": round(stream_toks / _BASELINE_STREAM_TOKS, 3),
    }))


if __name__ == "__main__":
    main()
