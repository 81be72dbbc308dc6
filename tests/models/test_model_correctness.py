"""Golden-reference correctness vs HuggingFace transformers (the central
test pattern of the reference, tests/basic_correctness/): identical weights
-> prefill logits must match HF forward logits; decode via the paged KV
cache must match HF with growing context."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_splitwise_tpu.models.input_metadata import (DecodeMetadata,
                                                      PrefillMetadata)
from vllm_splitwise_tpu.models.llama import LlamaForCausalLM
from vllm_splitwise_tpu.models.opt import OPTForCausalLM

from .utils import (hf_model_and_weights, make_kv_caches, tiny_llama_config,
                    tiny_opt_config)

PAGE_SIZE = 16


def run_prefill(model, params, token_ids: np.ndarray, num_layers, kv_heads,
                head_dim):
    """token_ids: [B, T] (no padding). Returns logits [B, T, V], caches."""
    b, t = token_ids.shape
    kv_caches = make_kv_caches(num_layers, kv_heads, head_dim,
                               num_pages=b * 8, page_size=PAGE_SIZE)
    # Seq i uses pages [i*8, (i+1)*8): slot = page * PAGE_SIZE + offset.
    slots = np.zeros((b, t), dtype=np.int32)
    for i in range(b):
        slots[i] = i * 8 * PAGE_SIZE + np.arange(t)
    md = PrefillMetadata(
        seq_lens=jnp.asarray([t] * b, dtype=jnp.int32),
        slot_mapping=jnp.asarray(slots),
    )
    positions = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    hidden, caches = model(params, jnp.asarray(token_ids), positions,
                           kv_caches, md)
    logits = model.compute_logits(params, hidden)
    return np.asarray(logits), caches


@pytest.mark.parametrize("arch", ["llama", "opt"])
def test_prefill_logits_match_hf(arch):
    import torch
    if arch == "llama":
        config = tiny_llama_config()
        hf, weights = hf_model_and_weights(config)
        model = LlamaForCausalLM(config, dtype=jnp.float32)
        kv_heads, head_dim = model.num_kv_heads, model.head_dim
    else:
        config = tiny_opt_config()
        hf, weights = hf_model_and_weights(config)
        model = OPTForCausalLM(config, dtype=jnp.float32)
        kv_heads, head_dim = model.num_heads, model.head_dim
    params = model.load_weights(weights)

    rng = np.random.RandomState(0)
    token_ids = rng.randint(0, config.vocab_size, size=(2, 12))

    ours, _ = run_prefill(model, params, token_ids, model.num_layers,
                          kv_heads, head_dim)

    with torch.no_grad():
        hf_logits = hf(torch.tensor(token_ids)).logits.numpy()

    np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("arch", ["llama", "opt"])
def test_decode_matches_hf(arch):
    """Greedy-decode 6 tokens through the paged cache; token ids must equal
    HF greedy generation."""
    import torch
    if arch == "llama":
        config = tiny_llama_config()
        hf, weights = hf_model_and_weights(config)
        model = LlamaForCausalLM(config, dtype=jnp.float32)
        kv_heads, head_dim = model.num_kv_heads, model.head_dim
    else:
        config = tiny_opt_config()
        hf, weights = hf_model_and_weights(config)
        model = OPTForCausalLM(config, dtype=jnp.float32)
        kv_heads, head_dim = model.num_heads, model.head_dim
    params = model.load_weights(weights)

    rng = np.random.RandomState(1)
    prompt_len = 9
    token_ids = rng.randint(0, config.vocab_size, size=(1, prompt_len))
    n_decode = 6

    # HF greedy.
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor(token_ids),
                             max_new_tokens=n_decode, do_sample=False)
    hf_tokens = hf_out[0, prompt_len:].numpy().tolist()

    # Ours: prefill then paged decode.
    logits, caches = run_prefill(model, params, token_ids, model.num_layers,
                                 kv_heads, head_dim)
    next_token = int(np.argmax(logits[0, prompt_len - 1]))
    our_tokens = [next_token]
    block_table = np.arange(8, dtype=np.int32)[None, :]  # seq 0 pages

    ctx = prompt_len
    for _ in range(n_decode - 1):
        md = DecodeMetadata(
            block_tables=jnp.asarray(block_table),
            context_lens=jnp.asarray([ctx + 1], dtype=jnp.int32),
            slot_mapping=jnp.asarray([ctx], dtype=jnp.int32),
        )
        positions = jnp.asarray([[ctx]], dtype=jnp.int32)
        hidden, caches = model(params, jnp.asarray([[next_token]]),
                               positions, caches, md)
        logits_d = model.compute_logits(params, hidden)
        next_token = int(np.argmax(np.asarray(logits_d)[0, 0]))
        our_tokens.append(next_token)
        ctx += 1

    assert our_tokens == hf_tokens
