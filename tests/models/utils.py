"""Tiny locally-constructed models for HF-oracle tests (no network)."""
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tiny_llama_config(vocab_size=256,
                      hidden_size=64,
                      layers=2,
                      heads=4,
                      kv_heads=2,
                      intermediate=128,
                      max_pos=512):
    from transformers import LlamaConfig
    return LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        max_position_embeddings=max_pos,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )


def tiny_opt_config(vocab_size=256,
                    hidden_size=64,
                    layers=2,
                    heads=4,
                    ffn=128,
                    max_pos=512):
    from transformers import OPTConfig
    return OPTConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        ffn_dim=ffn,
        max_position_embeddings=max_pos,
        word_embed_proj_dim=hidden_size,
        do_layer_norm_before=True,
    )


def hf_model_and_weights(config, seed=0):
    """Build a random torch HF model; return (torch_model, state_dict items)."""
    import torch
    from transformers import AutoModelForCausalLM
    torch.manual_seed(seed)
    model = AutoModelForCausalLM.from_config(config)
    model = model.float().eval()
    weights = [(k, v.detach().numpy()) for k, v in model.state_dict().items()]
    return model, weights


def make_kv_caches(num_layers: int,
                   num_kv_heads: int,
                   head_dim: int,
                   num_pages=32,
                   page_size=16,
                   dtype=jnp.float32) -> List[Tuple[jax.Array, jax.Array]]:
    # Page-major layout with head-major interior
    # [pages, kvh, page_size, head_dim].
    return [(jnp.zeros((num_pages, num_kv_heads, page_size, head_dim),
                       dtype=dtype),
             jnp.zeros((num_pages, num_kv_heads, page_size, head_dim),
                       dtype=dtype)) for _ in range(num_layers)]


def save_local_checkpoint(config, weights, tmpdir: str) -> str:
    """Write config.json + model.safetensors so the engine can load it as a
    local 'checkpoint directory'."""
    import os
    from safetensors.numpy import save_file
    os.makedirs(tmpdir, exist_ok=True)
    if getattr(config, "architectures", None) is None:
        config.architectures = [
            config.__class__.__name__.replace("Config", "ForCausalLM")]
    config.save_pretrained(tmpdir)
    tensors = {k: np.ascontiguousarray(v) for k, v in weights}
    save_file(tensors, os.path.join(tmpdir, "model.safetensors"))
    return tmpdir


def save_tiny_tokenizer(tmpdir: str, vocab_size: int = 256,
                        extra_words=()) -> str:
    """Write a self-contained fast tokenizer (WordLevel 't<i>' vocab) so
    engine tests run fully offline.  `extra_words` replace the TAIL of
    the t<i> range (ids stay dense) — e.g. JSON punctuation words for
    guided-json tests."""
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i in range(3, vocab_size - len(extra_words)):
        vocab[f"t{i}"] = i
    for j, word in enumerate(extra_words):
        vocab[word] = vocab_size - len(extra_words) + j
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="<unk>",
                                   bos_token="<s>", eos_token="</s>")
    fast.save_pretrained(tmpdir)
    return tmpdir


def tiny_mixtral_config(vocab_size=256,
                        hidden_size=64,
                        layers=2,
                        heads=4,
                        kv_heads=2,
                        intermediate=96,
                        experts=4,
                        topk=2,
                        max_pos=512):
    from transformers import MixtralConfig
    return MixtralConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=kv_heads,
        num_local_experts=experts,
        num_experts_per_tok=topk,
        max_position_embeddings=max_pos,
        sliding_window=None,
        tie_word_embeddings=False,
    )
