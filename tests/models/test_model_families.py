"""HF-oracle prefill-logit equality across all model families with a
transformers implementation (reference pattern: tests/models/test_models.py
over ~10 archs)."""
import jax.numpy as jnp
import numpy as np
import pytest

from .test_model_correctness import run_prefill
from .utils import hf_model_and_weights


def _llama_like(config_cls, model_path, **kw):
    def factory():
        import importlib

        import transformers
        config = getattr(transformers, config_cls)(**kw)
        module, cls_name = model_path.rsplit(".", 1)
        cls = getattr(importlib.import_module(module), cls_name)
        return config, cls
    return factory


CASES = {
    "qwen2": _llama_like(
        "Qwen2Config", "vllm_splitwise_tpu.models.qwen2.Qwen2ForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=False),
    "gemma": _llama_like(
        "GemmaConfig", "vllm_splitwise_tpu.models.gemma.GemmaForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=512),
    "gpt2": _llama_like(
        "GPT2Config", "vllm_splitwise_tpu.models.gpt2.GPT2LMHeadModel",
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=512),
    "gpt_neox": _llama_like(
        "GPTNeoXConfig",
        "vllm_splitwise_tpu.models.gpt_neox.GPTNeoXForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=512, rotary_pct=0.5),
    "gpt_neox_seq": _llama_like(
        "GPTNeoXConfig",
        "vllm_splitwise_tpu.models.gpt_neox.GPTNeoXForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=512, use_parallel_residual=False),
    "gptj": _llama_like(
        "GPTJConfig", "vllm_splitwise_tpu.models.gpt_j.GPTJForCausalLM",
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=512,
        rotary_dim=8),
    "bloom": _llama_like(
        "BloomConfig", "vllm_splitwise_tpu.models.bloom.BloomForCausalLM",
        vocab_size=256, hidden_size=64, n_layer=2, n_head=4),
    "phi": _llama_like(
        "PhiConfig", "vllm_splitwise_tpu.models.phi.PhiForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=512, partial_rotary_factor=0.5),
    "stablelm": _llama_like(
        "StableLmConfig",
        "vllm_splitwise_tpu.models.stablelm.StableLmForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, partial_rotary_factor=0.25,
        use_qkv_bias=True, tie_word_embeddings=False),
    "starcoder2": _llama_like(
        "Starcoder2Config",
        "vllm_splitwise_tpu.models.starcoder2.Starcoder2ForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, tie_word_embeddings=True),
    "gpt_bigcode": _llama_like(
        "GPTBigCodeConfig",
        "vllm_splitwise_tpu.models.gpt_bigcode.GPTBigCodeForCausalLM",
        vocab_size=256, n_embd=64, n_layer=2, n_head=4, n_positions=512,
        multi_query=True),
    "falcon_7b_style": _llama_like(
        "FalconConfig", "vllm_splitwise_tpu.models.falcon.FalconForCausalLM",
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=True, parallel_attn=True,
        new_decoder_architecture=False, bias=False, alibi=False),
    "falcon_40b_style": _llama_like(
        "FalconConfig", "vllm_splitwise_tpu.models.falcon.FalconForCausalLM",
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_kv_heads=2,
        new_decoder_architecture=True, bias=False, alibi=False),
    "falcon_rw_style": _llama_like(
        "FalconConfig", "vllm_splitwise_tpu.models.falcon.FalconForCausalLM",
        vocab_size=256, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, multi_query=False, parallel_attn=False,
        new_decoder_architecture=False, bias=True, alibi=True),
    "mpt": _llama_like(
        "MptConfig", "vllm_splitwise_tpu.models.mpt.MPTForCausalLM",
        vocab_size=256, d_model=64, n_layers=2, n_heads=4),
    "olmo": _llama_like(
        "OlmoConfig", "vllm_splitwise_tpu.models.olmo.OlmoForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=512, clip_qkv=8.0,
        tie_word_embeddings=False),
    "dbrx": _llama_like(
        "DbrxConfig", "vllm_splitwise_tpu.models.dbrx.DbrxForCausalLM",
        d_model=64, n_heads=4, n_layers=2, max_seq_len=512, vocab_size=256,
        ffn_config=dict(ffn_hidden_size=96, moe_num_experts=4,
                        moe_top_k=2),
        attn_config=dict(kv_n_heads=2)),
    "mixtral": _llama_like(
        "MixtralConfig",
        "vllm_splitwise_tpu.models.mixtral.MixtralForCausalLM",
        vocab_size=256, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=512, sliding_window=None,
        tie_word_embeddings=False),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_prefill_logits_match_hf(name):
    import torch
    config, cls = CASES[name]()
    hf, weights = hf_model_and_weights(config)
    model = cls(config, dtype=jnp.float32)
    params = model.load_weights(weights)
    rng = np.random.RandomState(0)
    ids = rng.randint(0, config.vocab_size, size=(2, 11))
    kvh = getattr(model, "num_kv_heads", model.num_heads)
    ours, _ = run_prefill(model, params, ids, model.num_layers, kvh,
                          model.head_dim)
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)


# Families without a transformers implementation (trust_remote_code in
# HF): structural smoke tests — dummy params, prefill+decode run, finite
# logits, correct shapes.
SMOKE_CASES = {
    "baichuan_7b": lambda: _make_ns(
        "vllm_splitwise_tpu.models.baichuan.BaiChuanForCausalLM",
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=256, rms_norm_eps=1e-6,
        max_position_embeddings=512),
    "baichuan_13b_alibi": lambda: _make_ns(
        "vllm_splitwise_tpu.models.baichuan.BaichuanForCausalLM",
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=256, rms_norm_eps=1e-6),
    "deepseek_moe": lambda: _make_ns(
        "vllm_splitwise_tpu.models.deepseek.DeepseekForCausalLM",
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128,
        moe_intermediate_size=48, n_routed_experts=4, n_shared_experts=1,
        num_experts_per_tok=2, first_k_dense_replace=1, moe_layer_freq=1,
        norm_topk_prob=False, vocab_size=256, rms_norm_eps=1e-6,
        max_position_embeddings=512),
    "internlm2": lambda: _make_ns(
        "vllm_splitwise_tpu.models.internlm2.InternLM2ForCausalLM",
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        rms_norm_eps=1e-6, max_position_embeddings=512),
    "qwen1": lambda: _make_ns(
        "vllm_splitwise_tpu.models.qwen.QWenLMHeadModel",
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, layer_norm_epsilon=1e-6,
        rotary_emb_base=10000.0, seq_length=512, vocab_size=256),
    "chatglm": lambda: _make_ns(
        "vllm_splitwise_tpu.models.chatglm.ChatGLMForCausalLM",
        hidden_size=64, num_layers=2, num_attention_heads=4,
        multi_query_attention=True, multi_query_group_num=2,
        ffn_hidden_size=128, padded_vocab_size=256, vocab_size=256,
        layernorm_epsilon=1e-5, add_qkv_bias=True, seq_length=512),
    "orion": lambda: _make_ns(
        "vllm_splitwise_tpu.models.orion.OrionForCausalLM",
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=512),
    "decilm": lambda: _make_ns(
        "vllm_splitwise_tpu.models.decilm.DeciLMForCausalLM",
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads_per_layer=[4, 2, 1], intermediate_size=128,
        vocab_size=256, rms_norm_eps=1e-6, max_position_embeddings=512,
        tie_word_embeddings=False),
}


def _make_ns(model_path, **kw):
    import importlib
    from types import SimpleNamespace
    module, cls_name = model_path.rsplit(".", 1)
    cls = getattr(importlib.import_module(module), cls_name)
    return SimpleNamespace(**kw), cls


@pytest.mark.parametrize("name", sorted(SMOKE_CASES))
def test_remote_code_families_smoke(name):
    import jax

    from vllm_splitwise_tpu.models.input_metadata import DecodeMetadata
    from .utils import make_kv_caches

    config, cls = SMOKE_CASES[name]()
    model = cls(config, dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ids = rng.randint(0, 256, size=(2, 9))
    kvh = getattr(model, "num_kv_heads", model.num_heads)
    logits, caches = run_prefill(model, params, ids, model.num_layers,
                                 kvh, model.head_dim)
    assert logits.shape == (2, 9, 256)
    assert np.isfinite(logits).all()
    # One decode step through the paged cache.
    md = DecodeMetadata(
        block_tables=jnp.asarray(np.arange(16, dtype=np.int32).reshape(
            2, 8) % 16),
        context_lens=jnp.asarray([10, 10], dtype=np.int32),
        slot_mapping=jnp.asarray([9, 8 * 16 + 9], dtype=np.int32),
    )
    hidden, _ = model(params, jnp.asarray([[1], [2]]),
                      jnp.asarray([[9], [9]]), caches, md)
    dl = model.compute_logits(params, hidden)
    assert np.isfinite(np.asarray(dl)).all()
