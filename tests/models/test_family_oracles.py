"""Numeric oracles for model families WITHOUT a transformers class
(they need trust_remote_code upstream): each family's checkpoint format
is generated from neutral weights, loaded through the family's
load_weights, and the prefill logits must match the independent numpy
dense reference (tests/models/dense_ref.py) — which is itself anchored
to HF Llama.  Closes the smoke-test-only gap for baichuan(±ALiBi),
internlm2, qwen1, chatglm, deepseek-MoE, orion and decilm."""
from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from .dense_ref import MoECfg, RefCfg, make_weights, ref_logits
from .test_model_correctness import run_prefill

H, HD, NH, V, F = 64, 16, 4, 256, 128
IDS = np.random.RandomState(3).randint(0, V, size=(2, 11))


def _run_ours(model_cls, config, named_weights, cfg: RefCfg):
    model = model_cls(config, dtype=jnp.float32)
    params = model.load_weights(iter(named_weights))
    kvh = getattr(model, "num_kv_heads", model.num_heads)
    ours, _ = run_prefill(model, params, IDS, model.num_layers, kvh,
                          model.head_dim)
    want = ref_logits(cfg, _run_ours.W, IDS)
    np.testing.assert_allclose(ours, want, atol=5e-3, rtol=5e-3)


def _llama_names(W, *, prefix="model.", head="lm_head.weight",
                 ln_bias=False):
    yield prefix + "embed_tokens.weight", W["embed"]
    for i, L in enumerate(W["layers"]):
        p = f"{prefix}layers.{i}."
        yield p + "input_layernorm.weight", L["ln1_w"]
        yield p + "post_attention_layernorm.weight", L["ln2_w"]
        if ln_bias:
            yield p + "input_layernorm.bias", L["ln1_b"]
            yield p + "post_attention_layernorm.bias", L["ln2_b"]
        yield p + "self_attn.q_proj.weight", L["q"]
        yield p + "self_attn.k_proj.weight", L["k"]
        yield p + "self_attn.v_proj.weight", L["v"]
        yield p + "self_attn.o_proj.weight", L["o"]
        yield p + "mlp.gate_proj.weight", L["gate"]
        yield p + "mlp.up_proj.weight", L["up"]
        yield p + "mlp.down_proj.weight", L["down"]
    yield prefix + "norm.weight", W["norm_w"]
    if ln_bias:
        yield prefix + "norm.bias", W["norm_b"]
    yield head, W["lm_head"]


def test_dense_ref_matches_hf_llama():
    """Anchor: the numpy oracle reproduces transformers' Llama exactly
    (GQA + neox RoPE + RMSNorm + SwiGLU)."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = RefCfg(hidden=H, layers=2, heads=NH, head_dim=HD,
                 kv_heads=[2, 2], inter=F, vocab=V)
    W = make_weights(np.random.RandomState(0), cfg)
    config = LlamaConfig(vocab_size=V, hidden_size=H, intermediate_size=F,
                         num_hidden_layers=2, num_attention_heads=NH,
                         num_key_value_heads=2, rms_norm_eps=cfg.eps,
                         max_position_embeddings=512,
                         tie_word_embeddings=False, attention_bias=False)
    hf = LlamaForCausalLM(config)
    state = {k: torch.tensor(v) for k, v in _llama_names(W)}
    hf.load_state_dict(state, strict=True)
    hf.eval()
    with torch.no_grad():
        got = hf(torch.tensor(IDS)).logits.numpy()
    np.testing.assert_allclose(got, ref_logits(cfg, W, IDS), atol=2e-3,
                               rtol=2e-3)


def test_baichuan_7b_rope_matches_ref():
    from vllm_splitwise_tpu.models.baichuan import BaiChuanForCausalLM

    cfg = RefCfg(hidden=H, layers=2, heads=NH, head_dim=HD,
                 kv_heads=[NH, NH], inter=F, vocab=V)
    W = _run_ours.W = make_weights(np.random.RandomState(1), cfg)

    def names():
        yield "model.embed_tokens.weight", W["embed"]
        for i, L in enumerate(W["layers"]):
            p = f"model.layers.{i}."
            yield p + "input_layernorm.weight", L["ln1_w"]
            yield p + "post_attention_layernorm.weight", L["ln2_w"]
            yield p + "self_attn.W_pack.weight", np.concatenate(
                [L["q"], L["k"], L["v"]], axis=0)
            yield p + "self_attn.o_proj.weight", L["o"]
            yield p + "mlp.gate_proj.weight", L["gate"]
            yield p + "mlp.up_proj.weight", L["up"]
            yield p + "mlp.down_proj.weight", L["down"]
        yield "model.norm.weight", W["norm_w"]
        yield "lm_head.weight", W["lm_head"]

    config = SimpleNamespace(hidden_size=H, num_hidden_layers=2,
                             num_attention_heads=NH, intermediate_size=F,
                             vocab_size=V, rms_norm_eps=cfg.eps,
                             max_position_embeddings=512)
    _run_ours(BaiChuanForCausalLM, config, names(), cfg)


def test_baichuan_13b_alibi_matches_ref():
    from vllm_splitwise_tpu.models.baichuan import BaichuanForCausalLM

    cfg = RefCfg(hidden=H, layers=2, heads=NH, head_dim=HD,
                 kv_heads=[NH, NH], inter=F, vocab=V, rope=None,
                 alibi=True)
    W = _run_ours.W = make_weights(np.random.RandomState(2), cfg)

    def names():
        yield "model.embed_tokens.weight", W["embed"]
        for i, L in enumerate(W["layers"]):
            p = f"model.layers.{i}."
            yield p + "input_layernorm.weight", L["ln1_w"]
            yield p + "post_attention_layernorm.weight", L["ln2_w"]
            yield p + "self_attn.W_pack.weight", np.concatenate(
                [L["q"], L["k"], L["v"]], axis=0)
            yield p + "self_attn.o_proj.weight", L["o"]
            yield p + "mlp.gate_proj.weight", L["gate"]
            yield p + "mlp.up_proj.weight", L["up"]
            yield p + "mlp.down_proj.weight", L["down"]
        yield "model.norm.weight", W["norm_w"]
        yield "lm_head.weight", W["lm_head"]

    config = SimpleNamespace(hidden_size=H, num_hidden_layers=2,
                             num_attention_heads=NH, intermediate_size=F,
                             vocab_size=V, rms_norm_eps=cfg.eps)
    _run_ours(BaichuanForCausalLM, config, names(), cfg)


def test_internlm2_matches_ref():
    from vllm_splitwise_tpu.models.internlm2 import InternLM2ForCausalLM

    kvh = 2
    # InternLM2's rope base defaults to 1e6 (not 10000).
    cfg = RefCfg(hidden=H, layers=2, heads=NH, head_dim=HD,
                 kv_heads=[kvh, kvh], inter=F, vocab=V,
                 rope=("neox", None, 1e6))
    W = _run_ours.W = make_weights(np.random.RandomState(4), cfg)
    group = NH // kvh

    def pack_wqkv(L):
        # [kvh, group+2, hd, H]: per KV group its q heads then k then v.
        q = L["q"].reshape(kvh, group, HD, H)
        k = L["k"].reshape(kvh, 1, HD, H)
        v = L["v"].reshape(kvh, 1, HD, H)
        return np.concatenate([q, k, v], axis=1).reshape(-1, H)

    def names():
        yield "model.tok_embeddings.weight", W["embed"]
        for i, L in enumerate(W["layers"]):
            p = f"model.layers.{i}."
            yield p + "attention_norm.weight", L["ln1_w"]
            yield p + "ffn_norm.weight", L["ln2_w"]
            yield p + "attention.wqkv.weight", pack_wqkv(L)
            yield p + "attention.wo.weight", L["o"]
            yield p + "feed_forward.w1.weight", L["gate"]
            yield p + "feed_forward.w3.weight", L["up"]
            yield p + "feed_forward.w2.weight", L["down"]
        yield "model.norm.weight", W["norm_w"]
        yield "output.weight", W["lm_head"]

    config = SimpleNamespace(hidden_size=H, num_hidden_layers=2,
                             num_attention_heads=NH, num_key_value_heads=kvh,
                             intermediate_size=F, vocab_size=V,
                             rms_norm_eps=cfg.eps,
                             max_position_embeddings=512)
    _run_ours(InternLM2ForCausalLM, config, names(), cfg)


def test_qwen1_matches_ref():
    from vllm_splitwise_tpu.models.qwen import QWenLMHeadModel

    cfg = RefCfg(hidden=H, layers=2, heads=NH, head_dim=HD,
                 kv_heads=[NH, NH], inter=F, vocab=V, qkv_bias=True)
    W = _run_ours.W = make_weights(np.random.RandomState(5), cfg)

    def names():
        yield "transformer.wte.weight", W["embed"]
        for i, L in enumerate(W["layers"]):
            p = f"transformer.h.{i}."
            yield p + "ln_1.weight", L["ln1_w"]
            yield p + "ln_2.weight", L["ln2_w"]
            yield p + "attn.c_attn.weight", np.concatenate(
                [L["q"], L["k"], L["v"]], axis=0)
            yield p + "attn.c_attn.bias", np.concatenate(
                [L["q_b"], L["k_b"], L["v_b"]], axis=0)
            yield p + "attn.c_proj.weight", L["o"]
            yield p + "mlp.w2.weight", L["gate"]
            yield p + "mlp.w1.weight", L["up"]
            yield p + "mlp.c_proj.weight", L["down"]
        yield "transformer.ln_f.weight", W["norm_w"]
        yield "lm_head.weight", W["lm_head"]

    config = SimpleNamespace(hidden_size=H, num_hidden_layers=2,
                             num_attention_heads=NH,
                             intermediate_size=2 * F,
                             layer_norm_epsilon=cfg.eps,
                             rotary_emb_base=10000.0, seq_length=512,
                             vocab_size=V)
    _run_ours(QWenLMHeadModel, config, names(), cfg)


def test_chatglm_matches_ref():
    from vllm_splitwise_tpu.models.chatglm import ChatGLMForCausalLM

    kvh = 2
    cfg = RefCfg(hidden=H, layers=2, heads=NH, head_dim=HD,
                 kv_heads=[kvh, kvh], inter=F, vocab=V, eps=1e-5,
                 qkv_bias=True,
                 rope=("interleaved", HD // 2, 10000.0))
    W = _run_ours.W = make_weights(np.random.RandomState(6), cfg)

    def names():
        yield "transformer.embedding.word_embeddings.weight", W["embed"]
        for i, L in enumerate(W["layers"]):
            p = f"transformer.encoder.layers.{i}."
            yield p + "input_layernorm.weight", L["ln1_w"]
            yield p + "post_attention_layernorm.weight", L["ln2_w"]
            yield p + "self_attention.query_key_value.weight", \
                np.concatenate([L["q"], L["k"], L["v"]], axis=0)
            yield p + "self_attention.query_key_value.bias", \
                np.concatenate([L["q_b"], L["k_b"], L["v_b"]], axis=0)
            yield p + "self_attention.dense.weight", L["o"]
            yield p + "mlp.dense_h_to_4h.weight", np.concatenate(
                [L["gate"], L["up"]], axis=0)
            yield p + "mlp.dense_4h_to_h.weight", L["down"]
        yield "transformer.encoder.final_layernorm.weight", W["norm_w"]
        yield "transformer.output_layer.weight", W["lm_head"]

    config = SimpleNamespace(hidden_size=H, num_layers=2,
                             num_attention_heads=NH,
                             multi_query_attention=True,
                             multi_query_group_num=kvh,
                             ffn_hidden_size=F, padded_vocab_size=V,
                             vocab_size=V, layernorm_epsilon=1e-5,
                             add_qkv_bias=True, seq_length=512)
    _run_ours(ChatGLMForCausalLM, config, names(), cfg)


def test_deepseek_moe_matches_ref():
    from vllm_splitwise_tpu.models.deepseek import DeepseekForCausalLM

    kvh = 2
    moe = MoECfg(num_experts=4, top_k=2, inter=48, num_shared=1,
                 renormalize=False)
    cfg = RefCfg(hidden=H, layers=3, heads=NH, head_dim=HD,
                 kv_heads=[kvh] * 3, inter=F, vocab=V,
                 moe_layers={1: moe, 2: moe})
    W = _run_ours.W = make_weights(np.random.RandomState(7), cfg)

    def names():
        yield "model.embed_tokens.weight", W["embed"]
        for i, L in enumerate(W["layers"]):
            p = f"model.layers.{i}."
            yield p + "input_layernorm.weight", L["ln1_w"]
            yield p + "post_attention_layernorm.weight", L["ln2_w"]
            yield p + "self_attn.q_proj.weight", L["q"]
            yield p + "self_attn.k_proj.weight", L["k"]
            yield p + "self_attn.v_proj.weight", L["v"]
            yield p + "self_attn.o_proj.weight", L["o"]
            if "experts" in L:
                yield p + "mlp.gate.weight", L["router"]
                for e, E in enumerate(L["experts"]):
                    q = f"{p}mlp.experts.{e}."
                    yield q + "gate_proj.weight", E["gate"]
                    yield q + "up_proj.weight", E["up"]
                    yield q + "down_proj.weight", E["down"]
                s = L["shared"]
                yield p + "mlp.shared_experts.gate_proj.weight", s["gate"]
                yield p + "mlp.shared_experts.up_proj.weight", s["up"]
                yield p + "mlp.shared_experts.down_proj.weight", s["down"]
            else:
                yield p + "mlp.gate_proj.weight", L["gate"]
                yield p + "mlp.up_proj.weight", L["up"]
                yield p + "mlp.down_proj.weight", L["down"]
        yield "model.norm.weight", W["norm_w"]
        yield "lm_head.weight", W["lm_head"]

    config = SimpleNamespace(hidden_size=H, num_hidden_layers=3,
                             num_attention_heads=NH, num_key_value_heads=kvh,
                             intermediate_size=F, moe_intermediate_size=48,
                             n_routed_experts=4, n_shared_experts=1,
                             num_experts_per_tok=2, first_k_dense_replace=1,
                             moe_layer_freq=1, norm_topk_prob=False,
                             vocab_size=V, rms_norm_eps=cfg.eps,
                             max_position_embeddings=512)
    _run_ours(DeepseekForCausalLM, config, names(), cfg)


def test_orion_layernorm_matches_ref():
    from vllm_splitwise_tpu.models.orion import OrionForCausalLM

    kvh = 2
    cfg = RefCfg(hidden=H, layers=2, heads=NH, head_dim=HD,
                 kv_heads=[kvh, kvh], inter=F, vocab=V, norm="ln",
                 eps=1e-5)
    W = _run_ours.W = make_weights(np.random.RandomState(8), cfg)
    config = SimpleNamespace(hidden_size=H, num_hidden_layers=2,
                             num_attention_heads=NH, num_key_value_heads=kvh,
                             intermediate_size=F, vocab_size=V,
                             max_position_embeddings=512)
    _run_ours(OrionForCausalLM, config,
              _llama_names(W, ln_bias=True), cfg)


def test_decilm_variable_gqa_matches_ref():
    from vllm_splitwise_tpu.models.decilm import DeciLMForCausalLM

    per_layer = [4, 2, 1]
    cfg = RefCfg(hidden=H, layers=3, heads=NH, head_dim=HD,
                 kv_heads=per_layer, inter=F, vocab=V)
    W = _run_ours.W = make_weights(np.random.RandomState(9), cfg)
    config = SimpleNamespace(hidden_size=H, num_hidden_layers=3,
                             num_attention_heads=NH,
                             num_key_value_heads_per_layer=list(per_layer),
                             intermediate_size=F, vocab_size=V,
                             rms_norm_eps=cfg.eps,
                             max_position_embeddings=512,
                             tie_word_embeddings=False, head_dim=None,
                             rope_theta=10000.0, rope_scaling=None,
                             hidden_act="silu", sliding_window=None)
    _run_ours(DeciLMForCausalLM, config, _llama_names(W), cfg)
