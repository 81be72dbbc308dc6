"""Marlin W4A16 checkpoint support (reference test pattern:
tests/models/test_marlin.py compares marlin against GPTQ at the same
quantization grid).  The marlin tile permutation is inverted at load
time; both formats then share the int4 kernel, so outputs from
identically-quantized checkpoints must match EXACTLY."""
import numpy as np
import pytest


def test_marlin_pack_roundtrip():
    from vllm_splitwise_tpu.ops.quant_loaders import (pack_marlin_hf,
                                                      unpack_marlin)
    rng = np.random.RandomState(0)
    k, n, g = 256, 128, 128
    w_int = rng.randint(0, 16, size=(k, n)).astype(np.uint8)
    scales = (rng.rand(k // g, n).astype(np.float32) * 0.1 + 0.01)
    b, s = pack_marlin_hf(w_int, scales)
    assert b.shape == (k // 16, n * 16 // 8) and b.dtype == np.int32
    w2, s2, z2 = unpack_marlin(b, s)
    np.testing.assert_array_equal(w2, w_int)
    np.testing.assert_allclose(s2, scales, rtol=1e-3)  # f16 storage
    assert (z2 == 8.0).all()


def test_marlin_channelwise_roundtrip():
    from vllm_splitwise_tpu.ops.quant_loaders import (pack_marlin_hf,
                                                      unpack_marlin)
    rng = np.random.RandomState(1)
    k, n = 256, 128
    w_int = rng.randint(0, 16, size=(k, n)).astype(np.uint8)
    scales = (rng.rand(1, n).astype(np.float32) * 0.1 + 0.01)
    b, s = pack_marlin_hf(w_int, scales)
    w2, s2, _ = unpack_marlin(b, s)
    np.testing.assert_array_equal(w2, w_int)
    # channelwise expands to 128-groups with identical rows
    assert s2.shape == (k // 128, n)
    np.testing.assert_allclose(s2, np.repeat(scales, k // 128, axis=0),
                               rtol=1e-3)


@pytest.fixture(scope="module")
def quantized_pair(tmp_path_factory):
    """The same symmetric int4 grid serialized as BOTH a GPTQ and a
    marlin checkpoint for a tiny llama."""
    from safetensors.numpy import save_file

    from vllm_splitwise_tpu.ops.quant_loaders import (pack_gptq_hf,
                                                      pack_marlin_hf)
    from ..models.utils import save_tiny_tokenizer, tiny_llama_config

    # int4 kernel needs lane-aligned dims: use a 128-hidden tiny model.
    config = tiny_llama_config(hidden_size=128, heads=1, kv_heads=1,
                               intermediate=256)
    config.architectures = ["LlamaForCausalLM"]
    rng = np.random.RandomState(0)
    g = 64  # group size (both formats identical grid)

    def quantize_sym(k, n):
        w = rng.standard_normal((k, n)).astype(np.float32) / np.sqrt(k)
        scales = np.abs(w.reshape(k // g, g, n)).max(axis=1) / 7.0 + 1e-8
        w_int = (np.round(w / np.repeat(scales, g, axis=0)) + 8).clip(
            0, 15).astype(np.uint8)
        return w_int, scales.astype(np.float32)

    shapes = {
        "self_attn.q_proj": (128, 128), "self_attn.k_proj": (128, 128),
        "self_attn.v_proj": (128, 128), "self_attn.o_proj": (128, 128),
        "mlp.gate_proj": (128, 256), "mlp.up_proj": (128, 256),
        "mlp.down_proj": (256, 128),
    }
    rng2 = np.random.RandomState(7)
    common = {
        "model.embed_tokens.weight":
            (rng2.standard_normal(
                (config.vocab_size, 128)).astype(np.float16) * 0.05),
        "lm_head.weight":
            (rng2.standard_normal(
                (config.vocab_size, 128)).astype(np.float16) * 0.05),
        "model.norm.weight": np.ones((128, ), np.float16),
    }

    gptq_t, marlin_t = dict(common), dict(common)
    for layer in range(config.num_hidden_layers):
        p = f"model.layers.{layer}."
        for nm in ("input_layernorm.weight",
                   "post_attention_layernorm.weight"):
            gptq_t[p + nm] = np.ones((128, ), np.float16)
            marlin_t[p + nm] = np.ones((128, ), np.float16)
        for name, (din, dout) in shapes.items():
            w_int, scales = quantize_sym(din, dout)
            qw, qz = pack_gptq_hf(w_int, np.full_like(scales, 8.0))
            gptq_t[p + name + ".qweight"] = qw
            gptq_t[p + name + ".qzeros"] = qz
            gptq_t[p + name + ".scales"] = scales.astype(np.float16)
            b, s = pack_marlin_hf(w_int, scales)
            marlin_t[p + name + ".B"] = b
            marlin_t[p + name + ".s"] = s

    import os
    dirs = {}
    for kind, tensors, qcfg in (
        ("gptq", gptq_t, {"quant_method": "gptq", "bits": 4,
                          "group_size": g, "desc_act": False}),
        ("marlin", marlin_t, {"quant_method": "marlin",
                              "group_size": 128}),
    ):
        d = str(tmp_path_factory.mktemp(f"tiny_{kind}"))
        config.quantization_config = qcfg
        config.save_pretrained(d)
        save_tiny_tokenizer(d, config.vocab_size)
        save_file(tensors, os.path.join(d, "model.safetensors"))
        dirs[kind] = d
    return dirs, config


def test_marlin_matches_gptq(quantized_pair):
    """Reference tests/models/test_marlin.py pattern: identical grids
    serialized in both formats must generate identical greedy tokens."""
    from vllm_splitwise_tpu import LLM, SamplingParams
    dirs, config = quantized_pair
    rng = np.random.RandomState(3)
    prompts = [rng.randint(3, config.vocab_size, size=12).tolist()
               for _ in range(2)]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    outs = {}
    for kind in ("gptq", "marlin"):
        llm = LLM(model=dirs[kind], dtype="float32", max_model_len=256,
                  num_gpu_blocks_override=64, max_num_seqs=4,
                  max_paddings=512, swap_space=0.05)
        outs[kind] = [o.outputs[0].token_ids for o in llm.generate(
            prompt_token_ids=prompts, sampling_params=sp, use_tqdm=False)]
        del llm
    assert outs["marlin"] == outs["gptq"]
