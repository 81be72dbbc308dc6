"""End-to-end quantized checkpoint tests: synthesize an AutoGPTQ/AWQ
serialized tiny-Llama checkpoint, load it through the engine, and compare
against an HF oracle whose weights are the DEQUANTIZED values — so greedy
outputs must match (reference pattern: tests/models/test_marlin.py
gptq-vs-marlin comparisons)."""
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.quant_loaders import (pack_awq_hf, pack_gptq_hf,
                                                  quantize_int4)

from .utils import (hf_model_and_weights, save_local_checkpoint,
                    save_tiny_tokenizer, tiny_llama_config)

GROUP = 32
_LINEAR_SUFFIXES = ("q_proj.weight", "k_proj.weight", "v_proj.weight",
                    "o_proj.weight", "gate_proj.weight", "up_proj.weight",
                    "down_proj.weight")


def _make_quant_checkpoint(tmpdir: str, method: str, config=None):
    """Returns (dir, hf_model_with_dequantized_weights, config)."""
    import torch
    if config is None:
        config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)

    new_weights = []
    dequant_state = {}
    for name, w in weights:
        if name.endswith(_LINEAR_SUFFIXES):
            wt = np.asarray(w, dtype=np.float32).T  # [in, out]
            w_int, scales, zeros = quantize_int4(wt, GROUP)
            scales16 = scales.astype(np.float16)
            prefix = name[:-len(".weight")]
            if method == "gptq":
                qweight, qzeros = pack_gptq_hf(w_int, zeros)
                g_idx = (np.arange(wt.shape[0]) // GROUP).astype(np.int32)
                new_weights += [
                    (prefix + ".qweight", qweight),
                    (prefix + ".qzeros", qzeros),
                    (prefix + ".scales", scales16),
                    (prefix + ".g_idx", g_idx),
                ]
            else:
                qweight, qzeros = pack_awq_hf(w_int, zeros)
                new_weights += [
                    (prefix + ".qweight", qweight),
                    (prefix + ".qzeros", qzeros),
                    (prefix + ".scales", scales16),
                ]
            # Oracle weight = exactly what dequantization reproduces.
            deq = ((w_int.astype(np.float32) -
                    np.repeat(zeros, GROUP, axis=0)) *
                   np.repeat(scales16.astype(np.float32), GROUP, axis=0))
            dequant_state[name] = torch.tensor(deq.T)
        else:
            new_weights.append((name, w))

    state = hf.state_dict()
    state.update(dequant_state)
    hf.load_state_dict(state)

    if method == "gptq":
        config.quantization_config = {
            "quant_method": "gptq", "bits": 4, "group_size": GROUP,
            "desc_act": False,
        }
    else:
        config.quantization_config = {
            "quant_method": "awq", "w_bit": 4, "q_group_size": GROUP,
            "zero_point": True,
        }
    save_local_checkpoint(config, new_weights, tmpdir)
    save_tiny_tokenizer(tmpdir, config.vocab_size)
    return tmpdir, hf, config


@pytest.mark.parametrize("method", ["gptq", "awq"])
def test_quantized_engine_matches_dequant_oracle(method, tmp_path,
                                                 monkeypatch):
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams

    # Exact-equality oracle needs the pure bf16-dequant matmul; the
    # default W4A8 path adds per-token activation-quant error (covered
    # by test_w4a8_engine_close_to_oracle below).
    monkeypatch.setenv("VST_W4A8", "0")
    d, hf, config = _make_quant_checkpoint(str(tmp_path), method)

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1)
    assert llm.llm_engine.model_config.quantization == method

    rng = np.random.RandomState(0)
    prompt_ids = [
        rng.randint(3, config.vocab_size, size=rng.randint(8, 20)).tolist()
        for _ in range(3)
    ]
    max_tokens = 10
    outs = llm.generate(prompt_token_ids=prompt_ids,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=max_tokens,
                                                       ignore_eos=True),
                        use_tqdm=False)
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]),
                                 max_new_tokens=max_tokens,
                                 do_sample=False)
        assert out.outputs[0].token_ids == hf_out[0, len(ids):].tolist()


def test_w4a8_engine_close_to_oracle(tmp_path, monkeypatch):
    """Default (W4A8) engine path: greedy outputs may diverge from the
    dequant oracle after a few tokens, but the FIRST token — driven by a
    single forward pass — must match on most prompts (activation int8
    error ~0.4% relative)."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    monkeypatch.setenv("VST_W4A8", "1")
    d, hf, config = _make_quant_checkpoint(str(tmp_path), "gptq")

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1)

    rng = np.random.RandomState(2)
    prompt_ids = [
        rng.randint(3, config.vocab_size, size=16).tolist()
        for _ in range(4)
    ]
    outs = llm.generate(prompt_token_ids=prompt_ids,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=1,
                                                       ignore_eos=True),
                        use_tqdm=False)
    matches = 0
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]), max_new_tokens=1,
                                 do_sample=False)
        matches += int(out.outputs[0].token_ids[0] == int(hf_out[0, -1]))
    assert matches >= 3, matches


def test_int8_on_the_fly_close_to_dense(tmp_path):
    """quantization='int8' quantizes a dense checkpoint at load time;
    outputs should stay close to the dense model's (same first tokens on
    most prompts)."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d = str(tmp_path)
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)

    llm = LLM(model=d, dtype="float32", quantization="int8",
              max_model_len=256, num_gpu_blocks_override=64,
              max_num_seqs=8, max_paddings=512, swap_space=0.1)
    rng = np.random.RandomState(1)
    prompt_ids = [rng.randint(3, config.vocab_size, size=12).tolist()]
    outs = llm.generate(prompt_token_ids=prompt_ids,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=4,
                                                       ignore_eos=True),
                        use_tqdm=False)
    # int8 symmetric per-channel is near-lossless at this scale: the
    # first greedy token must match the dense model.
    with torch.no_grad():
        hf_out = hf.generate(torch.tensor([prompt_ids[0]]),
                             max_new_tokens=1, do_sample=False)
    assert outs[0].outputs[0].token_ids[0] == int(hf_out[0, -1])


def _make_squeezellm_checkpoint(tmpdir: str):
    """SqueezeLLM HF serialization (qweight int32 row-packed 4-bit codes
    + per-channel [N, 16] float16 lookup_table, the layout
    /root/reference/csrc/quantization/squeezellm/quant_cuda_kernel.cu
    consumes).  Oracle = HF model whose weights ARE the float LUT
    dequantization."""
    import torch
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)

    rng = np.random.RandomState(7)
    new_weights = []
    dequant_state = {}
    for name, w in weights:
        if name.endswith(_LINEAR_SUFFIXES):
            wt = np.asarray(w, dtype=np.float32).T  # [K, N]
            k, n = wt.shape
            # Per-channel 16-entry LUT via quantile codebook of the real
            # weights (sensitivity-weighted k-means in the paper; any
            # codebook exercises the same exact-dequant path).
            lut = np.quantile(wt, np.linspace(0, 1, 16), axis=0).T
            lut = lut.astype(np.float16)  # [N, 16], checkpoint dtype
            codes = np.abs(
                wt[:, :, None] -
                lut.astype(np.float32)[None, :, :]).argmin(-1)
            codes = codes.astype(np.uint32)  # [K, N]
            qweight = np.zeros((k // 8, n), dtype=np.uint32)
            for i in range(8):
                qweight |= codes[i::8] << (4 * i)
            prefix = name[:-len(".weight")]
            new_weights += [
                (prefix + ".qweight", qweight.view(np.int32)),
                (prefix + ".lookup_table", lut),
            ]
            deq = lut.astype(np.float32)[np.arange(n)[None, :], codes]
            dequant_state[name] = torch.tensor(deq.T)
        else:
            new_weights.append((name, w))

    state = hf.state_dict()
    state.update(dequant_state)
    hf.load_state_dict(state)
    config.quantization_config = {"quant_method": "squeezellm",
                                  "wbits": 4}
    save_local_checkpoint(config, new_weights, tmpdir)
    save_tiny_tokenizer(tmpdir, config.vocab_size)
    return tmpdir, hf, config


def test_squeezellm_convert_is_exact_lut_dequant():
    """The served weights must EQUAL the float LUT dequantization —
    pinning the reference CUDA kernel's semantics, not the int8
    requantization (the r4 approximation this replaces)."""
    from vllm_splitwise_tpu.layers.quantization.squeezellm import \
        SqueezeLLMConfig
    rng = np.random.RandomState(3)
    k, n = 64, 32
    lut = rng.standard_normal((n, 16)).astype(np.float16)
    codes = rng.randint(0, 16, size=(k, n)).astype(np.uint32)
    qweight = np.zeros((k // 8, n), dtype=np.uint32)
    for i in range(8):
        qweight |= codes[i::8] << (4 * i)
    cfg = SqueezeLLMConfig(4)
    out = cfg.convert({"qweight": qweight.view(np.int32),
                       "lookup_table": lut})
    expected = lut[np.arange(n)[None, :], codes]  # float16 LUT pick
    assert "weight_lut" in out
    assert out["weight_lut"].dtype == np.float16
    np.testing.assert_array_equal(out["weight_lut"], expected)


def test_squeezellm_engine_matches_lut_oracle(tmp_path):
    """End-to-end: a SqueezeLLM-serialized checkpoint served in the
    default (exact) mode produces greedy outputs token-identical to an
    HF oracle holding the float LUT-dequantized weights."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = _make_squeezellm_checkpoint(str(tmp_path))

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1)
    assert llm.llm_engine.model_config.quantization == "squeezellm"

    rng = np.random.RandomState(4)
    prompt_ids = [
        rng.randint(3, config.vocab_size, size=rng.randint(8, 20)).tolist()
        for _ in range(3)
    ]
    outs = llm.generate(prompt_token_ids=prompt_ids,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=10,
                                                       ignore_eos=True),
                        use_tqdm=False)
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]), max_new_tokens=10,
                                 do_sample=False)
        assert out.outputs[0].token_ids == hf_out[0, len(ids):].tolist()


def test_squeezellm_int8_mode_still_serves(tmp_path, monkeypatch):
    """VST_SQUEEZELLM_INT8=1 keeps the fast int8 requantized path as an
    opt-in (first greedy token matches the LUT oracle on most prompts)."""
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    monkeypatch.setenv("VST_SQUEEZELLM_INT8", "1")
    d, hf, config = _make_squeezellm_checkpoint(str(tmp_path))
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1)
    rng = np.random.RandomState(5)
    prompt_ids = [
        rng.randint(3, config.vocab_size, size=16).tolist()
        for _ in range(4)
    ]
    outs = llm.generate(prompt_token_ids=prompt_ids,
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=1,
                                                       ignore_eos=True),
                        use_tqdm=False)
    matches = 0
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]), max_new_tokens=1,
                                 do_sample=False)
        matches += int(out.outputs[0].token_ids[0] == int(hf_out[0, -1]))
    assert matches >= 3, matches
