"""Quantized-MoE end-to-end test: GPTQ-serialized tiny Mixtral through
the engine vs an HF oracle running the dequantized weights (parity with
the fork's quantized-MoE path — reference csrc group_gptq_gemm /
quant_fused_moe.py; our per-expert fused dequant-matmul loop in
models/mixtral.py)."""
import numpy as np
import pytest

from vllm_splitwise_tpu.ops.quant_loaders import pack_gptq_hf, quantize_int4

from .utils import (save_local_checkpoint, save_tiny_tokenizer,
                    tiny_mixtral_config)

GROUP = 16  # intermediate=96 must divide 2*G
_EXPERT_SUFFIXES = ("w1.weight", "w2.weight", "w3.weight")
_ATTN_SUFFIXES = ("q_proj.weight", "k_proj.weight", "v_proj.weight",
                  "o_proj.weight")


def _make_checkpoint(tmpdir: str):
    import torch
    from transformers import MixtralForCausalLM

    config = tiny_mixtral_config()
    torch.manual_seed(0)
    hf = MixtralForCausalLM(config).eval()
    weights = [(n, w.detach().numpy()) for n, w in hf.state_dict().items()]

    new_weights = []
    dequant_state = {}
    for name, w in weights:
        if name.endswith(_EXPERT_SUFFIXES + _ATTN_SUFFIXES):
            wt = np.asarray(w, dtype=np.float32).T  # [in, out]
            w_int, scales, zeros = quantize_int4(wt, GROUP)
            scales16 = scales.astype(np.float16)
            prefix = name[:-len(".weight")]
            qweight, qzeros = pack_gptq_hf(w_int, zeros)
            g_idx = (np.arange(wt.shape[0]) // GROUP).astype(np.int32)
            new_weights += [
                (prefix + ".qweight", qweight),
                (prefix + ".qzeros", qzeros),
                (prefix + ".scales", scales16),
                (prefix + ".g_idx", g_idx),
            ]
            deq = ((w_int.astype(np.float32) -
                    np.repeat(zeros, GROUP, axis=0)) *
                   np.repeat(scales16.astype(np.float32), GROUP, axis=0))
            dequant_state[name] = torch.tensor(deq.T)
        else:
            new_weights.append((name, w))

    state = hf.state_dict()
    state.update(dequant_state)
    hf.load_state_dict(state)

    config.quantization_config = {
        "quant_method": "gptq", "bits": 4, "group_size": GROUP,
        "desc_act": False, "sym": False,
    }
    d = save_local_checkpoint(config, new_weights, tmpdir)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


def test_quantized_moe_engine_matches_dequant_oracle(tmp_path):
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams

    d, hf, config = _make_checkpoint(str(tmp_path))
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              num_gpu_blocks_override=64, max_num_seqs=4,
              max_paddings=256, swap_space=0.1)
    assert llm.llm_engine.model_config.quantization == "gptq"

    prompt_ids = [[5, 9, 23, 41], [7, 3, 11]]
    max_tokens = 6
    outs = llm.generate(
        prompt_token_ids=prompt_ids,
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=max_tokens))
    for ids, out in zip(prompt_ids, outs):
        with torch.no_grad():
            hf_out = hf.generate(torch.tensor([ids]),
                                 max_new_tokens=max_tokens,
                                 do_sample=False)
        assert out.outputs[0].token_ids == hf_out[0, len(ids):].tolist()
