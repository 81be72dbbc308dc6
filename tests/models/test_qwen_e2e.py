"""Qwen-1 end-to-end: checkpoint with QWen naming (transformer.h.*, fused
c_attn) loads through the engine via the bundled QWenConfig shim (no
trust_remote_code) and generates deterministically.  No HF oracle exists
offline (QWen is remote-code in transformers), so this validates the
load/rename path and greedy determinism, mirroring the reference's
supported-models smoke coverage for qwen (vllm/model_executor/models/
qwen.py)."""
import json
import os

import numpy as np

from vllm_splitwise_tpu import LLM, SamplingParams

from .utils import save_tiny_tokenizer

H, LAYERS, HEADS, FF2, VOCAB = 64, 2, 4, 192, 256


def _make_checkpoint(tmpdir: str) -> str:
    import torch

    cfg = {
        "architectures": ["QWenLMHeadModel"],
        "model_type": "qwen",
        "vocab_size": VOCAB,
        "hidden_size": H,
        "num_hidden_layers": LAYERS,
        "num_attention_heads": HEADS,
        "intermediate_size": FF2 * 2,     # QWen stores 2x the FFN width
        "layer_norm_epsilon": 1e-6,
        "rotary_emb_base": 10000,
        "seq_length": 512,
        "no_bias": True,
    }
    json.dump(cfg, open(os.path.join(tmpdir, "config.json"), "w"))

    rng = np.random.RandomState(0)

    def t(*shape, scale=0.05):
        return torch.tensor(rng.standard_normal(shape) * scale,
                            dtype=torch.float32)

    state = {
        "transformer.wte.weight": t(VOCAB, H),
        "transformer.ln_f.weight": torch.ones(H),
        "lm_head.weight": t(VOCAB, H),
    }
    for i in range(LAYERS):
        p = f"transformer.h.{i}."
        state[p + "ln_1.weight"] = torch.ones(H)
        state[p + "ln_2.weight"] = torch.ones(H)
        state[p + "attn.c_attn.weight"] = t(3 * H, H)
        state[p + "attn.c_attn.bias"] = t(3 * H)
        state[p + "attn.c_proj.weight"] = t(H, H)
        state[p + "mlp.w1.weight"] = t(FF2, H)
        state[p + "mlp.w2.weight"] = t(FF2, H)
        state[p + "mlp.c_proj.weight"] = t(H, FF2)
    torch.save(state, os.path.join(tmpdir, "pytorch_model.bin"))
    save_tiny_tokenizer(tmpdir, VOCAB)
    return tmpdir


def test_qwen_checkpoint_loads_and_generates(tmp_path):
    d = _make_checkpoint(str(tmp_path))
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              num_gpu_blocks_override=64, max_num_seqs=4,
              max_paddings=256, swap_space=0.1)
    prompt_ids = [[5, 9, 23, 41], [7, 3]]
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    a = [o.outputs[0].token_ids
         for o in llm.generate(prompt_token_ids=prompt_ids,
                               sampling_params=sp)]
    b = [o.outputs[0].token_ids
         for o in llm.generate(prompt_token_ids=prompt_ids,
                               sampling_params=sp)]
    assert a == b                       # greedy determinism
    assert all(len(x) == 6 for x in a)
    assert all(0 <= tok < VOCAB for x in a for tok in x)
