"""Multi-LoRA serving tests (reference pattern: tests/lora/test_llama.py
e2e + test_layers.py numerics): engine output with an adapter must match
an HF oracle whose weights are merged W + B@A*scaling."""
import json
import os

import numpy as np
import pytest

RANK = 8
ALPHA = 16  # scaling 2.0
TARGETS = ("q_proj", "v_proj", "gate_proj")


def _make_adapter(path: str, config, seed: int) -> dict:
    """Write a PEFT-format adapter; returns {hf_param_name: delta}."""
    from safetensors.numpy import save_file
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": RANK, "lora_alpha": ALPHA,
                   "target_modules": list(TARGETS)}, f)
    h = config.hidden_size
    kv_dim = config.num_key_value_heads * (h // config.num_attention_heads)
    dims = {"q_proj": (h, h), "v_proj": (h, kv_dim),
            "gate_proj": (h, config.intermediate_size)}
    state = {}
    deltas = {}
    scaling = ALPHA / RANK
    for li in range(config.num_hidden_layers):
        for mod, (d_in, d_out) in dims.items():
            a = (rng.standard_normal((RANK, d_in)) * 0.05).astype(
                np.float32)  # torch layout [r, in]
            b = (rng.standard_normal((d_out, RANK)) * 0.05).astype(
                np.float32)  # [out, r]
            sub = "self_attn" if mod.endswith(("q_proj", "v_proj")) \
                and "proj" in mod and mod[0] in "qkvo" else "mlp"
            prefix = (f"base_model.model.model.layers.{li}."
                      f"{sub}.{mod}")
            state[prefix + ".lora_A.weight"] = a
            state[prefix + ".lora_B.weight"] = b
            hf_name = f"model.layers.{li}.{sub}.{mod}.weight"
            deltas[hf_name] = (b @ a) * scaling  # [out, in]
    save_file(state, os.path.join(path, "adapter_model.safetensors"))
    return deltas


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import torch

    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    from vllm_splitwise_tpu import LLM

    d = str(tmp_path_factory.mktemp("tiny_lora"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)

    adapter_dir = str(tmp_path_factory.mktemp("adapter1"))
    deltas = _make_adapter(adapter_dir, config, seed=42)

    # HF oracle with merged adapter weights.
    import copy
    hf_merged = copy.deepcopy(hf)
    state = hf_merged.state_dict()
    for name, delta in deltas.items():
        state[name] = state[name] + torch.tensor(delta)
    hf_merged.load_state_dict(state)

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, enable_lora=True,
              max_loras=2, max_lora_rank=RANK)
    return llm, hf, hf_merged, adapter_dir, config


def test_lora_matches_merged_oracle(setup):
    import torch

    from vllm_splitwise_tpu import SamplingParams
    from vllm_splitwise_tpu.lora.request import LoRARequest
    llm, hf, hf_merged, adapter_dir, config = setup

    rng = np.random.RandomState(0)
    ids = rng.randint(3, config.vocab_size, size=12).tolist()
    req = LoRARequest("adapter1", 1, adapter_dir)

    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=8,
                                                       ignore_eos=True),
                        lora_request=req, use_tqdm=False)
    with torch.no_grad():
        ref = hf_merged.generate(torch.tensor([ids]), max_new_tokens=8,
                                 do_sample=False)
    assert outs[0].outputs[0].token_ids == ref[0, 12:].tolist()

    # Base model (no adapter) still matches the unmerged oracle.
    outs_base = llm.generate(prompt_token_ids=[ids],
                             sampling_params=SamplingParams(
                                 temperature=0.0, max_tokens=8,
                                 ignore_eos=True),
                             use_tqdm=False)
    with torch.no_grad():
        ref_base = hf.generate(torch.tensor([ids]), max_new_tokens=8,
                               do_sample=False)
    assert outs_base[0].outputs[0].token_ids == ref_base[0, 12:].tolist()
    # The adapter actually changed the output.
    assert outs[0].outputs[0].token_ids != outs_base[0].outputs[0].token_ids


def test_mixed_lora_batch(setup):
    """Adapter and base requests decode together in one batch."""
    import torch

    from vllm_splitwise_tpu import SamplingParams
    from vllm_splitwise_tpu.lora.request import LoRARequest
    llm, hf, hf_merged, adapter_dir, config = setup
    engine = llm.llm_engine
    rng = np.random.RandomState(1)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    req = LoRARequest("adapter1", 1, adapter_dir)

    ids_a = rng.randint(3, config.vocab_size, size=10).tolist()
    ids_b = rng.randint(3, config.vocab_size, size=10).tolist()
    engine.add_request("with-lora", None, sp, ids_a, lora_request=req)
    engine.add_request("no-lora", None, sp, ids_b)
    results = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids

    with torch.no_grad():
        ref_a = hf_merged.generate(torch.tensor([ids_a]), max_new_tokens=6,
                                   do_sample=False)[0, 10:].tolist()
        ref_b = hf.generate(torch.tensor([ids_b]), max_new_tokens=6,
                            do_sample=False)[0, 10:].tolist()
    assert results["with-lora"] == ref_a
    assert results["no-lora"] == ref_b


def test_lora_manager_lru_eviction(setup):
    from vllm_splitwise_tpu.lora.models import LoRAModel, LoRAModelManager
    mgr = LoRAModelManager(num_layers=2, max_loras=2, max_rank=8,
                           module_shapes={"q_proj": (64, 64)})
    for lid in (1, 2, 3):
        mgr.add_lora(LoRAModel(lid, 8, 1.0, {}))
    s1 = mgr.activate(1)
    s2 = mgr.activate(2)
    assert {s1, s2} == {1, 2}
    s3 = mgr.activate(3)  # evicts LRU (adapter 1)
    assert s3 == s1
    assert 1 not in mgr.slot_to_id
    # Re-activating 1 evicts 2 now.
    s1b = mgr.activate(1)
    assert s1b == s2
