"""LoRA on the embedding + LM head with adapter-added vocab (reference
vllm/lora/layers.py:150 VocabParallelEmbeddingWithLoRA, :786
SamplerWithLoRA, models/llama.py:292-304): greedy engine output with the
adapter must match an HF oracle whose embeddings were resized to
base+extra and merged with the low-rank deltas."""
import json
import os

import numpy as np
import pytest

RANK = 8
ALPHA = 16  # scaling 2.0
N_EXTRA = 2  # adapter-added tokens


def _make_embedding_adapter(path: str, config, seed: int):
    """PEFT-format adapter targeting embed_tokens + lm_head, with a
    new_embeddings sidecar for N_EXTRA added tokens.  Returns the pieces
    the HF oracle needs."""
    from safetensors.numpy import save_file
    rng = np.random.RandomState(seed)
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump({"r": RANK, "lora_alpha": ALPHA,
                   "target_modules": ["embed_tokens", "lm_head"]}, f)
    h = config.hidden_size
    v = config.vocab_size
    scaling = ALPHA / RANK

    # Embedding: lora_embedding_A [r, V+E] (covers added ids too),
    # lora_embedding_B [H, r]; delta_in = A.T @ B.T * scaling.
    emb_a = (rng.standard_normal((RANK, v + N_EXTRA)) * 0.05).astype(
        np.float32)
    emb_b = (rng.standard_normal((h, RANK)) * 0.05).astype(np.float32)
    # LM head: lora_A [r, H], lora_B [V+E, r]; delta_out = B @ A * scaling.
    head_a = (rng.standard_normal((RANK, h)) * 0.05).astype(np.float32)
    head_b = (rng.standard_normal((v + N_EXTRA, RANK)) * 0.05).astype(
        np.float32)
    state = {
        "base_model.model.model.embed_tokens.lora_embedding_A": emb_a,
        "base_model.model.model.embed_tokens.lora_embedding_B": emb_b,
        "base_model.model.lm_head.lora_A.weight": head_a,
        "base_model.model.lm_head.lora_B.weight": head_b,
    }
    save_file(state, os.path.join(path, "adapter_model.safetensors"))

    extra_in = (rng.standard_normal((N_EXTRA, h)) * 0.1).astype(
        np.float32)
    extra_out = (rng.standard_normal((N_EXTRA, h)) * 0.1).astype(
        np.float32)
    save_file({"input_embeddings": extra_in,
               "output_embeddings": extra_out},
              os.path.join(path, "new_embeddings.safetensors"))
    return {
        "delta_in": emb_a.T @ emb_b.T * scaling,     # [V+E, H]
        "delta_out": head_b @ head_a * scaling,      # [V+E, H]
        "extra_in": extra_in,
        "extra_out": extra_out,
    }


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import torch

    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer, tiny_llama_config)
    from vllm_splitwise_tpu import LLM

    d = str(tmp_path_factory.mktemp("tiny_emb_lora"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)

    adapter_dir = str(tmp_path_factory.mktemp("emb_adapter"))
    pieces = _make_embedding_adapter(adapter_dir, config, seed=21)

    # HF oracle: resize to base+extra, then merge the deltas.
    import copy
    hf_merged = copy.deepcopy(hf)
    hf_merged.resize_token_embeddings(config.vocab_size + N_EXTRA)
    with torch.no_grad():
        w_in = hf_merged.get_input_embeddings().weight
        w_in[config.vocab_size:] = torch.tensor(pieces["extra_in"])
        w_in += torch.tensor(pieces["delta_in"])
        w_out = hf_merged.get_output_embeddings().weight
        w_out[config.vocab_size:] = torch.tensor(pieces["extra_out"])
        w_out += torch.tensor(pieces["delta_out"])
    hf_merged.eval()

    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1, enable_lora=True,
              max_loras=2, max_lora_rank=RANK,
              lora_extra_vocab_size=256)
    return llm, hf, hf_merged, adapter_dir, config


def test_embedding_lora_matches_resized_oracle(setup):
    import torch

    from vllm_splitwise_tpu import SamplingParams
    from vllm_splitwise_tpu.lora.request import LoRARequest
    llm, hf, hf_merged, adapter_dir, config = setup
    v = config.vocab_size

    rng = np.random.RandomState(3)
    # Prompt mixes base ids and an adapter-added id.
    ids = rng.randint(3, v, size=10).tolist() + [v + 1] + \
        rng.randint(3, v, size=3).tolist()
    req = LoRARequest("emb1", 1, adapter_dir)
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    out = llm.generate(prompt_token_ids=[ids], sampling_params=sp,
                       lora_request=req, use_tqdm=False)[0]
    with torch.no_grad():
        ref = hf_merged.generate(torch.tensor([ids]), max_new_tokens=8,
                                 do_sample=False)[0, len(ids):].tolist()
    assert out.outputs[0].token_ids == ref

    # The base model (no adapter) is untouched, and a no-adapter request
    # can never sample an added id.
    base_ids = rng.randint(3, v, size=12).tolist()
    out_base = llm.generate(prompt_token_ids=[base_ids],
                            sampling_params=sp, use_tqdm=False)[0]
    with torch.no_grad():
        ref_base = hf.generate(torch.tensor([base_ids]), max_new_tokens=8,
                               do_sample=False)[0, len(base_ids):].tolist()
    assert out_base.outputs[0].token_ids == ref_base
    assert all(t < v for t in out_base.outputs[0].token_ids)


def test_extra_vocab_ids_can_be_sampled(setup):
    """An adapter whose output-embedding row dominates the logits must
    actually emit its added token; rows beyond the adapter's declared
    extra count must never appear."""
    import torch

    from vllm_splitwise_tpu import SamplingParams
    from vllm_splitwise_tpu.lora.request import LoRARequest
    llm, _, hf_merged, adapter_dir, config = setup
    v = config.vocab_size

    rng = np.random.RandomState(5)
    ids = rng.randint(3, v, size=9).tolist()
    req = LoRARequest("emb1", 1, adapter_dir)
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    out = llm.generate(prompt_token_ids=[ids], sampling_params=sp,
                       lora_request=req, use_tqdm=False)[0]
    got = out.outputs[0].token_ids
    with torch.no_grad():
        ref = hf_merged.generate(torch.tensor([ids]), max_new_tokens=12,
                                 do_sample=False)[0, len(ids):].tolist()
    assert got == ref
    assert all(t < v + N_EXTRA for t in got)


def test_mixed_batch_embedding_and_plain_rows(setup):
    """One batch mixing an embedding-adapter row and a plain row: the
    plain row's logits pad to the widened vocab with -inf and its output
    matches the base model exactly."""
    import torch

    from vllm_splitwise_tpu import SamplingParams
    from vllm_splitwise_tpu.lora.request import LoRARequest
    llm, hf, hf_merged, adapter_dir, config = setup
    v = config.vocab_size
    engine = llm.llm_engine

    rng = np.random.RandomState(8)
    p_lora = rng.randint(3, v, size=11).tolist()
    p_base = rng.randint(3, v, size=11).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    engine.add_request("lora", None, sp, p_lora,
                       lora_request=LoRARequest("emb1", 1, adapter_dir))
    engine.add_request("base", None, sp, p_base)
    results = {}
    while engine.has_unfinished_requests():
        for out in engine.step():
            if out.finished:
                results[out.request_id] = out.outputs[0].token_ids
    with torch.no_grad():
        ref_l = hf_merged.generate(torch.tensor([p_lora]),
                                   max_new_tokens=6,
                                   do_sample=False)[0, len(p_lora):]
        ref_b = hf.generate(torch.tensor([p_base]), max_new_tokens=6,
                            do_sample=False)[0, len(p_base):]
    # HF stops at EOS; the engine runs ignore_eos=True — compare the
    # overlapping prefix (tokens past HF's EOS are unconstrained).
    assert results["lora"][:len(ref_l)] == ref_l.tolist()
    assert results["base"][:len(ref_b)] == ref_b.tolist()
