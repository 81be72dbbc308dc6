"""Sliding-window attention end-to-end: decode past the window must keep
ABSOLUTE RoPE positions (the window clamps only the attended context).
Regression for the bug where decode positions were derived from the
clamped context length, freezing RoPE at window-1 for every token past
the window (reference parity: vllm model_runner decode prep uses
seq_len - 1)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def mistral_ckpt(tmp_path_factory):
    from transformers import MistralConfig

    from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                                save_tiny_tokenizer)
    d = str(tmp_path_factory.mktemp("tiny_mistral_sw"))
    config = MistralConfig(vocab_size=256, hidden_size=64,
                           intermediate_size=128, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           max_position_embeddings=512, sliding_window=8,
                           tie_word_embeddings=False)
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


def test_decode_past_window_matches_hf(mistral_ckpt):
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = mistral_ckpt
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              num_gpu_blocks_override=64, block_size=4, max_num_seqs=4,
              max_paddings=512, swap_space=0.05)
    assert llm.llm_engine.model_config.get_sliding_window() == 8

    import torch
    rng = np.random.RandomState(3)
    # Prompt twice the window; 12 new tokens all decode PAST the window.
    prompts = [rng.randint(3, config.vocab_size, size=16).tolist(),
               rng.randint(3, config.vocab_size, size=11).tolist()]
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    outs = llm.generate(prompt_token_ids=prompts, sampling_params=sp,
                        use_tqdm=False)
    for ids, out in zip(prompts, outs):
        with torch.no_grad():
            ref = hf.generate(torch.tensor([ids]), max_new_tokens=12,
                              do_sample=False)[0, len(ids):].tolist()
        assert out.outputs[0].token_ids == ref
