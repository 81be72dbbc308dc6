"""--quantize-lm-head int8: per-channel W8A16 head must track the fp
head's logits closely (weight-only, f32 accumulate) and serve e2e."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from .utils import (hf_model_and_weights, save_local_checkpoint,
                        save_tiny_tokenizer, tiny_llama_config)
    d = str(tmp_path_factory.mktemp("tiny_qhead"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    return d, hf, config


def test_quantized_head_logits_close(ckpt):
    import torch

    from vllm_splitwise_tpu import LLM, SamplingParams
    d, hf, config = ckpt
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              num_gpu_blocks_override=32, max_num_seqs=4,
              max_paddings=256, swap_space=0.05,
              quantize_lm_head="int8")
    runner = llm.llm_engine.executor.worker.model_runner
    assert isinstance(runner.params["lm_head"], dict)

    rng = np.random.RandomState(0)
    ids = rng.randint(3, config.vocab_size, size=12).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=1, ignore_eos=True,
                        logprobs=5)
    out = llm.generate(prompt_token_ids=[ids], sampling_params=sp,
                       use_tqdm=False)[0]
    with torch.no_grad():
        ref_logits = hf(torch.tensor([ids])).logits[0, -1].float()
        ref_lp = torch.log_softmax(ref_logits, dim=-1)
    tok = out.outputs[0].token_ids[0]
    # int8 per-channel weight error is ~0.4% of the weight scale; the
    # chosen-token logprob must match the fp oracle to ~2e-2.
    got_lp = out.outputs[0].logprobs[0][tok].logprob
    assert abs(got_lp - ref_lp[tok].item()) < 2e-2
    # And greedy still picks the oracle argmax on this prompt.
    assert tok == int(torch.argmax(ref_logits))


def test_quantized_head_generates(ckpt):
    from vllm_splitwise_tpu import LLM, SamplingParams
    d, _, config = ckpt
    llm = LLM(model=d, dtype="float32", max_model_len=128,
              num_gpu_blocks_override=32, max_num_seqs=4,
              max_paddings=256, swap_space=0.05,
              quantize_lm_head="int8")
    rng = np.random.RandomState(1)
    prompts = [rng.randint(3, config.vocab_size, size=n).tolist()
               for n in (8, 13)]
    outs = llm.generate(
        prompt_token_ids=prompts,
        sampling_params=SamplingParams(temperature=0.0, max_tokens=6,
                                       ignore_eos=True),
        use_tqdm=False)
    for out in outs:
        assert len(out.outputs[0].token_ids) == 6
        assert all(0 <= t < config.vocab_size
                   for t in out.outputs[0].token_ids)
