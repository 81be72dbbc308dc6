"""prompt_logprobs, logits processors, and guided decoding tests."""
import numpy as np
import pytest

from vllm_splitwise_tpu import LLM, SamplingParams

from ..models.utils import (hf_model_and_weights, save_local_checkpoint,
                            save_tiny_tokenizer, tiny_llama_config)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_lp"))
    config = tiny_llama_config()
    hf, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_paddings=512, swap_space=0.1)
    return llm, hf, config


def test_prompt_logprobs_match_hf(setup):
    import torch
    llm, hf, config = setup
    ids = [5, 9, 17, 33, 101, 7, 42]
    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=1,
                            prompt_logprobs=3, ignore_eos=True),
                        use_tqdm=False)
    plp = outs[0].prompt_logprobs
    assert plp is not None and len(plp) == len(ids)
    assert plp[0] is None
    with torch.no_grad():
        logits = hf(torch.tensor([ids])).logits[0]
        ref_lp = torch.log_softmax(logits.float(), dim=-1).numpy()
    for i in range(1, len(ids)):
        entry = plp[i]
        assert ids[i] in entry
        assert len(entry) >= 3
        np.testing.assert_allclose(entry[ids[i]].logprob,
                                   ref_lp[i - 1, ids[i]], atol=5e-3)


def test_logits_processor_bans_token(setup):
    llm, _, config = setup
    ids = [5, 9, 17, 33]
    # Baseline greedy choice, then ban it; generation must avoid it.
    base = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(temperature=0.0,
                                                       max_tokens=4,
                                                       ignore_eos=True),
                        use_tqdm=False)
    banned = set(base[0].outputs[0].token_ids)

    def ban(output_ids, logits):
        for b in banned:
            logits[b] = -1e30
        return logits

    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=4, ignore_eos=True,
                            logits_processors=[ban]),
                        use_tqdm=False)
    assert not banned.intersection(outs[0].outputs[0].token_ids)


def test_guided_choice(setup):
    from vllm_splitwise_tpu.layers.guided_logits_processors import \
        ChoiceLogitsProcessor
    llm, _, config = setup
    tok = llm.get_tokenizer()
    choices = ["t10 t11", "t20 t21 t22"]
    proc = ChoiceLogitsProcessor(choices, tok)
    outs = llm.generate(prompt_token_ids=[[5, 9, 17]],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=8,
                            logits_processors=[proc]),
                        use_tqdm=False)
    text = outs[0].outputs[0].text.strip()
    assert text in choices, text


def test_guided_regex(setup):
    from vllm_splitwise_tpu.layers.guided_logits_processors import \
        RegexLogitsProcessor
    import regex as re
    llm, _, config = setup
    tok = llm.get_tokenizer()
    pattern = r" ?t1\d( t2\d)+"
    proc = RegexLogitsProcessor(pattern, tok)
    outs = llm.generate(prompt_token_ids=[[5, 9]],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=6,
                            logits_processors=[proc]),
                        use_tqdm=False)
    text = outs[0].outputs[0].text
    # Generated text is a (possibly partial-at-cutoff) match of the guide.
    assert re.fullmatch(pattern, text, partial=True), text


def test_json_schema_regex_builder():
    from vllm_splitwise_tpu.layers.guided_logits_processors import \
        build_regex_from_schema
    import regex as re
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "role": {"enum": ["a", "b"]},
        },
    }
    pattern = build_regex_from_schema(schema)
    ok = '{"name": "x", "age": 3, "tags": ["p", "q"], "role": "a"}'
    assert re.fullmatch(pattern, ok)
    bad = '{"name": 3, "age": "x"}'
    assert re.fullmatch(pattern, bad) is None


def test_prompt_logprobs_with_logits_processor(setup):
    """prompt_logprobs must survive the host-processors slow path (they
    were silently dropped when any group carried a processor)."""
    import torch
    llm, hf, config = setup
    ids = [5, 9, 17, 33, 101, 7, 42]

    def noop(output_ids, logits):
        return logits

    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=1,
                            prompt_logprobs=3, ignore_eos=True,
                            logits_processors=[noop]),
                        use_tqdm=False)
    plp = outs[0].prompt_logprobs
    assert plp is not None and len(plp) == len(ids)
    assert plp[0] is None
    with torch.no_grad():
        logits = hf(torch.tensor([ids])).logits[0]
        ref_lp = torch.log_softmax(logits.float(), dim=-1).numpy()
    for i in range(1, len(ids)):
        got = plp[i][ids[i]].logprob
        np.testing.assert_allclose(got, ref_lp[i - 1, ids[i]], atol=1e-3)


def test_logits_processor_with_spec_decode_keeps_draft_synced(
        tmp_path_factory):
    """A processor-bearing step must still sync the draft cache: after
    guided requests finish, speculative acceptance must not collapse."""
    d = str(tmp_path_factory.mktemp("tiny_spec_guided"))
    config = tiny_llama_config()
    _, weights = hf_model_and_weights(config)
    save_local_checkpoint(config, weights, d)
    save_tiny_tokenizer(d, config.vocab_size)
    llm = LLM(model=d, dtype="float32", max_model_len=256,
              num_gpu_blocks_override=64, max_num_seqs=4,
              max_paddings=512, swap_space=0.05,
              speculative_model=d, num_speculative_tokens=3)
    rng = np.random.RandomState(5)
    ids = rng.randint(3, config.vocab_size, size=12).tolist()

    def noop(output_ids, logits):
        return logits

    # Prefill + every decode step takes the host-processor path — the
    # draft cache must ingest the prompt AND each committed token.
    outs = llm.generate(prompt_token_ids=[ids],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=6, ignore_eos=True,
                            logits_processors=[noop]),
                        use_tqdm=False)
    guided_tokens = outs[0].outputs[0].token_ids

    # Now a plain request: speculation resumes against a hole-free draft
    # cache (the draft IS the target, so acceptance stays high).
    plain = llm.generate(prompt_token_ids=[ids],
                         sampling_params=SamplingParams(
                             temperature=0.0, max_tokens=6,
                             ignore_eos=True),
                         use_tqdm=False)
    assert plain[0].outputs[0].token_ids == guided_tokens
    stats = llm.llm_engine.executor.worker.model_runner.spec_stats
    assert stats.acceptance_rate > 0.9, stats.acceptance_rate
