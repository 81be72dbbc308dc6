"""Plumbing test for the quantized-quality harness
(benchmarks/eval_quality.py): on a tiny model the engine must score
teacher-forced prompts within a hair of the fp32 torch oracle, and the
int4 checkpoint's scores must stay close to fp16's (reference pattern:
tests/models/test_marlin.py logprob deltas)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))


@pytest.fixture(scope="module")
def harness():
    import eval_quality
    return eval_quality


def test_quality_metrics_within_bounds(harness, tmp_path):
    from .models.utils import hf_model_and_weights, tiny_llama_config

    config = tiny_llama_config(vocab_size=512, hidden_size=128, layers=2,
                               heads=4, kv_heads=2, intermediate=256)
    hf, weights = hf_model_and_weights(config, seed=0)
    rng = np.random.default_rng(0)
    corpus = harness.make_corpus(rng, 4, 96, config.vocab_size)

    dirs = harness.write_checkpoints(config, weights, str(tmp_path), 32)
    ppl_oracle = harness.oracle_ppl(hf, corpus)

    llm = harness.build_llm(dirs["fp16"])
    ppl_fp16, base = harness.engine_prompt_scores(llm, corpus)
    del llm
    # Engine numerics: bf16 engine vs fp32 torch teacher-forced.
    assert abs(ppl_fp16 - ppl_oracle) / ppl_oracle < 0.01

    llm = harness.build_llm(dirs["gptq"])
    ppl_q, qscores = harness.engine_prompt_scores(llm, corpus)
    del llm
    # int4 RTN at group 32 on a tiny net: stays within 5% relative ppl
    # (the bar BASELINE sets for reference-matching bit-width quality).
    assert abs(ppl_q - ppl_fp16) / ppl_fp16 < 0.05
    deltas = np.concatenate(
        [np.abs(qscores[i] - base[i]) for i in qscores])
    assert float(deltas.mean()) < 0.25
