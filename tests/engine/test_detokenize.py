"""Incremental detokenization (reference pattern:
tests/engine/test_detokenize.py — streaming decode must equal one-shot
decode for every prefix)."""
import pytest
from transformers import AutoTokenizer

from vllm_splitwise_tpu.transformers_utils.tokenizer import (
    detokenize_incrementally)

from ..models.utils import save_tiny_tokenizer


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tok"))
    save_tiny_tokenizer(d, 256)
    return AutoTokenizer.from_pretrained(d)


def test_streaming_matches_full_decode(tokenizer):
    ids = [5, 9, 23, 41, 7, 3, 11, 100, 255, 2]
    prev_tokens = None
    prefix_offset = read_offset = 0
    streamed = ""
    for i in range(1, len(ids) + 1):
        new_tokens, text, prefix_offset, read_offset = \
            detokenize_incrementally(tokenizer, ids[:i], prev_tokens,
                                     prefix_offset, read_offset)
        streamed += text
        if prev_tokens is None:
            prev_tokens = new_tokens
        else:
            prev_tokens += new_tokens
    full = tokenizer.decode(ids)
    assert streamed.strip() == full.strip()


def test_streaming_is_prefix_monotonic(tokenizer):
    ids = [12, 7, 99, 42, 8]
    prev_tokens = None
    prefix_offset = read_offset = 0
    acc = ""
    for i in range(1, len(ids) + 1):
        new_tokens, text, prefix_offset, read_offset = \
            detokenize_incrementally(tokenizer, ids[:i], prev_tokens,
                                     prefix_offset, read_offset)
        acc2 = acc + text
        assert acc2.startswith(acc)
        acc = acc2
        if prev_tokens is None:
            prev_tokens = new_tokens
        else:
            prev_tokens += new_tokens


def test_first_output_token_eos_emits_nothing(tokenizer):
    """Regression: prompt [5, 6] + an immediate EOS as the FIRST output
    token.  With skip_special_tokens the EOS vanishes from the token
    list; the offset math must not re-emit the last prompt token as
    generated text."""
    eos = tokenizer.eos_token_id
    new_tokens, text, prefix_offset, read_offset = \
        detokenize_incrementally(tokenizer, [5, 6, eos], None, 0, 0,
                                 skip_special_tokens=True)
    assert text == ""
    # Offsets must stay consistent for a follow-up token.
    prev = new_tokens
    _, text2, _, _ = detokenize_incrementally(
        tokenizer, [5, 6, eos, 9], prev, prefix_offset, read_offset,
        skip_special_tokens=True)
    assert text2.strip() == tokenizer.decode([9])
