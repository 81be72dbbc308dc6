"""Compiled guided-decoding FSM tests: the regex->DFA pipeline must
agree with the `regex` module on full matches AND on prefix (partial)
matches — the property guided decoding relies on."""
import json
import random
import string

import numpy as np
import pytest
import regex as re

from vllm_splitwise_tpu.layers.guided_fsm import (UnsupportedPatternError,
                                                  compile_regex_dfa)

PATTERNS = [
    r"abc",
    r"a+b*c?",
    r"(?:foo|bar|baz)+",
    r"[a-f0-9]{4}",
    r"[^0-9]{2,5}x",
    r"-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-][0-9]+)?",
    r'"(?:[^"\\\x00-\x1f]|\\["\\bfnrt/]|\\u[0-9a-fA-F]{4})*"',
    r"\d{3}-\d{2}-\d{4}",
    r"a|",
    r"(?:ab){2,}",
    r"\w+@\w+\.(?:com|org)",
]


def _char_tokenizer(chars: str):
    """Single-character vocab whose decode concatenates exactly (Fuse
    decoder) — token suffixes are then the characters themselves."""
    from tokenizers import Tokenizer, decoders, models
    from transformers import PreTrainedTokenizerFast
    vocab = {ch: i for i, ch in enumerate(chars)}
    vocab["<eos>"] = len(vocab)
    t = Tokenizer(models.WordLevel(vocab, unk_token=chars[0]))
    t.decoder = decoders.Fuse()
    return PreTrainedTokenizerFast(tokenizer_object=t, eos_token="<eos>")


def _random_strings(rng, alphabet, n=300, max_len=8):
    out = [""]
    for _ in range(n):
        k = rng.randint(0, max_len)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    return out


@pytest.mark.parametrize("pattern", PATTERNS)
def test_dfa_matches_regex_semantics(pattern):
    dfa = compile_regex_dfa(pattern)
    compiled = re.compile(pattern)
    rng = random.Random(0)
    alphabet = list(string.ascii_lowercase[:8]) + list("0123456789") + \
        list('.-+eE@"\\') + ["f", "o", "b", "a", "r", "x"]
    for s in _random_strings(rng, alphabet):
        state = dfa.walk(0, s)
        full = compiled.fullmatch(s) is not None
        partial = compiled.fullmatch(s, partial=True) is not None
        # Live state <=> s is a prefix of some match (partial fullmatch
        # counts complete matches too).
        assert (state is not None) == (partial or full), (pattern, s)
        assert dfa.is_accepting(state) == full, (pattern, s)


def test_json_schema_regex_compiles():
    from vllm_splitwise_tpu.layers.guided_logits_processors import \
        build_regex_from_schema
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
            "kind": {"enum": ["a", "b"]},
        },
    }
    pattern = build_regex_from_schema(schema)
    dfa = compile_regex_dfa(pattern)
    doc = json.dumps({"name": "x", "age": 3, "tags": ["t"], "kind": "a"},
                     separators=(",", ":"))
    # separators=(',', ':') gives no whitespace; schema regex allows it.
    state = dfa.walk(0, doc.replace('"kind":"a"', '"kind": "a"')
                     if False else doc)
    assert dfa.is_accepting(state), doc
    # Every prefix of the document stays live.
    st = 0
    for ch in doc:
        st = dfa.step(st, ch)
        assert st is not None


def test_unsupported_patterns_raise():
    for pattern in [r"(a)\1", r"a(?=b)", r"(?P<x>a)"]:
        with pytest.raises(UnsupportedPatternError):
            compile_regex_dfa(pattern)


def test_processor_dfa_agrees_with_fallback():
    """The DFA-backed processor and the partial-match fallback must
    produce identical masks for the same states."""
    from vllm_splitwise_tpu.layers.guided_logits_processors import \
        RegexLogitsProcessor

    tok = _char_tokenizer("0123456789.-abc")
    pattern = r"-?[0-9]+(?:\.[0-9]+)?"

    proc = RegexLogitsProcessor(pattern, tok)
    assert proc.dfa is not None
    fallback = RegexLogitsProcessor(pattern, tok)
    fallback.dfa = None

    tid = tok.get_vocab()
    logits = np.zeros((len(tid), ), np.float32)
    histories = [[], [tid["-"]], [tid["1"]],
                 [tid["1"], tid["."]],
                 [tid["-"], tid["3"], tid["."], tid["1"]]]
    for h in histories:
        a = proc(h, logits.copy())
        b = fallback(h, logits.copy())
        np.testing.assert_array_equal(a, b, err_msg=str(h))


def test_dfa_walk_cache_incremental():
    from vllm_splitwise_tpu.layers.guided_logits_processors import \
        RegexLogitsProcessor

    tok = _char_tokenizer("ab")
    proc = RegexLogitsProcessor(r"(?:ab)+", tok)
    assert proc.dfa is not None
    tid = tok.get_vocab()
    logits = np.zeros((len(tid), ), np.float32)
    ids = []
    for step in range(6):
        out = proc(ids, logits.copy())
        allowed = set(np.nonzero(out > -1e29)[0].tolist())
        want = {tid["a"]} if step % 2 == 0 else {tid["b"]}
        if step and step % 2 == 0:
            want.add(tid["<eos>"])  # even-length "abab..." is complete
        assert allowed == want, (step, allowed)
        ids.append(tid["a"] if step % 2 == 0 else tid["b"])
