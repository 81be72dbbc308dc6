"""JSON-schema -> regex converter coverage (reference parity: outlines
build_regex_from_schema via /root/reference/vllm/model_executor/
guided_decoding.py:26-45): required vs optional properties, anyOf/oneOf/
allOf, $ref into definitions/$defs, const, string pattern/minLength/
maxLength, array minItems/maxItems, union types — and every produced
regex must compile on the DFA fast path (not the per-token partial-match
fallback)."""
import re

import pytest

from vllm_splitwise_tpu.layers.guided_fsm import compile_regex_dfa
from vllm_splitwise_tpu.layers.guided_logits_processors import \
    build_regex_from_schema


def _check(schema, good, bad):
    rx = build_regex_from_schema(schema)
    dfa = compile_regex_dfa(rx)  # must not raise: DFA path covers it
    cre = re.compile(rx)
    for s in good:
        assert cre.fullmatch(s), (s, rx[:200])
        st = dfa.walk(0, s)
        assert st is not None and dfa.is_accepting(st), (s, rx[:200])
    for s in bad:
        assert not cre.fullmatch(s), s
        st = dfa.walk(0, s)
        assert st is None or not dfa.is_accepting(st), s


def test_required_vs_optional_properties():
    _check(
        {"type": "object",
         "properties": {"a": {"type": "integer"},
                        "b": {"type": "boolean"},
                        "c": {"type": "integer"}},
         "required": ["b"]},
        ['{"b":true}', '{"a":1,"b":false}', '{"b":true,"c":3}',
         '{"a":1,"b":true,"c":2}', '{"a": 1, "b": true}'],
        ['{}', '{"a":1}', '{"c":2,"b":true}'])


def test_all_properties_optional():
    _check(
        {"type": "object",
         "properties": {"x": {"type": "integer"},
                        "y": {"type": "integer"}},
         "required": []},
        ['{}', '{"x":1}', '{"y":2}', '{"x":1,"y":2}'],
        ['{"y":2,"x":1}'])  # declaration order is enforced


def test_absent_required_keeps_all_props():
    # Without a "required" list every declared property is emitted (the
    # pre-r5 behavior; friendlier for generation than outlines'
    # all-optional default, documented delta).
    _check(
        {"type": "object",
         "properties": {"a": {"type": "integer"},
                        "b": {"type": "boolean"}}},
        ['{"a":1,"b":true}'], ['{}', '{"a":1}'])


def test_anyof_ref_and_string_lengths():
    _check(
        {"$defs": {"name": {"type": "string", "minLength": 1,
                            "maxLength": 3}},
         "type": "object",
         "properties": {"v": {"anyOf": [{"$ref": "#/$defs/name"},
                                        {"type": "integer"}]}},
         "required": ["v"]},
        ['{"v":"ab"}', '{"v":12}'],
        ['{"v":""}', '{"v":"abcd"}', '{"v":true}'])


def test_definitions_ref():
    _check(
        {"definitions": {"id": {"type": "integer"}},
         "type": "object",
         "properties": {"n": {"$ref": "#/definitions/id"}},
         "required": ["n"]},
        ['{"n":7}'], ['{"n":"7"}'])


def test_string_pattern():
    _check(
        {"type": "object",
         "properties": {"id": {"type": "string",
                               "pattern": "^[a-f0-9]{4}$"}},
         "required": ["id"]},
        ['{"id":"a0f9"}'], ['{"id":"zzzz"}', '{"id":"a0f"}'])


def test_const_and_oneof():
    _check({"oneOf": [{"const": "red"}, {"const": 42}]},
           ['"red"', '42'], ['"blue"', '41'])


def test_allof_single():
    _check({"allOf": [{"type": "integer"}]}, ['5'], ['"5"'])
    with pytest.raises(ValueError):
        build_regex_from_schema(
            {"allOf": [{"type": "integer"}, {"minimum": 3}]})


def test_array_bounds():
    _check({"type": "array", "items": {"type": "integer"},
            "minItems": 1, "maxItems": 3},
           ['[1]', '[1,2]', '[1,2,3]'], ['[]', '[1,2,3,4]'])


def test_union_type_list():
    _check({"type": ["integer", "null"]}, ['3', 'null'], ['"x"'])


def test_untyped_schema_is_any_value():
    rx = build_regex_from_schema({})
    dfa = compile_regex_dfa(rx)
    for s in ['3', '"hi"', '[1,"a"]', '{"k":[true,null]}']:
        assert re.fullmatch(rx, s), s
        st = dfa.walk(0, s)
        assert st is not None and dfa.is_accepting(st), s


def test_openai_cookbook_style_schema():
    """The shape the reference serves via outlines (function-calling
    style: nested object, enum, required list, optional field)."""
    schema = {
        "type": "object",
        "properties": {
            "location": {"type": "string"},
            "unit": {"enum": ["celsius", "fahrenheit"]},
            "days": {"type": "integer"},
        },
        "required": ["location", "unit"],
    }
    _check(schema,
           ['{"location":"Paris","unit":"celsius"}',
            '{"location":"NYC","unit":"fahrenheit","days":3}'],
           ['{"location":"Paris"}', '{"unit":"celsius"}'])


def test_recursive_ref_refuses():
    schema = {"$defs": {"node": {"type": "object",
                                 "properties": {
                                     "next": {"$ref": "#/$defs/node"}},
                                 "required": ["next"]}},
              "$ref": "#/$defs/node"}
    with pytest.raises(ValueError):
        build_regex_from_schema(schema)


class _FakeTok:
    """32k-token tokenizer stand-in: id -> short ascii string."""

    def __init__(self, vocab=32000):
        import random
        rng = random.Random(0)
        alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 .,:{}[]\"'"
        self._toks = ["".join(rng.choice(alphabet)
                              for _ in range(rng.randint(1, 6)))
                      for _ in range(vocab)]
        self.eos_token_id = 0

    def __len__(self):
        return len(self._toks)

    def decode(self, ids):
        return "".join(self._toks[i] for i in ids)


def test_fallback_per_step_cost_bounded_at_32k_vocab():
    """The partial-match fallback (patterns outside the DFA subset,
    e.g. lookahead) must stay serviceable at a 32k vocab: first-char
    group pruning bounds the common-case step at O(alphabet +
    survivors) regex matches.  Pin the per-step wall cost and verify
    semantics against the unpruned oracle on a sample."""
    import time

    import numpy as np
    import regex as re_mod

    from vllm_splitwise_tpu.layers.guided_logits_processors import \
        RegexLogitsProcessor

    pattern = r"(?=i)i[a-z0-9 ]{0,40}9"   # lookahead: DFA refuses
    tok = _FakeTok()
    proc = RegexLogitsProcessor(pattern, tok)
    assert proc.dfa is None  # really on the fallback path

    logits = np.zeros((len(tok), ), dtype=np.float32)
    # Warm the suffix/first-char caches (one-time per prev token).
    proc([], logits)
    t0 = time.perf_counter()
    steps = 3
    out = None
    for s in range(steps):
        out = proc(list(range(1, s + 2)), logits.copy())
    per_step = (time.perf_counter() - t0) / steps
    # Generous CI bound; unpruned this is ~32k regex matches per step.
    assert per_step < 2.0, f"fallback step cost {per_step:.2f}s"

    # Semantics: pruned mask == brute-force oracle on a random sample.
    ids = [5, 6]
    masked = proc(ids, logits.copy())
    text = tok.decode(ids)
    cre = re_mod.compile(pattern)
    rng = np.random.RandomState(1)
    for tid in rng.randint(0, len(tok), size=300):
        ts = tok.decode(ids + [int(tid)])[len(text):]
        expected = bool(ts) and \
            cre.fullmatch(text + ts, partial=True) is not None
        got = masked[tid] == 0.0
        assert got == expected, (tid, ts, got, expected)
