"""Guided-decoding logits processors (reference role:
vllm/model_executor/guided_logits_processors.py).

The reference builds outlines DFAs; outlines is not in the TPU image, so
this is an independent implementation on `regex`'s partial-match support:
a token is allowed iff the generated text + that token's text is still a
prefix of some string matching the pattern.  Masks are computed on the
host (these processors run through the model runner's raw-logits path)
and memoized per generated-text state.

Known cost: O(vocab) partial-match tests per new state.  A compiled
DFA-over-token-trie (outlines-style) is the planned optimization; the
semantics here are the contract.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Union

import numpy as np

try:
    import regex as _re
except ImportError:  # pragma: no cover
    _re = None

_NEG_INF = np.float32(-1e30)


class RegexLogitsProcessor:

    def __init__(self, pattern: str, tokenizer) -> None:
        if _re is None:
            raise ImportError("guided decoding requires the `regex` module")
        self.pattern = _re.compile(pattern)
        self.tokenizer = tokenizer
        self.eos_token_id = tokenizer.eos_token_id
        self._vocab_size = len(tokenizer)
        # suffix text a token contributes, conditioned on the previous
        # token (decode is local to adjacent tokens for BPE/SP/WordLevel:
        # "t20"+"t21" may join as "t20 t21" — the space belongs to the
        # suffix).  Keyed by prev token id; None = sequence start.
        self._suffix_cache: Dict[Optional[int], List[str]] = {}
        self._mask_cache: Dict[tuple, np.ndarray] = {}

    def _suffixes_after(self, prev_id: Optional[int]) -> List[str]:
        cached = self._suffix_cache.get(prev_id)
        if cached is not None:
            return cached
        tok = self.tokenizer
        suffixes = []
        if prev_id is None:
            for i in range(self._vocab_size):
                try:
                    suffixes.append(tok.decode([i]))
                except Exception:  # pragma: no cover
                    suffixes.append("")
        else:
            base = tok.decode([prev_id])
            for i in range(self._vocab_size):
                try:
                    joined = tok.decode([prev_id, i])
                except Exception:  # pragma: no cover
                    joined = base
                suffixes.append(joined[len(base):])
        self._suffix_cache[prev_id] = suffixes
        return suffixes

    def _allowed_mask(self, text: str, prev_id: Optional[int],
                      vocab: int) -> np.ndarray:
        key = (text, prev_id)
        cached = self._mask_cache.get(key)
        if cached is not None:
            return cached
        suffixes = self._suffixes_after(prev_id)
        mask = np.full((vocab, ), _NEG_INF, dtype=np.float32)
        complete = self.pattern.fullmatch(text) is not None
        for tid in range(min(vocab, len(suffixes))):
            ts = suffixes[tid]
            if not ts:
                continue
            if self.pattern.fullmatch(text + ts, partial=True) is not None:
                mask[tid] = 0.0
        if complete and self.eos_token_id is not None and \
                self.eos_token_id < vocab:
            mask[self.eos_token_id] = 0.0
        if not (mask == 0.0).any() and self.eos_token_id is not None \
                and self.eos_token_id < vocab:
            # Dead end: force EOS rather than emitting garbage.
            mask[self.eos_token_id] = 0.0
        self._mask_cache[key] = mask
        return mask

    def __call__(self, output_token_ids: List[int],
                 logits: np.ndarray) -> np.ndarray:
        text = self.tokenizer.decode(output_token_ids) \
            if output_token_ids else ""
        prev_id = output_token_ids[-1] if output_token_ids else None
        mask = self._allowed_mask(text, prev_id, logits.shape[-1])
        return logits + mask


class ChoiceLogitsProcessor(RegexLogitsProcessor):

    def __init__(self, choices: List[str], tokenizer) -> None:
        pattern = "|".join(_re.escape(c) for c in choices)
        super().__init__(pattern, tokenizer)


class JSONLogitsProcessor(RegexLogitsProcessor):
    """JSON-schema guided generation via schema -> regex translation
    (subset: object with typed properties, string/number/integer/boolean,
    enums, arrays of simple types)."""

    def __init__(self, schema: Union[str, dict], tokenizer,
                 whitespace_pattern: Optional[str] = None) -> None:
        if isinstance(schema, str):
            schema = json.loads(schema)
        ws = whitespace_pattern or r"[ \n\t]*"
        pattern = build_regex_from_schema(schema, ws)
        super().__init__(pattern, tokenizer)


_TYPE_REGEX = {
    "string": r'"(?:[^"\\\x00-\x1f]|\\["\\bfnrt/]|\\u[0-9a-fA-F]{4})*"',
    "integer": r"-?(?:0|[1-9][0-9]*)",
    "number": r"-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-][0-9]+)?",
    "boolean": r"(?:true|false)",
    "null": r"null",
}


def build_regex_from_schema(schema: dict, ws: str = r"[ \n\t]*") -> str:
    return _schema_to_regex(schema, ws)


def _schema_to_regex(schema: dict, ws: str) -> str:
    if "enum" in schema:
        return "(?:" + "|".join(
            _re.escape(json.dumps(v)) for v in schema["enum"]) + ")"
    stype = schema.get("type", "object")
    if stype in _TYPE_REGEX:
        return _TYPE_REGEX[stype]
    if stype == "array":
        item = _schema_to_regex(schema.get("items", {"type": "string"}), ws)
        return (rf"\[{ws}(?:{item}(?:{ws},{ws}{item})*)?{ws}\]")
    if stype == "object":
        props = schema.get("properties", {})
        if not props:
            return r"\{[^{}]*\}"
        parts = []
        for name, sub in props.items():
            key = _re.escape(json.dumps(name))
            parts.append(f"{key}{ws}:{ws}{_schema_to_regex(sub, ws)}")
        body = (ws + "," + ws).join(parts)
        return rf"\{{{ws}{body}{ws}\}}"
    raise ValueError(f"Unsupported JSON schema type: {stype}")
