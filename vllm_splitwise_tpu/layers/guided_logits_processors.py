"""Guided-decoding logits processors (reference role:
vllm/model_executor/guided_logits_processors.py).

The reference builds outlines DFAs; outlines is not in the TPU image, so
patterns compile through our own regex->DFA pipeline
(layers/guided_fsm.py).  Token masks are then O(vocab) DFA walks per NEW
(dfa_state, prev_token) pair — a few dict lookups per character — and
cached in a bounded LRU keyed by that pair, so steady-state decoding
reuses masks across steps AND across requests sharing the pattern.

A token is allowed iff generated-text + that token's text is still a
prefix of some string matching the pattern; EOS is allowed exactly in
accepting states.  Patterns outside the compiled subset (backreferences,
lookaround) fall back to `regex`-module partial matching with the same
semantics, memoized per (text, prev_token).

Masks are computed on the host: these processors run through the model
runner's raw-logits path.
"""
from __future__ import annotations

import json
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from vllm_splitwise_tpu.layers.guided_fsm import (UnsupportedPatternError,
                                                  compile_regex_dfa)
from vllm_splitwise_tpu.logger import init_logger

try:
    import regex as _re
except ImportError:  # pragma: no cover
    _re = None

logger = init_logger(__name__)

_NEG_INF = np.float32(-1e30)
_MASK_CACHE_CAP = 2048
_WALK_CACHE_CAP = 65536
_MISSING = object()


class RegexLogitsProcessor:

    def __init__(self, pattern: str, tokenizer) -> None:
        if _re is None:
            raise ImportError("guided decoding requires the `regex` module")
        self.pattern = _re.compile(pattern)
        self.tokenizer = tokenizer
        self.eos_token_id = tokenizer.eos_token_id
        self._vocab_size = len(tokenizer)
        try:
            self.dfa = compile_regex_dfa(pattern)
        except UnsupportedPatternError as exc:
            logger.warning(
                "guided pattern %r outside the DFA subset (%s); using "
                "the partial-match fallback", pattern, exc)
            self.dfa = None
        # suffix text a token contributes, conditioned on the previous
        # token (decode is local to adjacent tokens for BPE/SP/WordLevel:
        # "t20"+"t21" may join as "t20 t21" — the space belongs to the
        # suffix).  Keyed by prev token id; None = sequence start.
        self._suffix_cache: Dict[Optional[int], List[str]] = {}
        # DFA path: (state, prev_id) -> mask.  Fallback: (text, prev_id).
        self._mask_cache: "OrderedDict[tuple, np.ndarray]" = OrderedDict()
        # token-id tuple -> DFA state (None = dead); grown incrementally.
        self._walk_cache: "OrderedDict[Tuple[int, ...], Optional[int]]" = \
            OrderedDict()

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

    def _cache_put(self, cache: OrderedDict, key, value) -> None:
        cache[key] = value
        cap = _WALK_CACHE_CAP if cache is self._walk_cache \
            else _MASK_CACHE_CAP
        while len(cache) > cap:
            cache.popitem(last=False)

    # ---- compiled-DFA path -------------------------------------------

    def _state_for(self, ids: Tuple[int, ...]) -> Optional[int]:
        """DFA state after the generated tokens (None = dead)."""
        state = self._walk_cache.get(ids, _MISSING)
        if state is not _MISSING:
            return state
        # Longest cached prefix, then walk forward token by token.
        n = len(ids)
        base = 0
        state = 0
        for k in range(n - 1, 0, -1):
            hit = self._walk_cache.get(ids[:k], _MISSING)
            if hit is not _MISSING:
                base, state = k, hit
                break
        for k in range(base, n):
            if state is None:
                break
            prev_id = ids[k - 1] if k else None
            suffix = self._suffixes_after(prev_id)[ids[k]]
            state = self.dfa.walk(state, suffix)
            self._cache_put(self._walk_cache, ids[:k + 1], state)
        return state

    def _dfa_mask(self, state: Optional[int], prev_id: Optional[int],
                  vocab: int) -> np.ndarray:
        key = (state, prev_id)
        cached = self._mask_cache.get(key)
        if cached is not None:
            return cached
        mask = np.full((vocab, ), _NEG_INF, dtype=np.float32)
        if state is not None:
            suffixes = self._suffixes_after(prev_id)
            walk = self.dfa.walk
            for tid in range(min(vocab, len(suffixes))):
                ts = suffixes[tid]
                if ts and walk(state, ts) is not None:
                    mask[tid] = 0.0
            if self.dfa.is_accepting(state) and \
                    self.eos_token_id is not None and \
                    self.eos_token_id < vocab:
                mask[self.eos_token_id] = 0.0
        if not (mask == 0.0).any() and self.eos_token_id is not None \
                and self.eos_token_id < vocab:
            # Dead end: force EOS rather than emitting garbage.
            mask[self.eos_token_id] = 0.0
        self._cache_put(self._mask_cache, key, mask)
        return mask

    # ---- partial-match fallback ----------------------------------------

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
        self._cache_put(self._mask_cache, key, mask)
        return mask

    def __call__(self, output_token_ids: List[int],
                 logits: np.ndarray) -> np.ndarray:
        prev_id = output_token_ids[-1] if output_token_ids else None
        if self.dfa is not None:
            state = self._state_for(tuple(output_token_ids))
            mask = self._dfa_mask(state, prev_id, logits.shape[-1])
        else:
            text = self.tokenizer.decode(output_token_ids) \
                if output_token_ids else ""
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
