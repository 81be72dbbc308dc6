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
        # prev_id -> {first char: [token ids]} (fallback-path pruning).
        self._first_char_cache: Dict[Optional[int],
                                     Dict[str, List[int]]] = {}
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

    def _first_char_groups(
            self, prev_id: Optional[int]) -> Dict[str, List[int]]:
        """Token ids grouped by their suffix's FIRST character: the
        fallback checks one partial match per distinct first char
        (~alphabet size) and only runs per-token matches for tokens
        whose first char survived — bounding the common-case per-step
        cost at O(alphabet + surviving tokens) regex matches instead of
        O(vocab)."""
        cached = self._first_char_cache.get(prev_id)
        if cached is not None:
            return cached
        groups: Dict[str, List[int]] = {}
        for tid, ts in enumerate(self._suffixes_after(prev_id)):
            if ts:
                groups.setdefault(ts[0], []).append(tid)
        self._first_char_cache[prev_id] = groups
        return groups

    def _allowed_mask(self, text: str, prev_id: Optional[int],
                      vocab: int) -> np.ndarray:
        key = (text, prev_id)
        cached = self._mask_cache.get(key)
        if cached is not None:
            return cached
        suffixes = self._suffixes_after(prev_id)
        mask = np.full((vocab, ), _NEG_INF, dtype=np.float32)
        complete = self.pattern.fullmatch(text) is not None
        fullmatch = self.pattern.fullmatch
        for ch, tids in self._first_char_groups(prev_id).items():
            if fullmatch(text + ch, partial=True) is None:
                continue  # every token starting with ch is dead
            for tid in tids:
                if tid >= vocab:
                    continue
                ts = suffixes[tid]
                if len(ts) == 1 or fullmatch(text + ts,
                                             partial=True) is not None:
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


_JSON_STRING_CHAR = (
    r'(?:[^"\\\x00-\x1f]|\\["\\bfnrt/]|\\u[0-9a-fA-F]{4})')
_TYPE_REGEX = {
    "string": rf'"{_JSON_STRING_CHAR}*"',
    "integer": r"-?(?:0|[1-9][0-9]*)",
    "number": r"-?(?:0|[1-9][0-9]*)(?:\.[0-9]+)?(?:[eE][+-][0-9]+)?",
    "boolean": r"(?:true|false)",
    "null": r"null",
}
# Any JSON value (untyped schema / additionalProperties) to a bounded
# nesting depth — a regex cannot match unbounded recursion.
_ANY_VALUE_DEPTH = 3

# $ref resolution depth bound: a RECURSIVE schema has no regular
# language; past this depth the converter refuses rather than looping.
_MAX_REF_DEPTH = 16


def build_regex_from_schema(schema: dict, ws: str = r"[ \n\t]*") -> str:
    """JSON schema -> regex (reference role: outlines
    build_regex_from_schema, used by
    /root/reference/vllm/model_executor/guided_decoding.py:26-45).
    Supports: typed values, enum/const, anyOf/oneOf/allOf, $ref into
    definitions/$defs, required vs optional object properties (optional
    properties alternate in declaration order), string
    pattern/minLength/maxLength, array items/minItems/maxItems."""
    return _schema_to_regex(schema, ws, root=schema, depth=0)


def _any_value_regex(ws: str, depth: int = _ANY_VALUE_DEPTH) -> str:
    scalars = [_TYPE_REGEX[t] for t in
               ("string", "number", "boolean", "null")]
    if depth <= 0:
        return "(?:" + "|".join(scalars) + ")"
    inner = _any_value_regex(ws, depth - 1)
    arr = rf"\[{ws}(?:{inner}(?:{ws},{ws}{inner})*)?{ws}\]"
    key = _TYPE_REGEX["string"]
    member = f"{key}{ws}:{ws}{inner}"
    obj = rf"\{{{ws}(?:{member}(?:{ws},{ws}{member})*)?{ws}\}}"
    return "(?:" + "|".join(scalars + [arr, obj]) + ")"


def _resolve_ref(ref: str, root: dict):
    """Intra-document JSON pointer ($ref: "#/$defs/Name")."""
    if not ref.startswith("#"):
        raise ValueError(
            f"Only intra-document $ref is supported, got {ref!r}")
    node = root
    for part in ref[1:].lstrip("/").split("/"):
        if not part:
            continue
        part = part.replace("~1", "/").replace("~0", "~")
        if isinstance(node, list):
            node = node[int(part)]
        else:
            node = node[part]
    return node


def _string_regex(schema: dict) -> str:
    if "pattern" in schema:
        pat = schema["pattern"]
        # The pattern constrains the string VALUE; anchors are implied
        # by guided generation matching the whole value.
        if pat.startswith("^"):
            pat = pat[1:]
        if pat.endswith("$") and not pat.endswith(r"\$"):
            pat = pat[:-1]
        return f'"(?:{pat})"'
    min_len = schema.get("minLength")
    max_len = schema.get("maxLength")
    if min_len is not None or max_len is not None:
        lo = int(min_len or 0)
        rep = (f"{{{lo},}}" if max_len is None
               else f"{{{lo},{int(max_len)}}}")
        return f'"{_JSON_STRING_CHAR}{rep}"'
    return _TYPE_REGEX["string"]


def _array_regex(schema: dict, ws: str, root: dict, depth: int) -> str:
    item = _schema_to_regex(schema.get("items", {}), ws, root, depth)
    min_items = int(schema.get("minItems", 0))
    max_items = schema.get("maxItems")
    if min_items == 0 and max_items is None:
        return rf"\[{ws}(?:{item}(?:{ws},{ws}{item})*)?{ws}\]"
    more = f"(?:{ws},{ws}{item})"
    lo = max(min_items - 1, 0)
    rep = (f"{{{lo},}}" if max_items is None
           else f"{{{lo},{max(int(max_items) - 1, 0)}}}")
    body = f"{item}{more}{rep}"
    if min_items == 0:
        body = f"(?:{body})?"
    return rf"\[{ws}{body}{ws}\]"


def _object_regex(schema: dict, ws: str, root: dict, depth: int) -> str:
    props = schema.get("properties", {})
    if not props:
        return r"\{[^{}]*\}"
    required = set(schema.get("required", list(props)))
    names = list(props)
    members = []
    for name in names:
        key = _re.escape(json.dumps(name))
        val = _schema_to_regex(props[name], ws, root, depth)
        members.append(f"{key}{ws}:{ws}{val}")
    is_req = [n in required for n in names]

    if any(is_req):
        # Required properties form the backbone (declaration order);
        # optional ones slot in with their comma: BEFORE the last
        # required property the comma trails `(?:m{ws},{ws})?`, after it
        # the comma leads `(?:{ws},{ws}m)?` — every subset containing
        # the required set serializes with correct commas.
        last_req = max(i for i, r in enumerate(is_req) if r)
        parts = []
        for i, member in enumerate(members):
            if i < last_req:
                parts.append(f"{member}{ws},{ws}" if is_req[i]
                             else f"(?:{member}{ws},{ws})?")
            elif i == last_req:
                parts.append(member)
            else:
                parts.append(f"(?:{ws},{ws}{member})?")
        body = "".join(parts)
        return rf"\{{{ws}{body}{ws}\}}"

    # All properties optional: alternate on the LAST present property
    # (outlines' construction) — each earlier one optional with a
    # trailing comma, preserving declaration order.
    alts = []
    for i in range(len(members)):
        prefix = "".join(f"(?:{m}{ws},{ws})?" for m in members[:i])
        alts.append(prefix + members[i])
    return rf"\{{{ws}(?:{'|'.join(alts)})?{ws}\}}"


def _schema_to_regex(schema: dict, ws: str, root: dict = None,
                     depth: int = 0) -> str:
    if root is None:
        root = schema
    if depth > _MAX_REF_DEPTH:
        raise ValueError(
            "JSON schema nests deeper than the guided-decoding regex "
            f"converter supports (depth > {_MAX_REF_DEPTH}; recursive "
            "$ref schemas have no regular form)")
    if not schema:
        return _any_value_regex(ws)
    if "$ref" in schema:
        return _schema_to_regex(_resolve_ref(schema["$ref"], root), ws,
                                root, depth + 1)
    if "enum" in schema:
        return "(?:" + "|".join(
            _re.escape(json.dumps(v)) for v in schema["enum"]) + ")"
    if "const" in schema:
        return _re.escape(json.dumps(schema["const"]))
    for comb in ("anyOf", "oneOf"):
        if comb in schema:
            subs = [_schema_to_regex(s, ws, root, depth + 1)
                    for s in schema[comb]]
            return "(?:" + "|".join(subs) + ")"
    if "allOf" in schema:
        subs = schema["allOf"]
        if len(subs) != 1:
            raise ValueError(
                "allOf with multiple subschemas is not supported "
                "(regex intersection)")
        return _schema_to_regex(subs[0], ws, root, depth + 1)
    stype = schema.get("type")
    if isinstance(stype, list):
        return "(?:" + "|".join(
            _schema_to_regex({**schema, "type": t}, ws, root, depth + 1)
            for t in stype) + ")"
    if stype == "string":
        return _string_regex(schema)
    if stype in _TYPE_REGEX:
        return _TYPE_REGEX[stype]
    if stype == "array":
        return _array_regex(schema, ws, root, depth + 1)
    if stype == "object" or (stype is None and "properties" in schema):
        return _object_regex(schema, ws, root, depth + 1)
    if stype is None:
        return _any_value_regex(ws)
    raise ValueError(f"Unsupported JSON schema type: {stype}")
