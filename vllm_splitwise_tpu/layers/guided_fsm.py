"""Regex -> DFA compiler for guided decoding.

Role parity with the reference's outlines index
(vllm/model_executor/guided_logits_processors.py builds outlines DFAs):
neither outlines nor interegular ships in the TPU image, so this is a
self-contained compiler for the regex subset guided decoding actually
uses (the JSON-schema regexes in guided_logits_processors.py plus
typical user patterns):

  literals, escapes (\\d \\w \\s + complements, \\uXXXX, \\xXX, control
  escapes, escaped punctuation), character classes with ranges and
  negation, ``.``, groups ``( )`` / ``(?: )``, alternation ``|``, and
  quantifiers ``* + ? {m} {m,} {m,n}`` (lazy variants accepted — the
  matched LANGUAGE is identical, and a DFA recognizes languages).

Pipeline: recursive-descent parse -> Thompson NFA over character-range
edges -> subset-construction DFA over a compressed interval alphabet ->
dead-state pruning (every surviving state can still reach an accept).
``DFA.step`` is then two dict/bisect lookups per character, replacing
the O(vocab) partial regex matches of the fallback path.

Unsupported constructs (backreferences, lookaround, inline flags) raise
:class:`UnsupportedPatternError`; callers fall back to the
partial-match processor.
"""
from __future__ import annotations

from bisect import bisect_right
from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

MAX_CODEPOINT = 0x10FFFF
# Guard against pathological {m,n} blowup.
_MAX_NFA_STATES = 20_000

Ranges = Tuple[Tuple[int, int], ...]  # sorted, disjoint, inclusive


class UnsupportedPatternError(ValueError):
    """The pattern uses syntax outside the compiled-DFA subset."""


# ---------------------------------------------------------------------------
# Character ranges
# ---------------------------------------------------------------------------

def _norm(ranges: Sequence[Tuple[int, int]]) -> Ranges:
    """Sort + merge overlapping/adjacent inclusive ranges."""
    out: List[Tuple[int, int]] = []
    for lo, hi in sorted(r for r in ranges if r[0] <= r[1]):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


def _complement(ranges: Ranges) -> Ranges:
    out: List[Tuple[int, int]] = []
    cursor = 0
    for lo, hi in ranges:
        if cursor < lo:
            out.append((cursor, lo - 1))
        cursor = hi + 1
    if cursor <= MAX_CODEPOINT:
        out.append((cursor, MAX_CODEPOINT))
    return tuple(out)


_DIGIT: Ranges = ((48, 57), )
_WORD: Ranges = _norm([(48, 57), (65, 90), (97, 122), (95, 95)])
_SPACE: Ranges = _norm([(9, 13), (32, 32)])
_ANY: Ranges = ((0, MAX_CODEPOINT), )  # '.' matches newlines too here

_CONTROL = {"n": 10, "t": 9, "r": 13, "f": 12, "v": 11, "0": 0, "a": 7,
            "b": 8}


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------

@dataclass
class _Lit:
    ranges: Ranges


@dataclass
class _Concat:
    parts: List


@dataclass
class _Alt:
    options: List


@dataclass
class _Repeat:
    node: object
    lo: int
    hi: Optional[int]  # None = unbounded


class _Parser:

    def __init__(self, pattern: str) -> None:
        self.p = pattern
        self.i = 0

    def peek(self) -> str:
        return self.p[self.i] if self.i < len(self.p) else ""

    def take(self) -> str:
        ch = self.peek()
        self.i += 1
        return ch

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise UnsupportedPatternError(
                f"trailing input at {self.i}: {self.p[self.i:]!r}")
        return node

    def _alt(self):
        options = [self._concat()]
        while self.peek() == "|":
            self.take()
            options.append(self._concat())
        return options[0] if len(options) == 1 else _Alt(options)

    def _concat(self):
        parts = []
        while self.peek() not in ("", "|", ")"):
            parts.append(self._repeat())
        if not parts:
            return _Concat([])
        return parts[0] if len(parts) == 1 else _Concat(parts)

    def _repeat(self):
        node = self._atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.take()
                node = _Repeat(node, 0, None)
            elif ch == "+":
                self.take()
                node = _Repeat(node, 1, None)
            elif ch == "?":
                self.take()
                node = _Repeat(node, 0, 1)
            elif ch == "{":
                bounds = self._brace()
                if bounds is None:
                    break  # literal '{'
                node = _Repeat(node, *bounds)
            else:
                break
            if self.peek() == "?":  # lazy: same language
                self.take()
        return node

    def _brace(self) -> Optional[Tuple[int, Optional[int]]]:
        start = self.i
        self.take()  # '{'
        body = ""
        while self.peek() not in ("", "}"):
            body += self.take()
        if self.peek() != "}" or not body or \
                not body.replace(",", "").isdigit():
            self.i = start  # not a quantifier: literal brace
            return None
        self.take()
        if "," not in body:
            n = int(body)
            return n, n
        lo_s, hi_s = body.split(",", 1)
        lo = int(lo_s) if lo_s else 0
        hi = int(hi_s) if hi_s else None
        return lo, hi

    def _atom(self):
        ch = self.take()
        if ch == "(":
            if self.peek() == "?":
                self.take()
                mod = self.take()
                if mod != ":":
                    raise UnsupportedPatternError(
                        f"(?{mod}...) groups are not supported")
            node = self._alt()
            if self.take() != ")":
                raise UnsupportedPatternError("unbalanced group")
            return node
        if ch == "[":
            return _Lit(self._char_class())
        if ch == ".":
            return _Lit(_ANY)
        if ch == "\\":
            return _Lit(self._escape())
        if ch in ("^", "$"):
            # Anchors are no-ops: guided decoding always full-matches.
            return _Concat([])
        if ch in ("*", "+", "?"):
            raise UnsupportedPatternError(f"dangling quantifier {ch!r}")
        return _Lit(((ord(ch), ord(ch)), ))

    def _escape(self) -> Ranges:
        ch = self.take()
        if not ch:
            raise UnsupportedPatternError("trailing backslash")
        if ch == "d":
            return _DIGIT
        if ch == "D":
            return _complement(_DIGIT)
        if ch == "w":
            return _WORD
        if ch == "W":
            return _complement(_WORD)
        if ch == "s":
            return _SPACE
        if ch == "S":
            return _complement(_SPACE)
        if ch in _CONTROL:
            cp = _CONTROL[ch]
            return ((cp, cp), )
        if ch in ("u", "x"):
            n = 4 if ch == "u" else 2
            hexs = "".join(self.take() for _ in range(n))
            try:
                cp = int(hexs, 16)
            except ValueError:
                raise UnsupportedPatternError(f"bad \\{ch} escape") from None
            return ((cp, cp), )
        if ch.isalnum():
            raise UnsupportedPatternError(f"unsupported escape \\{ch}")
        return ((ord(ch), ord(ch)), )  # escaped punctuation

    def _char_class(self) -> Ranges:
        negated = False
        if self.peek() == "^":
            self.take()
            negated = True
        items: List[Tuple[int, int]] = []
        first = True
        while True:
            ch = self.peek()
            if ch == "":
                raise UnsupportedPatternError("unterminated class")
            if ch == "]" and not first:
                self.take()
                break
            first = False
            if ch == "\\":
                self.take()
                sub = self._escape()
                if len(sub) == 1 and sub[0][0] == sub[0][1]:
                    lo = sub[0][0]
                else:
                    items.extend(sub)  # \d etc. inside a class
                    continue
            else:
                lo = ord(self.take())
            if self.peek() == "-" and self.i + 1 < len(self.p) and \
                    self.p[self.i + 1] != "]":
                self.take()
                nxt = self.take()
                if nxt == "\\":
                    sub = self._escape()
                    if len(sub) != 1 or sub[0][0] != sub[0][1]:
                        raise UnsupportedPatternError(
                            "class range with multi-char escape")
                    hi = sub[0][0]
                else:
                    hi = ord(nxt)
                items.append((lo, hi))
            else:
                items.append((lo, lo))
        ranges = _norm(items)
        return _complement(ranges) if negated else ranges


# ---------------------------------------------------------------------------
# Thompson NFA
# ---------------------------------------------------------------------------

@dataclass
class _NFA:
    eps: List[List[int]] = field(default_factory=list)
    edges: List[List[Tuple[Ranges, int]]] = field(default_factory=list)

    def new_state(self) -> int:
        if len(self.eps) >= _MAX_NFA_STATES:
            raise UnsupportedPatternError("pattern too large to compile")
        self.eps.append([])
        self.edges.append([])
        return len(self.eps) - 1

    def build(self, node, start: int) -> int:
        """Wire `node` beginning at `start`; returns its end state."""
        if isinstance(node, _Lit):
            end = self.new_state()
            self.edges[start].append((node.ranges, end))
            return end
        if isinstance(node, _Concat):
            cur = start
            for part in node.parts:
                cur = self.build(part, cur)
            return cur
        if isinstance(node, _Alt):
            end = self.new_state()
            for option in node.options:
                head = self.new_state()
                self.eps[start].append(head)
                self.eps[self.build(option, head)].append(end)
            return end
        if isinstance(node, _Repeat):
            cur = start
            for _ in range(node.lo):
                cur = self.build(node.node, cur)
            if node.hi is None:
                # Kleene tail: loop through one more copy.
                loop_in = self.new_state()
                self.eps[cur].append(loop_in)
                loop_out = self.build(node.node, loop_in)
                self.eps[loop_out].append(loop_in)
                end = self.new_state()
                self.eps[cur].append(end)
                self.eps[loop_out].append(end)
                return end
            for _ in range(node.hi - node.lo):
                # Optional copy: skip edge past it.
                nxt = self.build(node.node, cur)
                self.eps[cur].append(nxt)
                cur = nxt
            return cur
        raise AssertionError(f"unknown node {node!r}")


# ---------------------------------------------------------------------------
# DFA
# ---------------------------------------------------------------------------

class DFA:
    """Deterministic automaton over a compressed interval alphabet.

    States are ints; state 0 is the start.  ``step`` returns None from a
    dead configuration (no completion of the pattern is reachable).
    """

    __slots__ = ("boundaries", "trans", "accepting", "num_states")

    def __init__(self, boundaries: List[int],
                 trans: List[Dict[int, int]],
                 accepting: FrozenSet[int]) -> None:
        self.boundaries = boundaries
        self.trans = trans
        self.accepting = accepting
        self.num_states = len(trans)

    def step(self, state: Optional[int], ch: str) -> Optional[int]:
        if state is None:
            return None
        sym = bisect_right(self.boundaries, ord(ch)) - 1
        return self.trans[state].get(sym)

    def walk(self, state: Optional[int], text: str) -> Optional[int]:
        for ch in text:
            state = self.step(state, ch)
            if state is None:
                return None
        return state

    def is_accepting(self, state: Optional[int]) -> bool:
        return state in self.accepting


def compile_regex_dfa(pattern: str) -> DFA:
    """Compile ``pattern`` (see module docstring for the subset) into a
    dead-state-pruned DFA."""
    ast = _Parser(pattern).parse()
    nfa = _NFA()
    start = nfa.new_state()
    accept = nfa.build(ast, start)

    # Interval alphabet: split at every range boundary used anywhere.
    points = {0}
    for state_edges in nfa.edges:
        for ranges, _ in state_edges:
            for lo, hi in ranges:
                points.add(lo)
                if hi + 1 <= MAX_CODEPOINT:
                    points.add(hi + 1)
    boundaries = sorted(points)

    def closure(states: FrozenSet[int]) -> FrozenSet[int]:
        stack, seen = list(states), set(states)
        while stack:
            s = stack.pop()
            for t in nfa.eps[s]:
                if t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    def covers(ranges: Ranges, lo: int) -> bool:
        for a, b in ranges:
            if a <= lo <= b:
                return True
        return False

    start_set = closure(frozenset([start]))
    index: Dict[FrozenSet[int], int] = {start_set: 0}
    order = [start_set]
    trans: List[Dict[int, int]] = [{}]
    queue = [start_set]
    while queue:
        cur = queue.pop()
        cur_id = index[cur]
        # For each alphabet interval, the NFA successor set.
        for sym, lo in enumerate(boundaries):
            nxt = set()
            for s in cur:
                for ranges, dst in nfa.edges[s]:
                    if covers(ranges, lo):
                        nxt.add(dst)
            if not nxt:
                continue
            nxt_set = closure(frozenset(nxt))
            if nxt_set not in index:
                index[nxt_set] = len(order)
                order.append(nxt_set)
                trans.append({})
                queue.append(nxt_set)
            trans[cur_id][sym] = index[nxt_set]

    accepting = frozenset(
        i for i, st in enumerate(order) if accept in st)

    # Dead-state pruning: keep only states that can reach an accept.
    n = len(order)
    reverse: List[List[int]] = [[] for _ in range(n)]
    for i, row in enumerate(trans):
        for dst in row.values():
            reverse[dst].append(i)
    live = set(accepting)
    stack = list(accepting)
    while stack:
        s = stack.pop()
        for p in reverse[s]:
            if p not in live:
                live.add(p)
                stack.append(p)
    if 0 not in live:
        raise UnsupportedPatternError("pattern matches nothing")
    pruned = [
        {sym: dst for sym, dst in row.items() if dst in live}
        if i in live else {} for i, row in enumerate(trans)
    ]
    return DFA(boundaries, pruned, accepting)
