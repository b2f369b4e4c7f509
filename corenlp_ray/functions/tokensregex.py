"""TokensRegex sequence language — the general token-regex engine.

Implements the string syntax of the reference's TokenSequencePattern
(ling/tokensregex/TokenSequencePattern.java:140; matcher semantics
pinned by itest/.../TokenSequenceMatcherITest.java):

  atoms        bare word literal (``Archbishop``), ``/regex/`` on the
               word, ``"string"`` case-sensitive literal,
               ``[]`` wildcard, ``[{attr:val}]`` / ``[{attr:/re/}]``
               node patterns with ``&`` / ``|`` inside the brackets and
               ``!`` negation
  groups       ``( ... )`` numbered capture, ``(?$name ... )`` named
               capture, ``(?: ... )`` non-capturing
  quantifiers  ``+ * ? {m,n} {m,} {m}`` on atoms AND groups, each with
               a trailing ``?`` for reluctant matching
  alternation  ``a b | c d`` (lowest precedence)
  backrefs     ``\\1`` — matches the same WORD sequence group 1 matched
  seq anchors  ``^`` start-of-sequence, ``$`` end-of-sequence

``TokensRegex.find_all`` returns non-overlapping left-to-right
``TrMatch`` objects with numbered+named group spans (the reference's
``find()`` loop). ``MultiTokensRegex`` is the MultiPatternMatcher
analogue: highest priority wins overlaps, then leftmost-longest.

Rule actions (TokensRegexAnnotator.java:43; SequenceMatchAction):
``annotate_rules`` applies ``(pattern, {attr: value}, priority)`` rules
to a token stream — the ``==> &annotate( { ner=X } )`` action — and
``extract_rules`` returns per-match extraction results (the VALUE /
result surface of Expressions).

Pure kernels: compile once (per actor), match per sentence — pluggable
into any map_batches stage; see ``TokensRegexStage`` in
stages/misc_annotators for the pipeline wiring.
"""
from __future__ import annotations

import re
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

_ATTRS = ("word", "lower", "lemma", "pos", "ner", "tag", "text",
          "subj", "obj")
# aliases the reference uses: tag == pos, text == word
_ATTR_ALIAS = {"tag": "pos", "text": "word"}
# subj/obj mirror KBPTokensregexExtractor's Subject/Object token
# annotations (ie/KBPTokensregexExtractor.java:47-57,95-107): the KBP
# surface banks mark the candidate pair's tokens, patterns test them

Tok = Dict[str, str]


# ------------------------------------------------------------------ AST ----

class _Node:
    """Base: .match(toks, i, env) yields end positions (backtracking)."""

    def match(self, toks: Sequence[Tok], i: int, env: dict
              ) -> Iterator[int]:
        raise NotImplementedError


class _AttrTest:
    __slots__ = ("attr", "rx", "lit", "neg", "ci")

    def __init__(self, attr: str, rx: Optional[str], lit: Optional[str],
                 neg: bool = False, ci: bool = False):
        self.attr = _ATTR_ALIAS.get(attr, attr)
        if self.attr not in ("word", "lower", "lemma", "pos", "ner",
                             "subj", "obj"):
            raise ValueError(f"unknown attribute {attr!r}")
        flags = re.IGNORECASE if ci else 0
        self.rx = re.compile(rx, flags) if rx is not None else None
        self.lit = lit
        self.neg = neg
        self.ci = ci

    def ok(self, tok: Tok) -> bool:
        v = tok.get(self.attr, "")
        if self.rx is not None:
            hit = self.rx.fullmatch(v) is not None
        elif self.ci:
            hit = v.lower() == (self.lit or "").lower()
        else:
            hit = v == self.lit
        return (not hit) if self.neg else hit


class _TokNode(_Node):
    """One token: conjunction/disjunction tree of attribute tests.
    ``tests`` is a list of OR-alternatives, each a list of ANDed
    _AttrTest (DNF)."""

    __slots__ = ("tests",)

    def __init__(self, tests: List[List[_AttrTest]]):
        self.tests = tests

    def ok(self, tok: Tok) -> bool:
        if not self.tests:
            return True            # [] wildcard
        return any(all(t.ok(tok) for t in conj) for conj in self.tests)

    def match(self, toks, i, env):
        if i < len(toks) and self.ok(toks[i]):
            yield i + 1


class _Seq(_Node):
    __slots__ = ("items",)

    def __init__(self, items: List[_Node]):
        self.items = items

    def match(self, toks, i, env):
        def rec(k: int, pos: int) -> Iterator[int]:
            if k == len(self.items):
                yield pos
                return
            for nxt in self.items[k].match(toks, pos, env):
                yield from rec(k + 1, nxt)
        yield from rec(0, i)


class _Alt(_Node):
    __slots__ = ("alts",)

    def __init__(self, alts: List[_Node]):
        self.alts = alts

    def match(self, toks, i, env):
        for a in self.alts:
            yield from a.match(toks, i, env)


class _Repeat(_Node):
    __slots__ = ("inner", "mn", "mx", "greedy")

    def __init__(self, inner: _Node, mn: int, mx: int, greedy: bool):
        self.inner = inner
        self.mn = mn
        self.mx = mx
        self.greedy = greedy

    def match(self, toks, i, env):
        # collect all reachable positions per repetition count
        def rec(count: int, pos: int) -> Iterator[int]:
            if self.greedy:
                if count < self.mx:
                    for nxt in self.inner.match(toks, pos, env):
                        if nxt > pos or count < self.mn:  # no ∞ on ε
                            yield from rec(count + 1, nxt)
                if count >= self.mn:
                    yield pos
            else:
                if count >= self.mn:
                    yield pos
                if count < self.mx:
                    for nxt in self.inner.match(toks, pos, env):
                        if nxt > pos or count < self.mn:
                            yield from rec(count + 1, nxt)
        yield from rec(0, i)


class _Group(_Node):
    __slots__ = ("inner", "idx", "name")

    def __init__(self, inner: _Node, idx: Optional[int],
                 name: Optional[str]):
        self.inner = inner
        self.idx = idx             # None for (?: ...)
        self.name = name

    def match(self, toks, i, env):
        for nxt in self.inner.match(toks, i, env):
            saved = env.get(self.idx) if self.idx is not None else None
            if self.idx is not None:
                env[self.idx] = (i, nxt)
                if self.name:
                    env[self.name] = (i, nxt)
            yield nxt
            if self.idx is not None:
                if saved is None:
                    env.pop(self.idx, None)
                    if self.name:
                        env.pop(self.name, None)
                else:
                    env[self.idx] = saved
                    if self.name:
                        env[self.name] = saved


class _BackRef(_Node):
    __slots__ = ("idx",)

    def __init__(self, idx: int):
        self.idx = idx

    def match(self, toks, i, env):
        span = env.get(self.idx)
        if span is None:
            return
        b, e = span
        k = e - b
        if i + k <= len(toks) and all(
                toks[i + j].get("word") == toks[b + j].get("word")
                for j in range(k)):
            yield i + k


class _Anchor(_Node):
    __slots__ = ("end",)

    def __init__(self, end: bool):
        self.end = end

    def match(self, toks, i, env):
        if (i == len(toks)) if self.end else (i == 0):
            yield i


# -------------------------------------------------------------- parser ----

class _Parser:
    def __init__(self, src: str, ci: bool = False):
        self.src = src
        self.i = 0
        self.ngroups = 0
        self.ci = ci               # (?i) case-insensitive mode

    def error(self, msg: str):
        raise ValueError(f"{msg} at {self.i} in {self.src!r}")

    def ws(self):
        while self.i < len(self.src) and self.src[self.i].isspace():
            self.i += 1

    def peek(self) -> str:
        return self.src[self.i] if self.i < len(self.src) else ""

    def parse(self) -> _Node:
        # leading (?i) / (?m) flags (multi-token regex (?m) is treated
        # as a word-regex over space-joined tokens — see _MultiTok)
        self.ws()
        node = self.alt()
        self.ws()
        if self.i != len(self.src):
            self.error("unparsed tail")
        return node

    def alt(self) -> _Node:
        alts = [self.seq()]
        self.ws()
        while self.peek() == "|":
            self.i += 1
            alts.append(self.seq())
            self.ws()
        return alts[0] if len(alts) == 1 else _Alt(alts)

    def seq(self) -> _Node:
        items: List[_Node] = []
        while True:
            self.ws()
            c = self.peek()
            if c in ("", ")", "|"):
                break
            items.append(self.quantified())
        if not items:
            self.error("empty sequence")
        return items[0] if len(items) == 1 else _Seq(items)

    def quantified(self) -> _Node:
        atom = self.atom()
        self.ws()
        c = self.peek()
        mn = mx = None
        if c == "+":
            mn, mx = 1, 10 ** 6
            self.i += 1
        elif c == "*":
            mn, mx = 0, 10 ** 6
            self.i += 1
        elif c == "?":
            mn, mx = 0, 1
            self.i += 1
        elif c == "{":
            m = re.match(r"\{(\d+)(?:(,)(\d*))?\}", self.src[self.i:])
            if not m:
                self.error("bad {m,n}")
            lo = int(m.group(1))
            if m.group(2) is None:
                hi = lo
            else:
                hi = int(m.group(3)) if m.group(3) else 10 ** 6
            mn, mx = lo, hi
            self.i += m.end()
        if mn is None:
            return atom
        greedy = True
        if self.peek() == "?":
            greedy = False
            self.i += 1
        return _Repeat(atom, mn, mx, greedy)

    def atom(self) -> _Node:
        self.ws()
        c = self.peek()
        if c == "^":
            self.i += 1
            return _Anchor(end=False)
        if c == "$":
            self.i += 1
            return _Anchor(end=True)
        if c == "(":
            return self.group()
        if c == "[":
            return self.bracket()
        if c == "/":
            return self.regex_tok()
        if c == '"':
            m = re.match(r'"((?:[^"\\]|\\.)*)"', self.src[self.i:])
            if not m:
                self.error("unterminated string")
            self.i += m.end()
            return _TokNode([[_AttrTest("word", None, m.group(1),
                                        ci=self.ci)]])
        if c == "\\":
            m = re.match(r"\\(\d+)", self.src[self.i:])
            if not m:
                self.error("bad backref")
            self.i += m.end()
            return _BackRef(int(m.group(1)))
        # bare literal word (no spaces / metachars)
        m = re.match(r"[^\s()\[\]{}|+*?/\\\"]+", self.src[self.i:])
        if not m:
            self.error("unexpected char")
        self.i += m.end()
        return _TokNode([[_AttrTest("word", None, m.group(0),
                                    ci=self.ci)]])

    def regex_tok(self) -> _Node:
        m = re.match(r"/((?:[^/\\]|\\.)*)/", self.src[self.i:])
        if not m:
            self.error("unterminated /regex/")
        self.i += m.end()
        return _TokNode([[_AttrTest("word", m.group(1), None,
                                    ci=self.ci)]])

    def group(self) -> _Node:
        assert self.peek() == "("
        self.i += 1
        name = None
        capture = True
        if self.src[self.i:self.i + 2] == "?$":
            m = re.match(r"\?\$(\w+)", self.src[self.i:])
            if not m:
                self.error("bad named group")
            name = m.group(1)
            self.i += m.end()
        elif self.src[self.i:self.i + 2] == "?:":
            capture = False
            self.i += 2
        idx = None
        if capture:
            self.ngroups += 1
            idx = self.ngroups
        inner = self.alt()
        self.ws()
        if self.peek() != ")":
            self.error("expected )")
        self.i += 1
        return _Group(inner, idx, name)

    def bracket(self) -> _Node:
        """[ ... ] node: empty = wildcard; else a boolean combination of
        { attr:val } node patterns with & | and ! (DNF-flattened)."""
        assert self.peek() == "["
        self.i += 1
        self.ws()
        if self.peek() == "]":
            self.i += 1
            return _TokNode([])
        ors: List[List[_AttrTest]] = [[]]
        while True:
            self.ws()
            neg = False
            if self.peek() == "!":
                neg = True
                self.i += 1
                self.ws()
            if self.peek() == "{":
                ors[-1].extend(self.braces(neg))
            elif self.peek() == "/":
                m = re.match(r"/((?:[^/\\]|\\.)*)/", self.src[self.i:])
                if not m:
                    self.error("unterminated /regex/ in []")
                self.i += m.end()
                ors[-1].append(_AttrTest("word", m.group(1), None, neg,
                                         ci=self.ci))
            elif self.peek() == '"':
                m = re.match(r'"((?:[^"\\]|\\.)*)"', self.src[self.i:])
                if not m:
                    self.error("unterminated string in []")
                self.i += m.end()
                ors[-1].append(_AttrTest("word", None, m.group(1), neg,
                                         ci=self.ci))
            else:
                # bare attr:val inside [] (legacy TokenPattern syntax)
                m = re.match(r"(\w+)\s*:\s*(?:/((?:[^/\\]|\\.)*)/"
                             r"|([^\]\s&|]+))", self.src[self.i:])
                if not m:
                    self.error("bad [] constraint")
                self.i += m.end()
                ors[-1].append(_AttrTest(m.group(1), m.group(2),
                                         m.group(3), neg, ci=self.ci))
            self.ws()
            if self.peek() == "&":
                self.i += 1
                continue
            if self.peek() == "|":
                self.i += 1
                ors.append([])
                continue
            break
        self.ws()
        if self.peek() != "]":
            self.error("expected ]")
        self.i += 1
        return _TokNode(ors)

    def braces(self, neg: bool) -> List[_AttrTest]:
        """{ attr:val ; attr2:val2 } → ANDed tests (reference node
        pattern syntax; ';' or ',' separate conjuncts)."""
        assert self.peek() == "{"
        self.i += 1
        tests = []
        while True:
            self.ws()
            m = re.match(r"(\w+)\s*:\s*(?:/((?:[^/\\]|\\.)*)/"
                         r"|\"((?:[^\"\\]|\\.)*)\"|([^}\s;,]+))",
                         self.src[self.i:])
            if not m:
                self.error("bad {} constraint")
            self.i += m.end()
            lit = m.group(3) if m.group(3) is not None else m.group(4)
            tests.append(_AttrTest(m.group(1), m.group(2), lit, neg,
                                   ci=self.ci))
            self.ws()
            if self.peek() in (";", ","):
                self.i += 1
                continue
            break
        if self.peek() != "}":
            self.error("expected }")
        self.i += 1
        return tests


# ------------------------------------------------------------- matching ----

class TrMatch:
    """One match: [begin, end) token span + numbered/named groups."""

    __slots__ = ("begin", "end", "groups", "toks")

    def __init__(self, begin: int, end: int, groups: dict, toks):
        self.begin = begin
        self.end = end
        self.groups = groups       # {1: (b,e), "name": (b,e), ...}
        self.toks = toks

    def span(self, key=0) -> Optional[Tuple[int, int]]:
        if key == 0:
            return (self.begin, self.end)
        return self.groups.get(key)

    def group(self, key=0) -> Optional[str]:
        s = self.span(key)
        if s is None:
            return None
        return " ".join(t["word"] for t in self.toks[s[0]:s[1]])


class TokensRegex:
    """Compiled pattern. ``find_all`` = the reference's find() loop:
    non-overlapping, left-to-right, greedy-per-position."""

    def __init__(self, pattern: str, priority: float = 0.0):
        self.src = pattern
        self.priority = priority
        src = pattern.strip()
        ci = False
        # leading (?i) global flag
        if src.startswith("(?i)"):
            ci = True
            src = src[4:]
        p = _Parser(src, ci=ci)
        self.root = p.parse()
        self.ngroups = p.ngroups

    @classmethod
    def compile(cls, pattern: str, priority: float = 0.0) -> "TokensRegex":
        return cls(pattern, priority)

    def match_at(self, toks: Sequence[Tok], i: int) -> Optional[TrMatch]:
        env: dict = {}
        for end in self.root.match(toks, i, env):
            return TrMatch(i, end, dict(env), toks)
        return None

    def matches(self, toks: Sequence[Tok]) -> Optional[TrMatch]:
        """Whole-sequence match (the reference's matches())."""
        env: dict = {}
        for end in self.root.match(toks, 0, env):
            if end == len(toks):
                return TrMatch(0, end, dict(env), toks)
        return None

    def find_all(self, toks: Sequence[Tok]) -> List[TrMatch]:
        out = []
        i = 0
        n = len(toks)
        while i < n:
            m = self.match_at(toks, i)
            if m is not None and m.end > i:
                out.append(m)
                i = m.end
            else:
                i += 1
        return out


class MultiTokensRegex:
    """MultiPatternMatcher (ling/tokensregex/MultiPatternMatcher.java):
    all patterns' matches, overlaps resolved by priority then
    leftmost-longest."""

    def __init__(self, patterns: Sequence[TokensRegex]):
        self.patterns = list(patterns)

    def find_non_overlapping(self, toks: Sequence[Tok]
                             ) -> List[Tuple[TrMatch, TokensRegex]]:
        cands: List[Tuple[TrMatch, TokensRegex]] = []
        for p in self.patterns:
            for m in p.find_all(toks):
                cands.append((m, p))
        # priority desc, begin asc, length desc
        cands.sort(key=lambda mp: (-mp[1].priority, mp[0].begin,
                                   -(mp[0].end - mp[0].begin)))
        taken = [False] * len(toks)
        out = []
        for m, p in cands:
            if any(taken[k] for k in range(m.begin, m.end)):
                continue
            for k in range(m.begin, m.end):
                taken[k] = True
            out.append((m, p))
        out.sort(key=lambda mp: mp[0].begin)
        return out


# --------------------------------------------------------------- actions ----

def annotate_rules(toks: List[Tok],
                   rules: Sequence[Tuple[TokensRegex, Dict[str, str]]]
                   ) -> List[Tok]:
    """Apply ``==> &annotate({attr=value})`` actions: for each rule in
    priority order (MultiPatternMatcher overlap semantics), set the
    given attributes on every token of every match. Returns NEW token
    dicts (input untouched)."""
    out = [dict(t) for t in toks]
    multi = MultiTokensRegex([p for p, _ in rules])
    actions = {id(p): a for p, a in rules}
    for m, p in multi.find_non_overlapping(out):
        for k in range(m.begin, m.end):
            out[k].update(actions[id(p)])
    return out


def extract_rules(toks: Sequence[Tok],
                  rules: Sequence[Tuple[TokensRegex, str]]
                  ) -> List[Tuple[str, str, int, int]]:
    """Extraction surface: each rule is (pattern, result_template);
    the template may reference $0 / $1 / $name group text. Returns
    (rule_result, matched_text, begin, end) per match."""
    out = []
    for p, tmpl in rules:
        for m in p.find_all(toks):
            def sub(mt):
                key = mt.group(1)
                k = int(key) if key.isdigit() else key
                return m.group(k) or ""
            res = re.sub(r"\$(\w+)", sub, tmpl)
            out.append((res, m.group(0), m.begin, m.end))
    return out
