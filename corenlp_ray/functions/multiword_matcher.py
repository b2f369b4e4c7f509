"""Multi-word surface-form matching — the MultiWordStringMatcher
analogue (src/edu/stanford/nlp/ling/tokensregex/
MultiWordStringMatcher.java:195-320): find character offsets of an
entity surface form inside free text, tolerating whitespace and
punctuation drift. Behavior pinned by the reference's own
MultiWordStringMatcherTest (tests/test_multiword_matcher.py).

Match types:
  EXCTWS — exact, case-sensitive, but whitespace runs collapse and any
           amount of space may surround punctuation;
  LWS    — EXCTWS, case-insensitive;
  LNRM   — lowercase-normalized: punctuation/whitespace between
           alphanumeric chunks is ignored entirely;
  EXCT   — literal substring.
Matches must not touch an adjacent letter/digit (word boundary rule,
findOffsets:300-313).
"""
from __future__ import annotations

import re
from typing import List, Optional, Tuple

# Java \p{Punct}: the ASCII punctuation block
_PUNCT_CLASS = r"!-/:-@\[-`{-~"
_WS_RE = re.compile(r"\s+")
_PUNCT_WS_RE = re.compile(r"\s*([" + _PUNCT_CLASS + r"])\s*")
_LNRM_DELIM_RE = re.compile(r"(?:[" + _PUNCT_CLASS + r"]|\s)+")
_LNRM_ANY = r"(?:[" + _PUNCT_CLASS + r"]|\s)*"


def exctws_regex(target: str) -> str:
    """EXCTWS pattern text (getExctWsRegex): ≥1 space where the target
    has space, any space around punctuation."""
    sb: List[str] = []
    for field in _WS_RE.split(target):
        if not field:
            continue
        if sb:
            sb.append(r"\s+")
        spaced = _PUNCT_WS_RE.sub(r" \1 ", field).strip()
        for chunk in _WS_RE.split(spaced):
            if not chunk:
                continue
            if sb:
                sb.append(r"\s*")
            sb.append(re.escape(chunk))
    return "".join(sb)


def lnrm_regex(target: str) -> str:
    """LNRM pattern text (getLnrmRegex): alnum chunks with any
    punctuation/whitespace between them, case-insensitive."""
    fields = [f for f in _LNRM_DELIM_RE.split(target) if f]
    return _LNRM_ANY.join(re.escape(f) for f in fields)


def _find(pattern: re.Pattern, text: str) -> List[Tuple[int, int]]:
    out = []
    for m in pattern.finditer(text):
        b, e = m.start(), m.end()
        if b > 0 and text[b - 1].isalnum():
            continue
        if e < len(text) and text[e].isalnum():
            continue
        out.append((b, e))
    return out


def find_target_offsets(text: str, target: str,
                        match_type: str = "EXCTWS"
                        ) -> List[Tuple[int, int]]:
    """All (begin, end) char offsets of ``target`` in ``text`` under the
    given match type."""
    if match_type == "EXCT":
        pat = re.compile(re.escape(target))
    elif match_type == "EXCTWS":
        pat = re.compile(exctws_regex(target))
    elif match_type == "LWS":
        pat = re.compile(exctws_regex(target), re.I | re.U)
    elif match_type == "LNRM":
        pat = re.compile(lnrm_regex(target), re.I | re.U)
    else:
        raise ValueError(f"unknown match type {match_type!r}")
    return _find(pat, text)
