"""Per-token string kernels (SURVEY §2.5): word shapes, Americanize,
lowercase — the process/ string-function library analogues.

Word shape follows the reference's "chris2" style at reduced scope
(/root/reference/src/edu/stanford/nlp/process/WordShapeClassifier.java):
character classes X/x/d/punct, runs collapsed, head/tail preserved —
the feature CRF-style NER models key on. ``Americanize`` maps common
British spellings (process/Americanize.java).
"""
from __future__ import annotations

import re
from typing import List

import pyarrow as pa


def word_shape(w: str, max_len: int = 4) -> str:
    """Collapse a token to its shape: Xx, xxx, dd, Xx-Xx …
    Runs longer than max_len collapse with their distinct classes kept
    (the chris2 collapsing idea)."""
    classes = []
    for ch in w:
        if ch.isupper():
            classes.append("X")
        elif ch.islower():
            classes.append("x")
        elif ch.isdigit():
            classes.append("d")
        else:
            classes.append(ch)
    if len(classes) <= max_len:
        return "".join(classes)
    head = classes[:2]
    tail = classes[-2:]
    mid = sorted(set(classes[2:-2]))
    return "".join(head) + "".join(mid) + "".join(tail)


_BRITISH = {
    "colour": "color", "colours": "colors", "flavour": "flavor",
    "behaviour": "behavior", "behaviours": "behaviors",
    "honour": "honor", "labour": "labor", "neighbour": "neighbor",
    "neighbours": "neighbors", "organise": "organize",
    "organised": "organized", "organisation": "organization",
    "organisations": "organizations", "realise": "realize",
    "realised": "realized", "recognise": "recognize", "centre": "center",
    "centres": "centers", "theatre": "theater", "metre": "meter",
    "litre": "liter", "defence": "defense", "offence": "offense",
    "licence": "license", "practise": "practice", "analyse": "analyze",
    "analysed": "analyzed", "catalogue": "catalog", "dialogue": "dialog",
    "travelling": "traveling", "travelled": "traveled",
    "cancelled": "canceled", "programme": "program",
    "programmes": "programs", "grey": "gray",
}
_OUR_RE = re.compile(r"(.{3,})our(s?)$")
# -our words that are NOT Briticisms (Americanize.java exception list)
_OUR_KEEP = {"four", "your", "hour", "tour", "pour", "sour", "devour",
             "glamour", "detour", "contour", "velour", "amour",
             "troubadour", "paramour", "dour", "flour", "scour"}
_AE_RE = re.compile(r"(.*?)(h?)ae(m|dia|sthe|ology|on)(.*)$")
_ISE_RE = re.compile(r"(.{3,})is(e[sd]?|ing|ation)$")


def americanize(w: str) -> str:
    """British → American spelling (dictionary + -our/-ise rules)."""
    lw = w.lower()
    hit = _BRITISH.get(lw)
    if hit is None:
        m = _OUR_RE.match(lw)
        if m and lw not in _OUR_KEEP:
            hit = m.group(1) + "or" + m.group(2)
        else:
            m = _ISE_RE.match(lw)
            if m:
                hit = m.group(1) + "iz" + m.group(2)
            else:
                # ae→e ligature reductions (encyclopaedia, haematophilia)
                m = _AE_RE.match(lw)
                if m:
                    hit = m.group(1) + m.group(2) + "e" + m.group(3)                         + m.group(4)
    if hit is None:
        return w
    if w.isupper():
        return hit.upper()
    if w[:1].isupper():
        return hit.capitalize()
    return hit


def shape_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: + tok_shape (requires tok_word)."""
    out: List[List[str]] = []
    for words in batch.column("tok_word").to_pylist():
        out.append([word_shape(w) for w in words])
    return batch.append_column("tok_shape",
                               pa.array(out, type=pa.list_(pa.string())))


# ------------------------------------------------------- acronym matcher ----

_ACRO_STOP = {"of", "the", "for", "and", "a", "an", "&"}
_ACRO_STRIP = {"corp.", "corp", "inc.", "inc", "ltd.", "ltd", "co.", "co",
               "llc", "llp", "plc"}


def is_acronym(short: str, long_tokens) -> bool:
    """The AcronymMatcher.isAcronym contract
    (/root/reference/src/edu/stanford/nlp/util/AcronymMatcher.java:17;
    goldens test/util/AcronymMatcherTest.java): the short form equals the
    initials of the long form after dropping function words and
    corporate suffixes."""
    toks = [t for t in long_tokens
            if t and t.lower() not in _ACRO_STOP
            and t.lower() not in _ACRO_STRIP and t[:1].isalpha()]
    if not toks or not short or not short.isalpha():
        return False
    return short.upper() == "".join(t[0].upper() for t in toks)


def acronym_of(long_tokens) -> str:
    """Initials of a long form under the same filtering as is_acronym
    (empty string when fewer than 2 content tokens)."""
    toks = [t for t in long_tokens
            if t and t.lower() not in _ACRO_STOP
            and t.lower() not in _ACRO_STRIP and t[:1].isalpha()]
    if len(toks) < 2:
        return ""
    return "".join(t[0].upper() for t in toks)


# ------------------------------------------------------ chris2 shapes ----

_GREEK = ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta",
          "iota", "kappa", "lambda", "omicron", "rho", "sigma", "tau",
          "upsilon", "omega")
_BOUNDARY = 2


def word_shape_chris2(s: str, known_lc=None) -> str:
    """The reference's WORDSHAPECHRIS2 word shape
    (process/WordShapeClassifier.java:361-506): digits→d, lower→x,
    upper/title→X, spelled Greek letters→g (consumed as a unit), other
    chars kept; words longer than 2×BOUNDARY keep their first/last two
    classes verbatim with the middle collapsed to the sorted set of
    classes; all-letter words in ``known_lc`` get a 'k' suffix. Pinned
    by the reference's own WordShapeClassifierTest arrays
    (tests/test_wordshape_reference.py)."""
    n = len(s)
    begin, end, seen = [], [], set()
    short = n <= _BOUNDARY * 2
    out_short = []
    non_letters = False
    i = 0
    while i < n:
        c = s[i]
        if c.isdigit():
            m = "d"
        elif c.islower():
            m = "x"
        elif c.isupper() or c.istitle():
            m = "X"
        else:
            m = c
        incr = 0
        for gr in _GREEK:
            if s.startswith(gr, i):
                m = "g"
                incr = len(gr) - 1
                break
        if m not in ("x", "X"):
            non_letters = True
        if short:
            out_short.append(m)
        elif i < _BOUNDARY:
            begin.append(m)
        elif i < n - _BOUNDARY:
            seen.add(m)
        else:
            end.append(m)
        i += incr + 1
    if short:
        shape = "".join(out_short)
    else:
        shape = "".join(begin) + "".join(sorted(seen)) + "".join(end)
    if known_lc is not None and not non_letters \
            and s.lower() in known_lc:
        shape += "k"
    return shape


def word_shape_digits(s: str) -> str:
    """WORDSHAPEDIGITS: every digit becomes 9, all else verbatim."""
    return "".join("9" if c.isdigit() else c for c in s)
