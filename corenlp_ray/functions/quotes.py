"""Character-level quote extraction — the QuoteAnnotator analogue
(src/edu/stanford/nlp/pipeline/QuoteAnnotator.java:479-649
recursiveQuotes; directed-quote table :110-122; boundary predicates
:671-706). Re-expressed from the published control flow; behavior pinned
by the reference's own QuoteAnnotatorITest cases
(tests/test_quotes_reference.py).

Semantics: ascii " and ' (' only when ``single_quotes``), latex ``''
and `', and directed unicode pairs nest recursively; same-kind directed
nesting only when ``allow_embedded_same``; ' and ` require a
whitespace/punct boundary; unmatched openers optionally surface as
unclosed quotes; ``max_length`` abandons over-long candidates;
``ascii_quotes`` folds smart quotes to ascii before scanning.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

DIRECTED_QUOTES = {
    "“": "”", "‘": "’", "«": "»", "‹": "›",
    "「": "」", "『": "』", "„": "”", "‚": "’", "``": "''",
}

def _is_ws_or_punct(c: str) -> bool:
    return bool(c) and (c.isspace() or not c.isalnum())


def _single_start(text: str, i: int) -> bool:
    return i == 0 or _is_ws_or_punct(text[i - 1])


def _single_end(text: str, i: int) -> bool:
    return i == len(text) - 1 or _is_ws_or_punct(text[i + 1])


def _double_end(text: str, i: int) -> bool:
    if i == len(text) - 1:
        return True
    nxt = text[i + 1]
    if i == len(text) - 2:
        return _is_ws_or_punct(nxt)
    nxt2 = text[i + 2]
    return (_is_ws_or_punct(nxt) and nxt != "'") or \
        (nxt == "'" and _is_ws_or_punct(nxt2))


def ascii_fold_quotes(text: str) -> str:
    """Smart → ascii quote folding (LexerUtils.asciiQuotes subset)."""
    return (text.replace("“", '"').replace("”", '"').replace("„", '"')
            .replace("‘", "'").replace("’", "'").replace("‚", "'")
            .replace("«", '"').replace("»", '"'))


def _recursive_quotes(text: str, offset: int, prev_quote: Optional[str],
                      single_quotes: bool, max_length: int,
                      allow_embedded_same: bool, extract_unclosed: bool
                      ) -> Tuple[List[Tuple[int, int]],
                                 List[Tuple[int, int]]]:
    quotes_map: dict = {}
    start = -1
    end = -1
    quote: Optional[str] = None
    directed = 0
    n = len(text)
    i = 0
    while i < n:
        c = text[i]
        if c == "`" and i < n - 1 and text[i + 1] == "`":
            c = "``"
        elif c == "'" and quote in ("``", "`"):
            # only the final run of ' of the proper length closes latex
            curr = i
            while curr < n and text[curr] == "'":
                curr += 1
            qlen = len(quote)
            if i == curr - qlen or (directed > 0
                                    and i == curr - directed * qlen):
                c = text[i:i + qlen]
            else:
                i += 1
                continue

        if quote in DIRECTED_QUOTES and DIRECTED_QUOTES[quote] == c:
            if c == "’":
                if i == n - 1 or _single_end(text, i):
                    directed -= 1
            else:
                directed -= 1

        if start < 0 and (prev_quote is None or c != prev_quote) and (
                (((c == "'" and single_quotes) or c == "`")
                 and _single_start(text, i))
                or c == '"' or c in DIRECTED_QUOTES):
            start = i
            quote = c
        elif start >= 0 and end < 0 and (
                (c == quote
                 and ((c in ("'", "`") and _single_end(text, i))
                      or (c == '"' and _double_end(text, i))))
                or (c == "'" and quote == "`" and _single_end(text, i))
                or (quote in DIRECTED_QUOTES
                    and DIRECTED_QUOTES[quote] == c and directed == 0)):
            end = i + len(c)

        if c in DIRECTED_QUOTES and c == quote:
            directed += 1

        if start >= 0 and end > 0:
            quotes_map.setdefault(quote, []).append((start, end))
            start = -1
            end = -1
            quote = None

        if len(c) > 1:
            i += len(c) - 1

        if max_length > 0 and start >= 0 and i - start > max_length:
            i = start + len(quote)
            start = -1
            end = -1
            quote = None
        i += 1

    quotes: List[Tuple[int, int]] = []
    unclosed: List[Tuple[int, int]] = []

    def is_map_starter(target: int) -> bool:
        return any(p[0] == target for ps in quotes_map.values()
                   for p in ps)

    # unterminated opener: optionally record, then retry past it
    if not is_map_starter(start) and 0 <= start < n - 3:
        if extract_unclosed:
            unclosed.append((start + offset, n + offset))
        to_pass = text[start + len(quote):]
        emb_q, emb_u = _recursive_quotes(
            to_pass, offset, None, single_quotes, max_length,
            allow_embedded_same, extract_unclosed)
        shift = start + len(quote)
        quotes.extend((a + shift, b + shift) for a, b in emb_q)
        if extract_unclosed:
            unclosed.extend((a + shift, b + shift) for a, b in emb_u)

    for kind, pairs in quotes_map.items():
        for (qs, qe) in pairs:
            if qe - qs >= len(kind) * 2:
                inner = text[qs + len(kind): qe - len(kind)]
                kind_to_pass = None
                if not (kind in DIRECTED_QUOTES or kind == "`") \
                        or not allow_embedded_same:
                    kind_to_pass = kind
                emb_q, emb_u = _recursive_quotes(
                    inner, qs + len(kind) + offset, kind_to_pass,
                    single_quotes, max_length, allow_embedded_same,
                    extract_unclosed)
                for (a, b) in emb_q:
                    if b - a > 2:
                        quotes.append((a, b))
                if extract_unclosed:
                    unclosed.extend(emb_u)
            quotes.append((qs + offset, qe + offset))
    return quotes, unclosed


def extract_quotes(text: str, single_quotes: bool = False,
                   max_length: int = 0, ascii_quotes: bool = False,
                   allow_embedded_same: bool = False,
                   extract_unclosed: bool = False
                   ) -> Tuple[List[Tuple[int, int]],
                              List[Tuple[int, int]]]:
    """All quote char spans (sorted by begin) + unclosed spans."""
    if ascii_quotes:
        text = ascii_fold_quotes(text)
    q, u = _recursive_quotes(text, 0, None, single_quotes, max_length,
                             allow_embedded_same, extract_unclosed)
    return sorted(set(q)), sorted(set(u))


def top_level(spans: List[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Spans not strictly contained in another span (the reference's
    top-level QuotationsAnnotation list)."""
    return [s for s in spans
            if not any(o != s and o[0] <= s[0] and s[1] <= o[1]
                       for o in spans)]
