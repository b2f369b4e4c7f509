"""HTML → text extraction (the CleanXml analogue).

Reference semantics: CleanXmlAnnotator removes XML/SGML tag tokens and keeps
the text between allowed tags, preserving character offsets of surviving
text (/root/reference/src/edu/stanford/nlp/pipeline/CleanXmlAnnotator.java:27).
Our engine runs extraction BEFORE tokenization (web pages arrive as raw
HTML bytes), with a deterministic, documented spec so the extracted ``text``
column is byte-identical per url across runs and parallelism levels — the
per-row invariant from BASELINE.json.

Extraction spec (deterministic, order matters):
  1. Decode bytes as UTF-8 (errors="replace").
  2. Drop ``<!-- ... -->`` comments and the complete contents of
     ``<script>``, ``<style>``, ``<head>``, ``<noscript>``, ``<template>``,
     ``<iframe>``, ``<svg>`` elements (the reference's "non-allowed tags").
  3. Replace every remaining tag with: "\n" if it is a block-level tag
     (p, div, br, hr, h1-h6, li, ul, ol, tr, td, th, table, blockquote,
     pre, section, article, header, footer, nav, figure, figcaption, title,
     body, html, form, fieldset, dl, dt, dd, address, aside, main, option,
     select, textarea, caption), else "" (inline tags: a, b, i, em, strong,
     span, code, small, sub, sup, u, abbr, time, mark, q, cite, ...).
  4. Decode HTML character entities (named common set + numeric).
  5. Normalize: split on newlines, strip each line, drop empty lines,
     then join consecutive non-empty lines into paragraphs? No — simpler
     and fully deterministic: each non-empty stripped line IS a paragraph;
     paragraphs are joined with "\n\n". Intra-line whitespace runs collapse
     to a single space.

``corenlp_ray.sources.pages`` generates HTML whose extraction equals the
``text`` column exactly, which is how tests pin the invariant.
"""
from __future__ import annotations

import html as _htmllib
import re

import pyarrow as pa

# Elements whose entire content is dropped.
_DROP_CONTENT = ("script", "style", "head", "noscript", "template", "iframe", "svg")

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_DROP_RES = [
    re.compile(r"<%s\b[^>]*>.*?</%s\s*>" % (t, t), re.S | re.I) for t in _DROP_CONTENT
]
_BLOCK_TAGS = {
    "p", "div", "br", "hr", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "tr", "td", "th", "table", "blockquote", "pre", "section",
    "article", "header", "footer", "nav", "figure", "figcaption", "title",
    "body", "html", "form", "fieldset", "dl", "dt", "dd", "address",
    "aside", "main", "option", "select", "textarea", "caption",
}
_TAG_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9:-]*)[^>]*>")
_WS_RUN_RE = re.compile(r"[ \t\r\f\v ]+")


def _tag_repl(m: re.Match) -> str:
    return "\n" if m.group(1).lower() in _BLOCK_TAGS else ""


def extract_text(html: bytes | str | None) -> str:
    """Pure kernel: HTML (bytes or str) → canonical extracted text."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", html)
    for rx in _DROP_RES:
        s = rx.sub("\n", s)
    s = _TAG_RE.sub(_tag_repl, s)
    s = _htmllib.unescape(s)
    # the run class excludes \n, so one whole-document sub is identical to
    # the per-line sub (and ~40x fewer regex calls on real pages)
    s = _WS_RUN_RE.sub(" ", s)
    return "\n\n".join(ln for ln in map(str.strip, s.split("\n")) if ln)


def canonicalize_text(text: str) -> str:
    """Normalize arbitrary source text into the same canonical paragraph
    form ``extract_text`` produces (used by the pages generator so that
    text == extract_text(html_of(text)) byte-identically)."""
    text = _WS_RUN_RE.sub(" ", text)
    return "\n\n".join(ln for ln in map(str.strip, text.split("\n")) if ln)


# token-level CleanXml (the reference's actual annotator shape:
# PTBTokenizer emits SGML tags as tokens, CleanXmlAnnotator drops them
# while PRESERVING character offsets into the original string —
# src/edu/stanford/nlp/pipeline/CleanXmlAnnotator.java:27-41; behavior
# pinned by test/pipeline/CleanXmlAnnotatorTest.java cases in
# tests/test_cleanxml_reference.py)
_SGML_TOKEN_RE = re.compile(r"^</?[A-Za-z][^>]*>$|^<!--.*-->$", re.S)


def cleanxml_tokens(toks):
    """[(word, orig, begin, end)] → same with tag tokens removed; the
    survivors keep their original char offsets (the invertibility
    contract CleanXmlAnnotatorTest.testInvertible checks)."""
    return [t for t in toks if not _SGML_TOKEN_RE.match(t[0])]


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: pages(url, warc_ts, html, ...) → + text_extracted.

    Stateless task stage (pure function of ``html``); regexes are compiled
    once per worker process at module import.
    """
    out = [extract_text(v) for v in batch.column("html").to_pylist()]
    return batch.append_column("text_extracted", pa.array(out, type=pa.string()))
