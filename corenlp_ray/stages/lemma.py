"""Lemmatization stage (the MorphaAnnotator analogue).

The reference lemmatizes with the finite-state Morpha stemmer keyed on
(word, POS) (/root/reference/src/edu/stanford/nlp/pipeline/
MorphaAnnotator.java:27, process/Morphology.java:54, process/Morpha.flex).
This engine re-expresses the same contract — lemma is a pure function of
(word, POS) — as rule tables + irregular-form dictionaries, vectorizable
inside a stateless map_batches stage.

Conventions (matching the reference's observable behavior):
  * NNP/NNPS keep their case; all other lemmas are lowercased.
  * was/were→be, has→have, born→bear, n't→not, 's(POS) stays 's.

Adds column: tok_lemma list<string>.
"""
from __future__ import annotations

from typing import List

import pyarrow as pa

from corenlp_ray.functions.lexicon import (
    IRREGULAR_NOUN_LEMMA, IRREGULAR_VERB_LEMMA, S_SINGULAR,
)

_VOWELS = set("aeiou")

_DOUBLED = {"nn", "tt", "pp", "mm", "dd", "gg", "bb", "rr", "ll"}


def _strip_s(w: str) -> str:
    """Plural/3sg -s removal with es/ies rules."""
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "xes", "zes", "sses")):
        return w[:-2]
    if w.endswith("oes") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    return w


def _strip_ed(w: str) -> str:
    if w.endswith("ied") and len(w) <= 4:
        return w[:-1]  # died→die, lied→lie
    if w.endswith("ied") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("eed"):
        return w[:-1] if w.endswith(("agreed", "freed")) else w[:-1]
    if w.endswith("ed") and len(w) > 3:
        stem = w[:-2]
        if stem[-2:] in _DOUBLED and len(stem) > 2 and stem[-3] in _VOWELS \
                and stem not in ("roll", "fall", "tell", "smell", "fill"):
            return stem[:-1]
        if _needs_e(stem):
            return stem + "e"
        return stem
    return w


def _strip_ing(w: str) -> str:
    if w.endswith("ing") and len(w) > 4:
        stem = w[:-3]
        if stem[-2:] in _DOUBLED and len(stem) > 2 and stem[-3] in _VOWELS \
                and stem not in ("roll", "fall", "tell", "smell", "fill"):
            return stem[:-1]
        if _needs_e(stem):
            return stem + "e"
        return stem
    return w


def _needs_e(stem: str) -> bool:
    """Restore silent e: mak→make, liv→live, acquir→acquire."""
    if len(stem) < 2:
        return False
    if stem.endswith(("at", "iv", "ir", "ak", "iz", "os", "us", "ut",
                      "om", "in", "ar", "or", "as", "ag", "ud", "uc",
                      "anc", "enc", "uat")):
        # heuristic consonant-e patterns; favored for latinate stems
        return stem[-1] not in _VOWELS and stem[-2] in _VOWELS and \
            not stem.endswith(("ain", "oin", "ean", "ear", "oor", "eat"))
    return False


def lemma_of(word: str, pos: str) -> str:
    """Pure kernel: (word, POS) → lemma."""
    if pos in ("NNP", "NNPS"):
        return word
    lw = word.lower()
    if pos.startswith("V") or pos == "MD":
        if lw in IRREGULAR_VERB_LEMMA:
            return IRREGULAR_VERB_LEMMA[lw]
        if pos == "VBZ":
            return _strip_s(lw)
        if pos in ("VBD", "VBN"):
            return _strip_ed(lw)
        if pos == "VBG":
            return _strip_ing(lw)
        return lw
    if pos == "NNS":
        if lw in IRREGULAR_NOUN_LEMMA:
            return IRREGULAR_NOUN_LEMMA[lw]
        if lw in S_SINGULAR:
            return lw
        return _strip_s(lw)
    if pos in ("JJR",):
        return lw[:-2] if lw.endswith("er") and len(lw) > 4 else lw
    if pos in ("JJS",):
        return lw[:-3] if lw.endswith("est") and len(lw) > 5 else lw
    if lw == "n't":
        return "not"
    return lw


def lemma_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches stage: + tok_lemma (requires tok_pos)."""
    out = []
    for words, tags in zip(batch.column("tok_word").to_pylist(),
                           batch.column("tok_pos").to_pylist()):
        out.append([lemma_of(w, t) for w, t in zip(words, tags)])
    return batch.append_column(
        "tok_lemma", pa.array(out, type=pa.list_(pa.string())))
