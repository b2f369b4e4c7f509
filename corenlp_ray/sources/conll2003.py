"""CoNLL-2003 NER format reader — the input shape of the reference's
NER benchmark (itest/src/edu/stanford/nlp/pipeline/
NERBenchmarkSlowITest.java reads eng.testa/eng.testb in this format:
one token per line `word pos chunk ner`, blank line between sentences,
-DOCSTART- document markers).

The corpus itself is licensed and cannot ship; pointing ``read_conll2003``
at a real eng.testa/b file plus ``models/eval.span_prf`` reproduces the
reference's F1 band check (≥ 89.93 testb). Used in tests on a
synthetic file of the same format.
"""
from __future__ import annotations

from typing import List, Tuple

Sentence = Tuple[List[str], List[str], List[str]]   # words, pos, ner


def parse_conll2003(text: str) -> List[Sentence]:
    out: List[Sentence] = []
    words: List[str] = []
    pos: List[str] = []
    ner: List[str] = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            if words:
                out.append((words, pos, ner))
                words, pos, ner = [], [], []
            continue
        cols = line.split()
        if cols[0] == "-DOCSTART-":
            continue
        words.append(cols[0])
        pos.append(cols[1] if len(cols) > 1 else "")
        ner.append(cols[-1])
    if words:
        out.append((words, pos, ner))
    return out


def read_conll2003(path: str) -> List[Sentence]:
    with open(path) as fh:
        return parse_conll2003(fh.read())


def conll2003_dataset(path: str):
    """CoNLL-2003 file → Ray Dataset (one row per sentence)."""
    import ray.data as rd

    rows = [{"words": w, "pos": p, "ner": n}
            for w, p, n in read_conll2003(path)]
    return rd.from_items(rows)


def read_tsv_tagged(path: str) -> List[Tuple[List[str], List[str]]]:
    """word<TAB>tag per line, blank-line sentence breaks (the reference's
    TSVTaggedFileReader shape, tagger/io/TSVTaggedFileReader.java) — the
    training-data format for models/perceptron_tagger.train."""
    out: List[Tuple[List[str], List[str]]] = []
    words: List[str] = []
    tags: List[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line.strip():
                if words:
                    out.append((words, tags))
                    words, tags = [], []
                continue
            w, _, t = line.partition("\t")
            words.append(w)
            tags.append(t)
    if words:
        out.append((words, tags))
    return out
