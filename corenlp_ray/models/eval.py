"""Evaluation harnesses mirroring the reference's benchmark ITests:

  * token accuracy        — POSTaggerBenchmarkITest.java:15-37 (WSJ
                            bands ≥ 96.76 dev / ≥ 97.21 test)
  * CoNLL span P/R/F1     — NERBenchmarkSlowITest.java:170-210 via the
                            standard conlleval span rules (exact-span,
                            exact-type match)
  * UAS / LAS             — DependencyParser.java:1138-1186 prints

These make the reference's accuracy bands RUNNABLE the moment licensed
corpora (PTB, CoNLL-2003, UD treebanks) are available: feed gold +
predictions from the trainable models (models/perceptron_tagger.py,
models/transition_parser.py) or the rule cascades. Band values are
recorded in BASELINE.md; nothing here ships data.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple


def token_accuracy(gold: Sequence[Sequence[str]],
                   pred: Sequence[Sequence[str]]) -> float:
    """Per-token tag accuracy over parallel sentence lists."""
    right = total = 0
    for g, p in zip(gold, pred):
        right += sum(a == b for a, b in zip(g, p))
        total += len(g)
    return right / total if total else 0.0


def _spans(tags: Sequence[str]) -> List[Tuple[int, int, str]]:
    """IOB/IOB2 (or bare-type) tag sequence → [(begin, end, type)]."""
    out = []
    start = None
    cur = None
    for i, t in enumerate(tags):
        if t == "O" or t is None:
            if cur is not None:
                out.append((start, i, cur))
                cur = None
            continue
        prefix, _, ty = t.partition("-")
        if not ty:                      # bare type (no B-/I- prefix)
            prefix, ty = "I", prefix
        if cur is None or ty != cur or prefix == "B":
            if cur is not None:
                out.append((start, i, cur))
            start, cur = i, ty
    if cur is not None:
        out.append((start, len(tags), cur))
    return out


def span_prf(gold: Sequence[Sequence[str]],
             pred: Sequence[Sequence[str]]) -> Dict[str, float]:
    """CoNLL-2003 entity-level precision/recall/F1: a predicted span
    counts iff begin, end AND type all match a gold span."""
    tp = fp = fn = 0
    for g, p in zip(gold, pred):
        gs, ps = set(_spans(g)), set(_spans(p))
        tp += len(gs & ps)
        fp += len(ps - gs)
        fn += len(gs - ps)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"precision": prec, "recall": rec, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn}


def attachment_scores(gold_heads: Sequence[Sequence[int]],
                      pred_heads: Sequence[Sequence[int]],
                      gold_labels: Sequence[Sequence[str]] = (),
                      pred_labels: Sequence[Sequence[str]] = ()
                      ) -> Dict[str, float]:
    """UAS (+ LAS when labels given), punctuation included (the
    reference's default printout)."""
    ua = la = total = 0
    lab = bool(gold_labels) and bool(pred_labels)
    for si, (gh, ph) in enumerate(zip(gold_heads, pred_heads)):
        for i, (g, p) in enumerate(zip(gh, ph)):
            total += 1
            if g == p:
                ua += 1
                if lab and gold_labels[si][i] == pred_labels[si][i]:
                    la += 1
    out = {"uas": ua / total if total else 0.0}
    if lab:
        out["las"] = la / total if total else 0.0
    return out
