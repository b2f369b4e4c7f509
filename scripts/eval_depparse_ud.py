"""Depparse band on REAL trees (r4 verdict task 9).

Gold = the reference's own UniversalEnglishGrammaticalStructureTest
BASIC cases (98 unique sentences / 616 scored tokens of hand-checked
basic-UD heads+labels) — the only sizeable real-tree dependency gold
the reference ships (licensed UD/WSJ treebanks are not included).

Scores four configurations:
  cascade(goldPOS)   — isolates parse quality from tagging
  cascade(e2e)       — our POS stage feeding the cascade (the shipped path)
  distilled slot     — arc-standard perceptron distilled from the cascade,
                       scored against REAL gold (not the teacher)
  supervised slot    — the same slot trained on an 80% split of this gold,
                       scored on the held-out 20% (shows the trainable
                       path learns real trees; reference band ~0.90 UAS
                       needs the licensed treebanks)

Usage: python scripts/eval_depparse_ud.py
"""
import json
import random

from corenlp_ray.models.ud_gold import load_ud_gold, score_predictions
from corenlp_ray.models.transition_parser import TransitionParser
from corenlp_ray.stages.depparse import parse_sentence
from corenlp_ray.stages.pos import tag_sentence


def _conv(h1):
    """transition-parser convention (1-based, 0=root) → cascade
    convention (0-based, -1=root) that score_predictions expects."""
    return [h - 1 if h >= 1 else -1 for h in h1]


def main():
    rows = load_ud_gold("BASIC")
    out = {"sentences": len(rows)}

    ph, pl = [], []
    for r in rows:
        h, l = parse_sentence(r["words"], r["tags"])
        ph.append(h), pl.append(l)
    out["cascade_goldpos"] = score_predictions(rows, ph, pl)

    ph, pl = [], []
    for r in rows:
        h, l = parse_sentence(r["words"], tag_sentence(r["words"]))
        ph.append(h), pl.append(l)
    out["cascade_e2e"] = score_predictions(rows, ph, pl)

    dist = TransitionParser.distill(
        [(r["words"], r["tags"]) for r in rows], n_iter=5)
    ph, pl = [], []
    for r in rows:
        h, l = dist.parse(r["words"], r["tags"])
        ph.append(_conv(h)), pl.append(l)
    out["distilled_slot"] = score_predictions(rows, ph, pl)

    rng = random.Random(17)
    idx = list(range(len(rows)))
    rng.shuffle(idx)
    cut = int(len(rows) * 0.8)
    tr, te = [rows[i] for i in idx[:cut]], [rows[i] for i in idx[cut:]]
    corpus = []
    for r in tr:
        root1 = next((i + 1 for i, x in enumerate(r["heads"]) if x == 0), 1)
        hh = [h if h != -2 else root1 for h in r["heads"]]
        ll = [l if l else "punct" for l in r["labels"]]
        corpus.append((r["words"], r["tags"], hh, ll))
    sup = TransitionParser.train(corpus, n_iter=12, seed=17)
    ph, pl = [], []
    for r in te:
        h, l = sup.parse(r["words"], r["tags"])
        ph.append(_conv(h)), pl.append(l)
    out["supervised_heldout"] = score_predictions(te, ph, pl)
    out["supervised_heldout"]["sentences"] = len(te)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
