"""Clause-splitter classifier — the trainable analogue of the
reference's logistic-regression-guided clause search
(src/edu/stanford/nlp/naturalli/ClauseSplitterSearchProblem.java:46,
model clauseSearcherModel.ser.gz, featurizer in
ClauseSplitterSearchProblem.java's DEFAULT_FEATURIZER: edge label being
split, governor/dependent POS and words, neighboring edge labels).

A binary averaged perceptron over the same feature shape: given a
dependency tree and a candidate clause-root token, predict whether an
extraction clause may be split off there. Trained on labeled clause
decisions; absent the reference's training set, ``distill`` learns the
deterministic gate (stages/openie.py clause_admissible) so the scored
path is real and a labeled corpus drops into ``train`` unchanged.
"""
from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple


def clause_features(words: Sequence[str], tags: Sequence[str],
                    heads: Sequence[int], labels: Sequence[str],
                    v: int) -> List[str]:
    """Feature template mirroring the reference featurizer: incoming
    edge label, clause-root word/POS, governor word/POS, child edge
    labels (incl. negation/mark signals the rule gate keys on)."""
    g = heads[v]
    f = [
        "b",
        "lbl=" + labels[v],
        "t=" + tags[v],
        "w=" + words[v].lower(),
        "lbl|t=" + labels[v] + "|" + tags[v],
        "gt=" + (tags[g] if g >= 0 else "<root>"),
        "gw=" + (words[g].lower() if g >= 0 else "<root>"),
    ]
    for c in range(len(words)):
        if heads[c] == v:
            f.append("ch=" + labels[c])
            f.append("chw=" + labels[c] + "|" + words[c].lower())
    if g >= 0:
        for c in range(len(words)):
            if heads[c] == g:
                f.append("sib=" + labels[c])
                if labels[c] == "det":
                    f.append("gdet=" + words[c].lower())
    return f


class ClauseClassifier:
    def __init__(self, weights: Dict[str, float] | None = None):
        self.weights = weights or {}

    def score(self, feats: List[str]) -> float:
        return sum(self.weights.get(f, 0.0) for f in feats)

    def admissible(self, words, tags, heads, labels, v: int) -> bool:
        return self.score(clause_features(words, tags, heads,
                                          labels, v)) >= 0.0

    @classmethod
    def train(cls, examples: List[Tuple[List[str], bool]],
              n_iter: int = 8, seed: int = 19) -> "ClauseClassifier":
        """examples: (feature list, label). Averaged perceptron."""
        import random

        w: Dict[str, float] = defaultdict(float)
        acc: Dict[str, float] = defaultdict(float)
        stamp: Dict[str, int] = defaultdict(int)
        rng = random.Random(seed)
        order = list(range(len(examples)))
        step = 0

        def upd(f: str, d: float):
            acc[f] += (step - stamp[f]) * w[f]
            stamp[f] = step
            w[f] += d

        for _ in range(n_iter):
            rng.shuffle(order)
            for i in order:
                feats, y = examples[i]
                s = sum(w.get(f, 0.0) for f in feats)
                guess = s >= 0.0
                if guess != y:
                    d = 1.0 if y else -1.0
                    for f in feats:
                        upd(f, d)
                step += 1
        out = {}
        for f, wt in w.items():
            total = acc[f] + (step - stamp[f]) * wt
            avg = total / max(step, 1)
            if abs(avg) > 1e-9:
                out[f] = round(avg, 6)
        return cls(weights=out)

    @classmethod
    def distill(cls, parsed_sentences: List[Tuple[List[str], List[str],
                                                  List[int], List[str]]],
                n_iter: int = 8) -> "ClauseClassifier":
        """Teacher = the deterministic gate (openie.clause_admissible):
        every verb token in every parsed sentence becomes an example."""
        from corenlp_ray.stages.openie import clause_admissible

        examples = []
        for words, tags, heads, labels in parsed_sentences:
            for v in range(len(words)):
                if not tags[v].startswith("V"):
                    continue
                y = clause_admissible(words, tags, heads, labels, v)
                examples.append(
                    (clause_features(words, tags, heads, labels, v), y))
        return cls.train(examples, n_iter=n_iter)

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump({"weights": self.weights}, fh)

    @classmethod
    def load(cls, path: str) -> "ClauseClassifier":
        with open(path) as fh:
            return cls(weights=json.load(fh)["weights"])
