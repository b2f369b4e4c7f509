"""Averaged-perceptron sequence NER — the trainable analogue of the
reference's CRF classifier (src/edu/stanford/nlp/ie/crf/
CRFClassifier.java:1060-1181; feature factories in ie/NERFeatureFactory
.java: word, shape, prefix/suffix, context windows, prev-label). The
reference's F1 band (≥ 89.93 on CoNLL-2003 eng.testb,
itest/.../NERBenchmarkSlowITest.java:185-210) needs the licensed CoNLL
corpus; ``train`` consumes exactly that shape via
sources/conll2003.read_conll2003 + models/eval.span_prf, so the band
becomes runnable the moment the data is present. Absent it,
``distill`` learns the gazetteer/shape cascade's token types.

Greedy left-to-right decoding with prev-label features (the
structured-perceptron trick that recovers most of CRF's sequence
signal at a fraction of the cost); labels are whatever tag scheme the
corpus uses (IOB or bare types).
"""
from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

from corenlp_ray.functions.shapes import word_shape_chris2


def features(words: Sequence[str], pos: Sequence[str], i: int,
             prev: str, prev2: str) -> List[str]:
    w = words[i]
    lw = w.lower()
    wm1 = words[i - 1].lower() if i > 0 else "<s>"
    wp1 = words[i + 1].lower() if i + 1 < len(words) else "</s>"
    pm1 = pos[i - 1] if i > 0 else "<s>"
    pp1 = pos[i + 1] if i + 1 < len(words) else "</s>"
    f = [
        "b",
        "w=" + lw,
        "wm1=" + wm1,
        "wp1=" + wp1,
        "p=" + (pos[i] if i < len(pos) else ""),
        "pm1=" + pm1,
        "pp1=" + pp1,
        "sh=" + word_shape_chris2(w),
        "shm1=" + (word_shape_chris2(words[i - 1]) if i > 0 else "<s>"),
        "pre3=" + lw[:3],
        "suf3=" + lw[-3:],
        "t-1=" + prev,
        "t-2t-1=" + prev2 + "|" + prev,
        "t-1w=" + prev + "|" + lw,
    ]
    if w[:1].isupper():
        f.append("cap" if i > 0 else "cap0")
    if w.isupper() and len(w) > 1:
        f.append("allcap")
    if any(c.isdigit() for c in w):
        f.append("digit")
    return f


class PerceptronNER:
    def __init__(self, weights: Dict[str, Dict[str, float]] | None = None):
        self.weights = weights or {}

    def _predict(self, feats: List[str]) -> str:
        scores: Dict[str, float] = defaultdict(float)
        for f in feats:
            fv = self.weights.get(f)
            if fv:
                for tag, w in fv.items():
                    scores[tag] += w
        if not scores:
            return "O"
        return min(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    def tag(self, words: Sequence[str],
            pos: Sequence[str]) -> List[str]:
        prev, prev2 = "<s>", "<s>"
        out = []
        for i in range(len(words)):
            t = self._predict(features(words, pos, i, prev, prev2))
            out.append(t)
            prev2, prev = prev, t
        return out

    @classmethod
    def train(cls, corpus: List[Tuple[List[str], List[str], List[str]]],
              n_iter: int = 8, seed: int = 23) -> "PerceptronNER":
        """corpus rows: (words, pos, ner_tags) — exactly the
        sources/conll2003.read_conll2003 output shape."""
        import random

        w: Dict[str, Dict[str, float]] = defaultdict(
            lambda: defaultdict(float))
        acc: Dict[str, Dict[str, float]] = defaultdict(
            lambda: defaultdict(float))
        stamp: Dict[str, Dict[str, int]] = defaultdict(
            lambda: defaultdict(int))
        rng = random.Random(seed)
        order = list(range(len(corpus)))
        step = 0

        def upd(f, tag, d):
            acc[f][tag] += (step - stamp[f][tag]) * w[f][tag]
            stamp[f][tag] = step
            w[f][tag] += d

        for _ in range(n_iter):
            rng.shuffle(order)
            for si in order:
                words, pos, gold = corpus[si]
                prev, prev2 = "<s>", "<s>"
                for i in range(len(words)):
                    feats = features(words, pos, i, prev, prev2)
                    scores: Dict[str, float] = defaultdict(float)
                    for f in feats:
                        if f in w:
                            for tag, wt in w[f].items():
                                scores[tag] += wt
                    guess = min(scores.items(),
                                key=lambda kv: (-kv[1], kv[0]))[0] \
                        if scores else "O"
                    if guess != gold[i]:
                        for f in feats:
                            upd(f, gold[i], 1.0)
                            upd(f, guess, -1.0)
                    step += 1
                    prev2, prev = prev, gold[i]
        self = cls()
        for f, fv in w.items():
            av = {}
            for tag, wt in fv.items():
                total = acc[f][tag] + (step - stamp[f][tag]) * wt
                avg = total / max(step, 1)
                if abs(avg) > 1e-9:
                    av[tag] = round(avg, 6)
            if av:
                self.weights[f] = av
        return self

    @classmethod
    def distill(cls, sentences: List[Tuple[List[str], List[str]]],
                n_iter: int = 6) -> "PerceptronNER":
        """Teacher = the gazetteer/shape cascade (stages/ner.py
        ner_sentence token types)."""
        from corenlp_ray.stages.ner import ner_sentence

        corpus = []
        for words, pos in sentences:
            if not words:
                continue
            types, _ = ner_sentence(words, pos)
            corpus.append((list(words), list(pos), types))
        return cls.train(corpus, n_iter=n_iter)

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump({"weights": self.weights}, fh)

    @classmethod
    def load(cls, path: str) -> "PerceptronNER":
        with open(path) as fh:
            return cls(weights=json.load(fh)["weights"])
