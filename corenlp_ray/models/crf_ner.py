"""Linear-chain CRF NER — the reference's actual NER model family
(src/edu/stanford/nlp/ie/crf/CRFClassifier.java:89: conditional random
field over token features with Viterbi inference; trained by maximizing
conditional log-likelihood, CRFLogConditionalObjectiveFunction.java).

This is a REAL CRF, not a history-based approximation: emission
features score (token, tag), a dense transition matrix scores
(tag_prev, tag), training runs forward-backward per sentence to get
expected feature counts, and the gradient is empirical − expected with
L2 regularization, stepped with AdaGrad (deterministic). Decoding is
exact Viterbi. The history-feature averaged perceptron
(models/perceptron_ner.py) remains as the cheaper slot; both load
through WeightedNerTagger (the JSON carries a ``kind`` marker).

``train`` consumes the CoNLL-2003 reader's (words, pos, ner_tags) rows
unchanged; ``distill`` learns the gazetteer+shape cascade's decisions,
the licensed-corpus-free path.
"""
from __future__ import annotations

import json
import math
from typing import Dict, List, Sequence, Tuple

import numpy as np

from corenlp_ray.functions.shapes import word_shape_chris2


def emission_features(words: Sequence[str], pos: Sequence[str],
                      i: int) -> List[str]:
    """Per-position features WITHOUT previous-tag history (the CRF's
    transition matrix owns label-label structure). Same surface cues as
    the reference's NERFeatureFactory word/shape/affix core."""
    w = words[i]
    lw = w.lower()
    f = [
        "b",
        "w=" + lw,
        "wm1=" + (words[i - 1].lower() if i > 0 else "<s>"),
        "wp1=" + (words[i + 1].lower() if i + 1 < len(words) else "</s>"),
        "p=" + (pos[i] if i < len(pos) else ""),
        "pm1=" + (pos[i - 1] if i > 0 else "<s>"),
        "pp1=" + (pos[i + 1] if i + 1 < len(pos) else "</s>"),
        "sh=" + word_shape_chris2(w),
        "shm1=" + (word_shape_chris2(words[i - 1]) if i > 0 else "<s>"),
        "pre3=" + lw[:3],
        "suf3=" + lw[-3:],
    ]
    if w[:1].isupper():
        f.append("cap" if i > 0 else "cap0")
    if w.isupper() and len(w) > 1:
        f.append("allcap")
    if any(c.isdigit() for c in w):
        f.append("digit")
    return f


class CrfNER:
    """tags: label alphabet; feat_index: feature string → row in the
    (F, T) emission weight matrix; trans: (T+1, T) with row T = BOS."""

    def __init__(self, tags: List[str], feat_index: Dict[str, int],
                 emit: np.ndarray, trans: np.ndarray):
        self.tags = tags
        self.feat_index = feat_index
        self.emit = emit
        self.trans = trans

    # ---------------------------------------------------------- scoring

    def _feat_rows(self, words, pos) -> List[List[int]]:
        idx = self.feat_index
        return [[idx[f] for f in emission_features(words, pos, i)
                 if f in idx] for i in range(len(words))]

    def _emissions(self, rows: List[List[int]]) -> np.ndarray:
        out = np.zeros((len(rows), len(self.tags)))
        for i, r in enumerate(rows):
            if r:
                out[i] = self.emit[r].sum(axis=0)
        return out

    def tag(self, words: Sequence[str],
            pos: Sequence[str]) -> List[str]:
        """Exact Viterbi decode."""
        n, T = len(words), len(self.tags)
        if n == 0:
            return []
        em = self._emissions(self._feat_rows(words, pos))
        delta = em[0] + self.trans[T]          # BOS row
        back = np.zeros((n, T), dtype=np.int32)
        for i in range(1, n):
            cand = delta[:, None] + self.trans[:T]   # (prev, cur)
            back[i] = np.argmax(cand, axis=0)
            delta = cand[back[i], np.arange(T)] + em[i]
        path = [int(np.argmax(delta))]
        for i in range(n - 1, 0, -1):
            path.append(int(back[i][path[-1]]))
        return [self.tags[t] for t in reversed(path)]

    # --------------------------------------------------------- training

    @classmethod
    def train(cls, corpus: List[Tuple[List[str], List[str], List[str]]],
              n_iter: int = 30, lr: float = 0.5, l2: float = 1e-3,
              seed: int = 31) -> "CrfNER":
        """corpus rows: (words, pos, ner_tags) — the
        sources/conll2003.read_conll2003 output shape. Maximizes
        conditional log-likelihood via forward-backward (empirical −
        expected counts), AdaGrad steps, deterministic shuffling."""
        tags = sorted({t for _, _, ts in corpus for t in ts} | {"O"})
        tag_i = {t: i for i, t in enumerate(tags)}
        feat_index: Dict[str, int] = {}
        feats_per_sent = []
        for words, pos, _ in corpus:
            rows = []
            for i in range(len(words)):
                r = []
                for f in emission_features(words, pos, i):
                    if f not in feat_index:
                        feat_index[f] = len(feat_index)
                    r.append(feat_index[f])
                rows.append(r)
            feats_per_sent.append(rows)
        T, F = len(tags), len(feat_index)
        emit = np.zeros((F, T))
        trans = np.zeros((T + 1, T))
        h_emit = np.full((F, T), 1e-8)
        h_trans = np.full((T + 1, T), 1e-8)
        rng = np.random.RandomState(seed)
        model = cls(tags, feat_index, emit, trans)
        for _ in range(n_iter):
            for si in rng.permutation(len(corpus)):
                words, pos, gold = corpus[si]
                n = len(words)
                if n == 0:
                    continue
                rows = feats_per_sent[si]
                em = model._emissions(rows)
                # forward-backward in log space
                alpha = np.zeros((n, T))
                alpha[0] = em[0] + trans[T]
                for i in range(1, n):
                    m = alpha[i - 1][:, None] + trans[:T]
                    mx = m.max(axis=0)
                    alpha[i] = mx + np.log(
                        np.exp(m - mx).sum(axis=0)) + em[i]
                beta = np.zeros((n, T))
                for i in range(n - 2, -1, -1):
                    m = trans[:T] + (em[i + 1] + beta[i + 1])[None, :]
                    mx = m.max(axis=1)
                    beta[i] = mx + np.log(
                        np.exp(m - mx[:, None]).sum(axis=1))
                logz = alpha[-1].max() + math.log(
                    np.exp(alpha[-1] - alpha[-1].max()).sum())
                # node marginals
                node_p = np.exp(alpha + beta - logz)   # (n, T)
                g_emit = np.zeros((F, T))
                g_trans = np.zeros((T + 1, T))
                prev = T
                for i in range(n):
                    gi = tag_i[gold[i]]
                    diff = node_p[i].copy()
                    diff[gi] -= 1.0           # expected − empirical
                    for fr in rows[i]:
                        g_emit[fr] += diff
                    if i == 0:
                        g_trans[T] += diff    # BOS marginal ≈ node
                        g_trans[T][gi] += 0.0
                    else:
                        # pairwise marginals
                        m = (alpha[i - 1][:, None] + trans[:T]
                             + (em[i] + beta[i])[None, :] - logz)
                        pair = np.exp(m)
                        pair[tag_i[gold[i - 1]], gi] -= 1.0
                        g_trans[:T] += pair
                    prev = gi
                g_emit += l2 * emit
                g_trans += l2 * trans
                h_emit += g_emit * g_emit
                h_trans += g_trans * g_trans
                emit -= lr * g_emit / np.sqrt(h_emit)
                trans -= lr * g_trans / np.sqrt(h_trans)
        return model

    @classmethod
    def distill(cls, sentences: List[Tuple[List[str], List[str]]],
                n_iter: int = 20) -> "CrfNER":
        """Learn the gazetteer+shape cascade's decisions (the
        licensed-corpus-free path; real CoNLL-2003 drops into train)."""
        from corenlp_ray.stages.ner import ner_sentence

        corpus = []
        for words, pos in sentences:
            types, _ = ner_sentence(words, pos, None)
            corpus.append((list(words), list(pos), list(types)))
        return cls.train(corpus, n_iter=n_iter)

    # ------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"kind": "crf", "tags": self.tags,
                       "feat_index": self.feat_index,
                       "emit": self.emit.tolist(),
                       "trans": self.trans.tolist()}, f)

    @classmethod
    def load(cls, path: str) -> "CrfNER":
        with open(path) as f:
            o = json.load(f)
        return cls(o["tags"], o["feat_index"], np.array(o["emit"]),
                   np.array(o["trans"]))
