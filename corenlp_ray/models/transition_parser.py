"""Arc-standard transition dependency parser — the trainable analogue of
the reference's neural dependency parser (src/edu/stanford/nlp/parser/
nndep/DependencyParser.java:74, transition system in nndep/
ArcStandard.java, feature positions in nndep/Configuration.java /
Classifier.java: top-3 stack, top-3 buffer, leftmost/rightmost children).

Scoring is an averaged perceptron over the same structural feature
positions (Chen & Manning 2014's input layout, linear instead of the
cube-activation MLP — the published algorithmic skeleton without shipped
weights). Training needs a UD/CoNLL treebank; none can ship here, so
``distill`` learns the deterministic rule cascade's trees (same labels,
learned form) and a real treebank drops into ``train`` unchanged.

Transitions: SHIFT, LEFT-ARC(l) (s2 ← s1 head attach, pop s2),
RIGHT-ARC(l) (s1 ← s2... standard arc-standard with buffer front).
Greedy inference as in nndep (TestSentence-style beamless).
"""
from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

_ROOT = "<root>"
_NULL = "<null>"


class _Config:
    __slots__ = ("stack", "buf", "heads", "labels", "lefts", "rights")

    def __init__(self, n: int):
        self.stack = [0]                 # 0 = ROOT
        self.buf = list(range(1, n + 1))
        self.heads = [-1] * (n + 1)
        self.labels = [""] * (n + 1)
        self.lefts: Dict[int, List[int]] = defaultdict(list)
        self.rights: Dict[int, List[int]] = defaultdict(list)

    def terminal(self) -> bool:
        return not self.buf and len(self.stack) == 1


def _feat_positions(c: _Config) -> List[int]:
    """18 structural positions (Classifier.java feature layout): s1-s3,
    b1-b3, leftmost/rightmost child of s1/s2, leftmost-of-leftmost /
    rightmost-of-rightmost."""
    s = c.stack
    b = c.buf
    s1 = s[-1] if len(s) > 0 else -1
    s2 = s[-2] if len(s) > 1 else -1
    s3 = s[-3] if len(s) > 2 else -1
    b1 = b[0] if len(b) > 0 else -1
    b2 = b[1] if len(b) > 1 else -1
    b3 = b[2] if len(b) > 2 else -1

    def lc(i, k=0):
        ch = c.lefts.get(i, [])
        return ch[k] if len(ch) > k else -1

    def rc(i, k=0):
        ch = c.rights.get(i, [])
        return ch[-1 - k] if len(ch) > k else -1

    return [s1, s2, s3, b1, b2, b3,
            lc(s1), rc(s1), lc(s2), rc(s2),
            lc(s1, 1), rc(s1, 1),
            lc(lc(s1)), rc(rc(s1)), lc(lc(s2)), rc(rc(s2)),
            lc(b1), rc(b1)]


def features(words: Sequence[str], tags: Sequence[str],
             c: _Config) -> List[str]:
    """Word/POS features at each structural position + position pairs."""
    def w(i):
        if i <= 0:
            return _ROOT if i == 0 else _NULL
        return words[i - 1].lower()

    def t(i):
        if i <= 0:
            return _ROOT if i == 0 else _NULL
        return tags[i - 1]

    pos = _feat_positions(c)
    f: List[str] = []
    for k, i in enumerate(pos):
        f.append(f"w{k}={w(i)}")
        f.append(f"t{k}={t(i)}")
    # key pair/triple conjunctions (s1/s2/b1 interactions dominate)
    s1, s2, _, b1 = pos[0], pos[1], pos[2], pos[3]
    f.append(f"t01={t(s1)}|{t(s2)}")
    f.append(f"w01={w(s1)}|{w(s2)}")
    f.append(f"t0b={t(s1)}|{t(b1)}")
    f.append(f"t012={t(s1)}|{t(s2)}|{t(b1)}")
    f.append(f"wt0={w(s1)}|{t(s1)}")
    f.append(f"wt1={w(s2)}|{t(s2)}")
    return f


def _apply(c: _Config, act: str) -> None:
    if act == "S":
        c.stack.append(c.buf.pop(0))
        return
    kind, label = act.split(":", 1)
    s1, s2 = c.stack[-1], c.stack[-2]
    if kind == "L":                      # s2 ← s1
        c.heads[s2] = s1
        c.labels[s2] = label
        c.lefts[s1].insert(0, s2)
        c.stack.pop(-2)
    else:                                # s1 ← s2
        c.heads[s1] = s2
        c.labels[s1] = label
        c.rights[s2].append(s1)
        c.stack.pop()


def _legal(c: _Config) -> List[str]:
    acts = []
    if c.buf:
        acts.append("S")
    if len(c.stack) >= 2:
        if c.stack[-2] != 0:
            acts.append("L")
        acts.append("R")
    return acts


def _oracle_action(c: _Config, gold_heads: List[int],
                   gold_labels: List[str]) -> str:
    """Static arc-standard oracle."""
    if len(c.stack) >= 2:
        s1, s2 = c.stack[-1], c.stack[-2]
        if s2 != 0 and gold_heads[s2] == s1 and \
                all(gold_heads[d] != s2 or c.heads[d] == s2
                    for d in range(1, len(gold_heads))):
            return "L:" + gold_labels[s2]
        if gold_heads[s1] == s2 and \
                all(gold_heads[d] != s1 or c.heads[d] == s1
                    for d in range(1, len(gold_heads))):
            return "R:" + gold_labels[s1]
    if not c.buf:
        # non-projective gold (or exhausted buffer): no legal shift —
        # reduce with the gold label rather than crashing buf.pop()
        # (nndep filters these rows up front; train() now does too, this
        # is the belt-and-braces path for direct oracle callers)
        s1 = c.stack[-1]
        return "R:" + (gold_labels[s1] if s1 < len(gold_labels) else "dep")
    return "S"


class TransitionParser:
    def __init__(self, weights: Dict[str, Dict[str, float]] | None = None):
        self.weights = weights or {}

    def _score(self, feats: List[str],
               acts: List[str]) -> Dict[str, float]:
        scores = {a: 0.0 for a in acts}
        for f in feats:
            fv = self.weights.get(f)
            if fv:
                for a, wt in fv.items():
                    if a in scores:
                        scores[a] += wt
        return scores

    @staticmethod
    def _best(scores: Dict[str, float], legal_kinds: List[str],
              all_acts: List[str]) -> str:
        cand = [(s, a) for a, s in scores.items()
                if (a == "S" and "S" in legal_kinds)
                or (":" in a and a[:1] in legal_kinds)]
        if not cand:
            return "S" if "S" in legal_kinds else \
                next(a for a in all_acts if a[:1] in legal_kinds)
        return min(cand, key=lambda sa: (-sa[0], sa[1]))[1]

    def parse(self, words: Sequence[str],
              tags: Sequence[str]) -> Tuple[List[int], List[str]]:
        """Greedy inference → (heads 0-rooted per token, labels)."""
        n = len(words)
        if n == 0:
            return [], []
        c = _Config(n)
        all_acts = sorted({a for fv in self.weights.values() for a in fv})
        max_steps = 4 * n + 10
        while not c.terminal() and max_steps > 0:
            max_steps -= 1
            kinds = _legal(c)
            if not kinds:
                break
            feats = features(words, tags, c)
            scores = self._score(feats, all_acts or ["S"])
            act = self._best(scores, kinds, all_acts or ["S"])
            _apply(c, act)
        heads = [h if h >= 0 else 0 for h in c.heads[1:]]
        labels = [l or "dep" for l in c.labels[1:]]
        return heads, labels

    @classmethod
    def train(cls, corpus: List[Tuple[List[str], List[str], List[int],
                                      List[str]]],
              n_iter: int = 6, seed: int = 17) -> "TransitionParser":
        """corpus rows: (words, tags, heads (1-based, 0=root), labels).
        Averaged perceptron over oracle transition sequences.

        Non-projective gold trees are filtered here (not only in
        distill): arc-standard cannot derive them and the static oracle
        would otherwise dead-end — mirroring nndep's Util.loadConll
        projectivity check, so ``train --conllu <real UD treebank>``
        works on real data."""
        import random

        corpus = [row for row in corpus
                  if row[2] and _is_projective(list(row[2]))]

        w: Dict[str, Dict[str, float]] = defaultdict(
            lambda: defaultdict(float))
        acc: Dict[str, Dict[str, float]] = defaultdict(
            lambda: defaultdict(float))
        stamp: Dict[str, Dict[str, int]] = defaultdict(
            lambda: defaultdict(int))
        all_acts = set()
        for _, _, heads, labels in corpus:
            for h, l in zip(heads, labels):
                all_acts.add("L:" + l)
                all_acts.add("R:" + l)
        all_acts.add("S")
        all_acts = sorted(all_acts)
        rng = random.Random(seed)
        order = list(range(len(corpus)))
        step = 0

        def upd(f, a, d):
            acc[f][a] += (step - stamp[f][a]) * w[f][a]
            stamp[f][a] = step
            w[f][a] += d

        parser = cls()
        for _ in range(n_iter):
            rng.shuffle(order)
            for si in order:
                words, tags, gheads, glabels = corpus[si]
                n = len(words)
                if n == 0:
                    continue
                gh = [0] + list(gheads)
                gl = [""] + list(glabels)
                c = _Config(n)
                guard = 4 * n + 10
                while not c.terminal() and guard > 0:
                    guard -= 1
                    kinds = _legal(c)
                    if not kinds:
                        break
                    gold = _oracle_action(c, gh, gl)
                    feats = features(words, tags, c)
                    scores = {a: 0.0 for a in all_acts}
                    for f in feats:
                        if f in w:
                            for a, wt in w[f].items():
                                scores[a] += wt
                    guess = parser._best(scores, kinds, all_acts)
                    if guess != gold:
                        for f in feats:
                            upd(f, gold, 1.0)
                            upd(f, guess, -1.0)
                    _apply(c, gold)     # follow the oracle (teacher path)
                    step += 1
        out: Dict[str, Dict[str, float]] = {}
        for f, fv in w.items():
            av = {}
            for a, wt in fv.items():
                total = acc[f][a] + (step - stamp[f][a]) * wt
                avg = total / max(step, 1)
                if abs(avg) > 1e-9:
                    av[a] = round(avg, 6)
            if av:
                out[f] = av
        return cls(weights=out)

    @classmethod
    def distill(cls, sentences: List[Tuple[List[str], List[str]]],
                n_iter: int = 5) -> "TransitionParser":
        """Teacher = the deterministic rule cascade (stages/depparse.py):
        learn its trees so the weighted inference path is real; a
        licensed treebank drops into ``train`` for reference-band UAS."""
        from corenlp_ray.stages.depparse import parse_sentence

        corpus = []
        for words, tags in sentences:
            if not words:
                continue
            heads0, labels = parse_sentence(words, tags)
            # cascade is 0-based with -1 root; transition system is
            # 1-based with 0 = ROOT
            heads = [h + 1 if h >= 0 else 0 for h in heads0]
            if _is_projective(heads):
                corpus.append((list(words), list(tags), heads, labels))
        return cls.train(corpus, n_iter=n_iter)

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump({"weights": self.weights}, fh)

    @classmethod
    def load(cls, path: str) -> "TransitionParser":
        with open(path) as fh:
            return cls(weights=json.load(fh)["weights"])


def _is_projective(heads: List[int]) -> bool:
    """Arc-standard can only produce projective trees; filter training
    rows (nndep does the same — Util.java loadConll projectivity check)."""
    n = len(heads)
    arcs = [(min(h, i + 1), max(h, i + 1)) for i, h in enumerate(heads)]
    for a1, b1 in arcs:
        for a2, b2 in arcs:
            if a1 < a2 < b1 < b2:
                return False
    return True


def read_conllu_trees(path: str) \
        -> List[Tuple[List[str], List[str], List[int], List[str]]]:
    """CoNLL-U → (words, xpos, heads, deprels) rows (nndep's training
    data shape)."""
    out = []
    words: List[str] = []
    tags: List[str] = []
    heads: List[int] = []
    rels: List[str] = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                if words:
                    out.append((words, tags, heads, rels))
                    words, tags, heads, rels = [], [], [], []
                continue
            if line.startswith("#"):
                continue
            cols = line.split("\t")
            if "." in cols[0] or "-" in cols[0]:
                continue
            words.append(cols[1])
            tags.append(cols[4] if cols[4] != "_" else cols[3])
            heads.append(int(cols[6]) if cols[6] != "_" else 0)
            rels.append(cols[7].split(":")[0] if cols[7] != "_" else "dep")
    if words:
        out.append((words, tags, heads, rels))
    return out
