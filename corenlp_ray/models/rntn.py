"""Recursive Neural Tensor Network sentiment model — the trainable
analogue of the reference's sentiment package
(src/edu/stanford/nlp/sentiment/SentimentModel.java: W, Wt (the
tensor), Ws (classifier), word vectors; SentimentCostAndGradient.java:
backprop through structure; training regime per Socher et al. 2013,
"Recursive Deep Models for Semantic Compositionality Over a Sentiment
Treebank" — public paper).

Composition at a binary node with child vectors a, b (d-dim):
    c  = [a; b]                       (2d)
    h  = tanh(W @ [c; 1] + c^T V c)   (V: d slices of 2d x 2d)
and a 5-class softmax at EVERY node (the treebank labels all phrases).
N-ary projected trees are left-binarized on the fly (the reference
binarizes with its TreeBinarizer before scoring).

``train`` consumes PTB-sentiment-format labeled trees —
"(3 (2 It) (4 (2 was) (4 great)))" — so the real Stanford Sentiment
Treebank train split drops in unchanged; ``distill`` labels this
engine's projected constituency trees with the deterministic
tree-compositional scorer (stages/sentiment.sentiment_tree) and learns
those decisions, the same licensed-corpus-free path every other
statistical slot uses. AdaGrad, deterministic seeding, numpy only.
"""
from __future__ import annotations

import json
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

N_CLASSES = 5
UNK = "<unk>"


def _onehot(k: int) -> np.ndarray:
    v = np.zeros(N_CLASSES)
    v[k] = 1.0
    return v


# ------------------------------------------------------------- tree parse

class _Node:
    __slots__ = ("label", "word", "children", "vec", "delta")

    def __init__(self, label: Optional[int], word: Optional[str],
                 children: List["_Node"]):
        self.label = label
        self.word = word
        self.children = children


def parse_tree(s: str) -> _Node:
    """Parse a bracketing; numeric head labels (PTB-sentiment format)
    become gold classes, non-numeric labels (this engine's projected
    trees) leave label None."""
    pos = 0

    def node() -> _Node:
        nonlocal pos
        assert s[pos] == "("
        pos += 1
        start = pos
        while pos < len(s) and s[pos] not in " ()":
            pos += 1
        raw = s[start:pos]
        label = int(raw) if raw.isdigit() else None
        children: List[_Node] = []
        word = None
        while pos < len(s):
            if s[pos] == " ":
                pos += 1
            elif s[pos] == "(":
                children.append(node())
            elif s[pos] == ")":
                pos += 1
                break
            else:
                w0 = pos
                while pos < len(s) and s[pos] not in " ()":
                    pos += 1
                word = s[w0:pos]
        return _Node(label, word if not children else None, children)

    return node()


def _binarize(n: _Node) -> _Node:
    """Left-binarize n-ary nodes (TreeBinarizer analogue); intermediate
    nodes inherit the parent's label so every scored node has a gold
    class during training."""
    if n.word is not None:
        return n
    kids = [_binarize(c) for c in n.children]
    if len(kids) == 1:
        # unary chain: collapse into the child but keep this label if
        # the child has none
        child = kids[0]
        if child.label is None:
            child.label = n.label
        return child
    while len(kids) > 2:
        merged = _Node(n.label, None, [kids[0], kids[1]])
        kids = [merged] + kids[2:]
    return _Node(n.label, None, kids)


def _leaves(n: _Node, out: List[str]) -> None:
    if n.word is not None:
        out.append(n.word.lower())
    for c in n.children:
        _leaves(c, out)


# ------------------------------------------------------------------ model

class RNTN:
    """Weights: L (vocab x d word vectors), W (d x 2d+1), V
    (d x 2d x 2d tensor), Ws (5 x d+1 softmax)."""

    def __init__(self, vocab: Dict[str, int], d: int, L: np.ndarray,
                 W: np.ndarray, V: np.ndarray, Ws: np.ndarray):
        self.vocab = vocab
        self.d = d
        self.L, self.W, self.V, self.Ws = L, W, V, Ws

    # ---------------------------------------------------------- forward

    def _wvec(self, w: str) -> int:
        return self.vocab.get(w.lower(), self.vocab[UNK])

    def _forward(self, n: _Node):
        """Returns (vec, list of (node, vec, softmax_probs))."""
        rows = []

        def rec(node: _Node) -> np.ndarray:
            if node.word is not None:
                v = self.L[self._wvec(node.word)]
            else:
                kids = [rec(c) for c in node.children]
                if len(kids) == 1:
                    v = kids[0]
                else:
                    c = np.concatenate([kids[0], kids[1]])
                    tensor = np.einsum("i,dij,j->d", c, self.V, c)
                    v = np.tanh(self.W @ np.append(c, 1.0) + tensor)
            node.vec = v
            z = self.Ws @ np.append(v, 1.0)
            z -= z.max()
            p = np.exp(z)
            p /= p.sum()
            rows.append((node, v, p))
            return v

        rec(n)
        return rows

    def predict_tree(self, tree_str: str) -> int:
        """Root 5-class prediction (0..4) for one bracketing."""
        root = _binarize(parse_tree(tree_str))
        rows = self._forward(root)
        return int(np.argmax(rows[-1][2]))

    def predict_label(self, tree_str: str) -> str:
        from corenlp_ray.stages.sentiment import LABELS

        return LABELS[self.predict_tree(tree_str)]

    # --------------------------------------------------------- training

    @classmethod
    def init(cls, vocab_words: Sequence[str], d: int = 10,
             seed: int = 7) -> "RNTN":
        rng = np.random.RandomState(seed)
        words = [UNK] + sorted({w.lower() for w in vocab_words})
        vocab = {w: i for i, w in enumerate(words)}
        r = 1.0 / math.sqrt(2 * d)
        return cls(vocab, d,
                   rng.uniform(-0.001, 0.001, (len(words), d)),
                   rng.uniform(-r, r, (d, 2 * d + 1)),
                   rng.uniform(-r, r, (d, 2 * d, 2 * d)) * 0.01,
                   rng.uniform(-r, r, (N_CLASSES, d + 1)))

    def _backprop(self, root: _Node, grads,
                  root_weight: float = 3.0) -> float:
        """One tree's cost + gradient accumulation (backprop through
        structure, SentimentCostAndGradient.java semantics).
        ``root_weight`` upweights the root's cross-entropy — the
        sentence-level label is the prediction target while interior
        nodes (mostly Neutral) would otherwise dominate the loss."""
        gL, gW, gV, gWs = grads
        loss = 0.0

        def rec(node: _Node, delta_down: np.ndarray) -> float:
            nonlocal loss
            v = node.vec
            z = self.Ws @ np.append(v, 1.0)
            z -= z.max()
            p = np.exp(z)
            p /= p.sum()
            gold = node.label if node.label is not None else 2
            wt = root_weight if node is root else 1.0
            loss += -wt * math.log(max(p[gold], 1e-12))
            dz = wt * (p - _onehot(gold))
            gWs[...] += np.outer(dz, np.append(v, 1.0))
            delta = self.Ws[:, :-1].T @ dz + delta_down
            if node.word is not None:
                gL[self._wvec(node.word)] += delta
                return 0.0
            if len(node.children) == 1:
                rec(node.children[0], delta)
                return 0.0
            # tanh'(h) = 1 - h^2
            delta = delta * (1.0 - v * v)
            a, b = node.children[0].vec, node.children[1].vec
            c = np.concatenate([a, b])
            gW[...] += np.outer(delta, np.append(c, 1.0))
            # tensor grad: dV[k] = delta[k] * outer(c, c)
            gV[...] += delta[:, None, None] * np.outer(c, c)[None, :, :]
            # downstream delta: W^T delta + (V + V^T) c . delta
            dc = self.W[:, :-1].T @ delta
            dc += np.einsum("d,dij,j->i", delta, self.V, c)
            dc += np.einsum("d,dji,j->i", delta, self.V, c)
            rec(node.children[0], dc[:self.d])
            rec(node.children[1], dc[self.d:])
            return 0.0

        rec(root, np.zeros(self.d))
        return loss

    def fit(self, labeled_trees: Sequence[str], n_epochs: int = 40,
            lr: float = 0.05, reg: float = 1e-4, seed: int = 11) -> float:
        """AdaGrad over the treebank; returns final mean loss."""
        roots = [_binarize(parse_tree(t)) for t in labeled_trees]
        hL = np.full_like(self.L, 1e-8)
        hW = np.full_like(self.W, 1e-8)
        hV = np.full_like(self.V, 1e-8)
        hWs = np.full_like(self.Ws, 1e-8)
        rng = np.random.RandomState(seed)
        last = 0.0
        for _ in range(n_epochs):
            order = rng.permutation(len(roots))
            total = 0.0
            for start in range(0, len(order), 8):
                idx = order[start:start + 8]
                gL = np.zeros_like(self.L)
                gW = np.zeros_like(self.W)
                gV = np.zeros_like(self.V)
                gWs = np.zeros_like(self.Ws)
                for i in idx:
                    self._forward(roots[i])
                    total += self._backprop(roots[i],
                                            (gL, gW, gV, gWs))
                for g, w, h in ((gL, self.L, hL), (gW, self.W, hW),
                                (gV, self.V, hV), (gWs, self.Ws, hWs)):
                    g /= len(idx)
                    g += reg * w
                    h += g * g
                    w -= lr * g / np.sqrt(h)
            last = total / max(1, len(roots))
        return last

    @classmethod
    def train(cls, labeled_trees: Sequence[str], d: int = 10,
              n_epochs: int = 40, seed: int = 7) -> "RNTN":
        """PTB-sentiment-format labeled trees → trained model (the
        Stanford Sentiment Treebank path)."""
        words: List[str] = []
        for t in labeled_trees:
            _leaves(parse_tree(t), words)
        model = cls.init(words, d=d, seed=seed)
        model.fit(labeled_trees, n_epochs=n_epochs)
        return model

    @classmethod
    def distill(cls, projected_trees: Sequence[str], d: int = 10,
                n_epochs: int = 40, seed: int = 7) -> "RNTN":
        """Label this engine's projected constituency trees with the
        deterministic tree scorer (root label broadcast to all nodes —
        phrase-level gold needs the licensed treebank) and train."""
        from corenlp_ray.stages.sentiment import LABELS, sentiment_tree

        def relabel(s: str) -> str:
            cls_idx = LABELS.index(sentiment_tree(s))
            root = parse_tree(s)

            def render(n: _Node) -> str:
                if n.word is not None:
                    return "(%d %s)" % (cls_idx, n.word)
                return "(%d %s)" % (cls_idx,
                                    " ".join(render(c)
                                             for c in n.children))

            return render(root)

        return cls.train([relabel(t) for t in projected_trees],
                         d=d, n_epochs=n_epochs, seed=seed)

    # ------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"vocab": self.vocab, "d": self.d,
                       "L": self.L.tolist(), "W": self.W.tolist(),
                       "V": self.V.tolist(), "Ws": self.Ws.tolist()}, f)

    @classmethod
    def load(cls, path: str) -> "RNTN":
        with open(path) as f:
            o = json.load(f)
        return cls(o["vocab"], o["d"], np.array(o["L"]),
                   np.array(o["W"]), np.array(o["V"]),
                   np.array(o["Ws"]))
