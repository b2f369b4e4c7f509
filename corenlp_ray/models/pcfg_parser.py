"""Trainable PCFG constituency parser — the ParserAnnotator /
LexicalizedParser slot (pipeline/ParserAnnotator.java:40;
parser/lexparser/LexicalizedParser.java) in reduced form: a
relative-frequency PCFG over POS-tag terminals with right
binarization and unary closure, decoded by CKY Viterbi.

Shape mirrors the other statistical slots (perceptron_tagger,
transition_parser): ``train`` consumes gold PTB bracketings (a licensed
treebank drops straight in), ``distill`` learns the deterministic
dep→constituency projection's trees (stages/parse_tree.py) so the
weighted inference path is real without shippable gold, JSON
``save``/``load`` pin weights, and the actor stage loads once per
actor (``WeightedParseTree`` in stages/parse_tree.py via
``pipelines.kg.register_weighted_models(parse_model_path=...)``).

Like the reference's ``parse.maxlen`` guard (ParserAnnotator.java:126
falls back to a flat X tree over-length), sentences longer than
``max_len`` fall back to the deterministic projection — CKY is O(n³).
Terminals are POS tags (the reference's tagged-parse mode), so the
grammar stays small and decoding is grammar-bounded, not
vocabulary-bounded.
"""
from __future__ import annotations

import json
import math
import re
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

_TOKEN_RE = re.compile(r"\(|\)|[^()\s]+")


def parse_bracketing(s: str):
    """PTB bracketing string → nested (label, children) tuples; leaves
    are (tag, word) pairs."""
    toks = _TOKEN_RE.findall(s)
    pos = 0

    def rd():
        nonlocal pos
        assert toks[pos] == "(", toks[pos:pos + 3]
        pos += 1
        label = toks[pos]
        pos += 1
        children = []
        while toks[pos] != ")":
            if toks[pos] == "(":
                children.append(rd())
            else:                       # terminal word under a preterminal
                word = toks[pos]
                pos += 1
                assert toks[pos] == ")", toks[pos:pos + 3]
                pos += 1                # consume the leaf's ')'
                return (label, word)    # leaf: (tag, word)
        pos += 1
        return (label, children)

    out = rd()
    return out


def _is_leaf(node) -> bool:
    return isinstance(node[1], str)


def _binarize(label: str, children: list) -> list:
    """Right binarization with @-intermediate labels (the reference's
    binarizedParseTree convention, TreeBinarizer)."""
    rules = []

    def walk(lab, kids):
        syms = []
        for c in kids:
            if _is_leaf(c):
                syms.append(c[0])
                rules.append(("lex", c[0], c[0]))   # preterminal → tag
            else:
                syms.append(c[0])
                walk(c[0], c[1])
        if len(syms) == 1:
            rules.append(("unary", lab, syms[0]))
        elif len(syms) == 2:
            rules.append(("binary", lab, syms[0], syms[1]))
        else:
            # A → B C D E ⇒ A → B @A, @A → C @A, @A → D E
            inter = "@" + lab
            rules.append(("binary", lab, syms[0], inter))
            for i in range(1, len(syms) - 2):
                rules.append(("binary", inter, syms[i], inter))
            rules.append(("binary", inter, syms[-2], syms[-1]))
        return rules

    walk(label, children)
    return rules


class PcfgParser:
    """Viterbi-CKY PCFG over POS-tag terminals."""

    def __init__(self, binary: Dict, unary: Dict, root: str = "ROOT",
                 max_len: int = 40):
        # binary: {(B, C): [(A, logp), ...]}; unary: {B: [(A, logp), ...]}
        self.binary = binary
        self.unary = unary
        self.root = root
        self.max_len = max_len

    # ------------------------------------------------------------ train

    @classmethod
    def train(cls, bracketings: Sequence[str], add_k: float = 0.1,
              max_len: int = 40) -> "PcfgParser":
        bin_counts: Dict[Tuple[str, str, str], float] = defaultdict(float)
        un_counts: Dict[Tuple[str, str], float] = defaultdict(float)
        lhs_counts: Dict[str, float] = defaultdict(float)
        for s in bracketings:
            root = parse_bracketing(s)
            if _is_leaf(root):
                continue
            for rule in _binarize(root[0], root[1]):
                if rule[0] == "binary":
                    _, a, b, c = rule
                    bin_counts[(a, b, c)] += 1
                    lhs_counts[a] += 1
                elif rule[0] == "unary":
                    _, a, b = rule
                    if a != b:          # self-unaries add nothing
                        un_counts[(a, b)] += 1
                        lhs_counts[a] += 1
        binary: Dict = {}
        for (a, b, c), n in bin_counts.items():
            lp = math.log((n + add_k)
                          / (lhs_counts[a] + add_k * len(bin_counts)))
            binary.setdefault((b, c), []).append((a, lp))
        unary: Dict = {}
        for (a, b), n in un_counts.items():
            lp = math.log((n + add_k)
                          / (lhs_counts[a] + add_k * len(un_counts)))
            unary.setdefault(b, []).append((a, lp))
        return cls(binary, unary, max_len=max_len)

    @classmethod
    def distill(cls, sentences: Sequence[Tuple[List[str], List[str]]],
                max_len: int = 40) -> "PcfgParser":
        """Teacher = the deterministic projection (stages/parse_tree.py):
        pos-tag + dep-parse each sentence with the cascades, project,
        learn those trees. A treebank drops into ``train`` instead."""
        from corenlp_ray.stages.depparse import parse_sentence
        from corenlp_ray.stages.parse_tree import dep_to_constituency

        trees = []
        for words, tags in sentences:
            if not words:
                continue
            heads, _ = parse_sentence(words, tags)
            trees.append(dep_to_constituency(words, tags, heads))
        return cls.train(trees, max_len=max_len)

    # ----------------------------------------------------------- decode

    def _close_unaries(self, cell: Dict[str, Tuple[float, tuple]]):
        """Apply unary rules to a CKY cell to fixpoint (closure depth is
        tiny for these grammars)."""
        agenda = list(cell.items())
        while agenda:
            b, (lp, _bp) = agenda.pop()
            for a, rlp in self.unary.get(b, ()):
                cand = lp + rlp
                if a not in cell or cand > cell[a][0]:
                    cell[a] = (cand, ("u", b))
                    agenda.append((a, cell[a]))

    def parse(self, words: List[str], tags: List[str]) -> Optional[str]:
        """(words, tags) → best PTB bracketing, or None when the grammar
        can't derive the tag sequence or the sentence exceeds max_len."""
        n = len(tags)
        if n == 0 or n > self.max_len:
            return None
        # chart[i][j] = {symbol: (logp, backpointer)} over span [i, j)
        chart: List[List[Dict]] = [[{} for _ in range(n + 1)]
                                   for _ in range(n + 1)]
        for i, t in enumerate(tags):
            cell = {t: (0.0, ("t", i))}
            self._close_unaries(cell)
            chart[i][i + 1] = cell
        for span in range(2, n + 1):
            for i in range(0, n - span + 1):
                j = i + span
                cell = chart[i][j]
                for k in range(i + 1, j):
                    left, right = chart[i][k], chart[k][j]
                    if not left or not right:
                        continue
                    for b, (lb, _) in left.items():
                        for c, (lc, _) in right.items():
                            for a, rlp in self.binary.get((b, c), ()):
                                cand = lb + lc + rlp
                                if a not in cell or cand > cell[a][0]:
                                    cell[a] = (cand, ("b", k, b, c))
                self._close_unaries(cell)
        top = chart[0][n]
        sym = self.root if self.root in top else \
            (max(top, key=lambda s: top[s][0]) if top else None)
        if sym is None:
            return None

        def build(i, j, s) -> str:
            lp, bp = chart[i][j][s]
            if bp[0] == "t":
                k = bp[1]
                leaf = f"({tags[k]} {_esc(words[k])})"
                return leaf if s == tags[k] else f"({_strip(s)} {leaf})"
            if bp[0] == "u":
                inner = build(i, j, bp[1])
                return inner if s.startswith("@") else \
                    f"({_strip(s)} {inner})"
            _, k, b, c = bp
            parts = f"{build(i, k, b)} {build(k, j, c)}"
            return parts if s.startswith("@") else f"({_strip(s)} {parts})"

        out = build(0, n, sym)
        return out if sym == "ROOT" else f"(ROOT {out})"

    # ------------------------------------------------------ persistence

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump({
                "root": self.root, "max_len": self.max_len,
                "binary": [[b, c, a, lp] for (b, c), rules
                           in self.binary.items() for a, lp in rules],
                "unary": [[b, a, lp] for b, rules in self.unary.items()
                          for a, lp in rules],
            }, fh)

    @classmethod
    def load(cls, path: str) -> "PcfgParser":
        with open(path) as fh:
            d = json.load(fh)
        binary: Dict = {}
        for b, c, a, lp in d["binary"]:
            binary.setdefault((b, c), []).append((a, lp))
        unary: Dict = {}
        for b, a, lp in d["unary"]:
            unary.setdefault(b, []).append((a, lp))
        return cls(binary, unary, root=d["root"], max_len=d["max_len"])


def _esc(tok: str) -> str:
    return tok.replace("(", "-LRB-").replace(")", "-RRB-")


def _strip(sym: str) -> str:
    return sym
