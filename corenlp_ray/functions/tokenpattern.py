"""Mini rule engines — the user-extension surface (SURVEY §2.6).

Two pattern languages, both loadable from data files, mirroring the
reference's rule-engines-as-data design:

  * TokenPattern — a TokensRegex-style token-sequence language
    (/root/reference/src/edu/stanford/nlp/ling/tokensregex/
    TokenSequencePattern.java:140). Patterns are sequences of token
    constraints with quantifiers:
        [word:/regex/] [pos:NNP]+ [ner:PERSON]? [lemma:run] []
    Attributes: word, lower, lemma, pos, ner. ``[]`` matches any token.
    Quantifiers: + * ? {m,n}.

  * DepPattern — a semgrex-style dependency pattern
    (/root/reference/src/edu/stanford/nlp/semgraph/semgrex/
    SemgrexPattern.java:239):
        {pos:/VB.*/}=verb >nsubj {ner:PERSON}=subj >obj {}=obj
    One governor node with ``>label {constraint}=name`` child clauses
    (the fragment the KBP/OpenIE banks actually use).

Both compile once (load-time) and match per sentence — pure kernels
pluggable into any map_batches stage; ``TokensRegexNERStage`` shows the
gazetteer-overlay use (TokensRegexNERAnnotator semantics: priority,
only-overwrite-O)."""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

_ATTRS = ("word", "lower", "lemma", "pos", "ner")

_TOK_RE = re.compile(
    r"\[\s*(?:(\w+)\s*:\s*(?:/((?:[^/\\]|\\.)*)/|([^\]\s]+)))?\s*\]"
    r"(\+|\*|\?|\{(\d+),(\d+)\})?")


class _Constraint:
    def __init__(self, attr: Optional[str], regex: Optional[str],
                 literal: Optional[str], min_n: int, max_n: int):
        self.attr = attr
        self.rx = re.compile(regex + r"\Z") if regex is not None else None
        self.literal = literal
        self.min_n = min_n
        self.max_n = max_n

    def ok(self, tok: Dict[str, str]) -> bool:
        if self.attr is None:
            return True
        v = tok.get(self.attr, "")
        if self.rx is not None:
            return bool(self.rx.match(v))
        return v == self.literal


class TokenPattern:
    """Compiled token-sequence pattern; greedy with backtracking."""

    def __init__(self, pattern: str):
        self.src = pattern
        self.steps: List[_Constraint] = []
        pos = 0
        for m in _TOK_RE.finditer(pattern):
            if pattern[pos:m.start()].strip():
                raise ValueError(
                    f"unparsed pattern text {pattern[pos:m.start()]!r}")
            pos = m.end()
            attr, rx, lit, quant, lo, hi = m.groups()
            if attr is not None and attr not in _ATTRS:
                raise ValueError(f"unknown attribute {attr!r}")
            if quant == "+":
                mn, mx = 1, 10**6
            elif quant == "*":
                mn, mx = 0, 10**6
            elif quant == "?":
                mn, mx = 0, 1
            elif quant:
                mn, mx = int(lo), int(hi)
            else:
                mn, mx = 1, 1
            self.steps.append(_Constraint(attr, rx, lit, mn, mx))
        if pattern[pos:].strip():
            raise ValueError(f"unparsed pattern tail {pattern[pos:]!r}")

    def match_at(self, toks: Sequence[Dict[str, str]], start: int) -> Optional[int]:
        """Return end index (exclusive) of a match starting at start."""
        def rec(si: int, ti: int) -> Optional[int]:
            if si == len(self.steps):
                return ti
            st = self.steps[si]
            # count maximal run
            run = 0
            while ti + run < len(toks) and run < st.max_n \
                    and st.ok(toks[ti + run]):
                run += 1
            for take in range(run, st.min_n - 1, -1):  # greedy, backtrack
                out = rec(si + 1, ti + take)
                if out is not None:
                    return out
            return None

        return rec(0, start)

    def find_all(self, toks: Sequence[Dict[str, str]]) -> List[Tuple[int, int]]:
        """Non-overlapping leftmost-longest matches → [(begin, end)]."""
        out = []
        i = 0
        while i < len(toks):
            e = self.match_at(toks, i)
            if e is not None and e > i:
                out.append((i, e))
                i = e
            else:
                i += 1
        return out


def toks_of(words, lemmas=None, tags=None, ners=None) -> List[Dict[str, str]]:
    n = len(words)
    lemmas = lemmas or [""] * n
    tags = tags or [""] * n
    ners = ners or [""] * n
    return [{"word": w, "lower": w.lower(), "lemma": l, "pos": p, "ner": e}
            for w, l, p, e in zip(words, lemmas, tags, ners)]


# ------------------------------------------------------------ dep pattern ----

_NODE_RE = re.compile(
    r"\{\s*(?:(\w+)\s*:\s*(?:/((?:[^/\\]|\\.)*)/|([^}\s]+)))?\s*\}"
    r"(?:=(\w+))?")
_EDGE_RE = re.compile(r"([<>])(?:/((?:[^/\\]|\\.)*)/|(\S+))")


class _EdgeMatcher:
    """Edge-label matcher: literal or /regex/ (semgrex relation syntax,
    e.g. >/nmod|obl/ or >nsubj)."""

    __slots__ = ("lit", "rx")

    def __init__(self, rx: str | None, lit: str | None):
        self.lit = lit
        self.rx = re.compile(rx) if rx is not None else None

    def ok(self, label: str) -> bool:
        if self.rx is not None:
            return self.rx.fullmatch(label) is not None
        return label == self.lit


class _DepNode:
    """One node in a (possibly nested) dep pattern tree: a conjunction
    of attribute constraints (optionally negated) plus a list of
    semgrex relations to other nodes."""

    __slots__ = ("conss", "negate", "name", "rels")

    def __init__(self, conss, negate: bool, name: str):
        self.conss = conss          # list of _Constraint (ANDed)
        self.negate = negate
        self.name = name
        # (op, _EdgeMatcher|None, _DepNode); op: child parent desc anc conn
        self.rels: List[tuple] = []

    @property
    def cons(self):
        """First constraint (back-compat accessor for gate builders);
        negated nodes expose match-any so gates stay sound."""
        if self.negate or not self.conss:
            return _Constraint(None, None, None, 1, 1)
        return self.conss[0]

    @property
    def children(self):
        return [(e, n) for op, e, n in self.rels if op == "child"]

    def ok(self, tok) -> bool:
        hit = all(c.ok(tok) for c in self.conss)
        return (not hit) if self.negate else hit


_REL_OPS = ("<<", ">>", "<>", ">", "<")
_OP_KIND = {">": "child", "<": "parent", ">>": "desc", "<<": "anc",
            "<>": "conn"}


class DepPattern:
    """Semgrex-style dependency pattern (semgraph/semgrex/
    SemgrexPattern.java:239 relation set, the subset the engine's rule
    banks and the reference's own SemgrexTest cases exercise):

        {pos:/VB.*/}=v >nsubj {ner:PERSON}=s >obj {}=o
        {word:muffins} >compound {word:blueberry}
        {} << {word:ate}        ancestor (transitive governor)
        {} >> {tag:NNP}         descendant (transitive dependent)
        {} <> {word:muffins}    connected (direct parent or child)
        {word:Bill;tag:NNP}     attribute conjunction  (tag == pos)
        !{word:ate}             negated node
        >/nmod|obl/ ( {}=o >case {lemma:of} )   regex edges + nesting

    Edge labels are optional on > and < (bare = any label) and not
    supported on the transitive ops. Behavior is pinned by
    tests/test_semgrex_reference.py (mirrored from the reference's own
    SemgrexTest.java)."""

    def __init__(self, pattern: str):
        self.src = pattern
        self._auto = 0
        self.root, rest = self._parse_node(pattern.strip())
        if rest.strip():
            raise ValueError(f"trailing input {rest!r} in {pattern!r}")

    # ------------------------------------------------------- parsing ----
    _ATTR_RE = re.compile(
        r"\s*(\w+)\s*:\s*(?:/((?:[^/\\]|\\.)*)/|([^};\s]+))\s*")
    _NAME_RE = re.compile(r"=(\w+)")
    _EDGE_LABEL_RE = re.compile(r"/((?:[^/\\]|\\.)*)/|([^\s({<>=]+)")

    def _parse_nodespec(self, s: str) -> Tuple[_DepNode, str]:
        s = s.lstrip()
        negate = False
        if s.startswith("!"):
            negate = True
            s = s[1:].lstrip()
        if not s.startswith("{"):
            raise ValueError(f"expected node at {s!r}")
        s = s[1:]
        conss = []
        while True:
            s = s.lstrip()
            if s.startswith("}"):
                s = s[1:]
                break
            m = self._ATTR_RE.match(s)
            if not m:
                raise ValueError(f"bad node attribute at {s!r}")
            attr, rx, lit = m.groups()
            if attr == "tag":
                attr = "pos"            # semgrex alias
            if attr not in _ATTRS:
                raise ValueError(f"unknown attribute {attr!r}")
            conss.append(_Constraint(attr, rx, lit, 1, 1))
            s = s[m.end():].lstrip()
            if s.startswith(";"):
                s = s[1:]
        name = None
        nm = self._NAME_RE.match(s)
        if nm:
            name = nm.group(1)
            s = s[nm.end():]
        if name is None:
            name = "gov" if self._auto == 0 else f"c{self._auto - 1}"
        self._auto += 1
        return _DepNode(conss, negate, name), s

    def _parse_node(self, s: str) -> Tuple[_DepNode, str]:
        node, s = self._parse_nodespec(s)
        while True:
            s = s.lstrip()
            op = next((o for o in _REL_OPS if s.startswith(o)), None)
            if op is None:
                break
            s = s[len(op):].lstrip()
            edge = None
            if op in (">", "<"):
                em = self._EDGE_LABEL_RE.match(s)
                if em and not s.startswith(("{", "(", "!")):
                    edge = _EdgeMatcher(em.group(1), em.group(2))
                    s = s[em.end():].lstrip()
            if s.startswith("("):
                other, s = self._parse_node(s[1:])
                s = s.lstrip()
                if not s.startswith(")"):
                    raise ValueError(f"expected ')' at {s!r}")
                s = s[1:]
            else:
                other, s = self._parse_nodespec(s)
            node.rels.append((_OP_KIND[op], edge, other))
        return node, s

    # ------------------------------------------------------ matching ----
    @staticmethod
    def _descendants(g, kids):
        out = []
        stack = list(kids.get(g, ()))
        while stack:
            c = stack.pop(0)
            out.append(c)
            stack.extend(kids.get(c, ()))
        return out

    @staticmethod
    def _ancestors(g, heads, n):
        out = []
        seen = set()
        h = heads[g] if g < len(heads) else -1
        while 0 <= h < n and h not in seen:
            out.append(h)
            seen.add(h)
            h = heads[h] if h < len(heads) else -1
        return out

    def _match_node(self, node, g, toks, kids, labels, heads):
        if not node.ok(toks[g]):
            return []
        bind_sets = [{node.name: g}]
        n = len(toks)
        for op, edge, other in node.rels:
            if op == "child":
                cands = [c for c in kids.get(g, ())
                         if edge is None or edge.ok(labels[c])]
            elif op == "parent":
                h = heads[g] if g < len(heads) else -1
                cands = [h] if 0 <= h < n and (
                    edge is None or edge.ok(labels[g])) else []
            elif op == "desc":
                cands = self._descendants(g, kids)
            elif op == "anc":
                cands = self._ancestors(g, heads, n)
            else:                       # conn: direct parent + children
                h = heads[g] if g < len(heads) else -1
                cands = ([h] if 0 <= h < n else []) +                     list(kids.get(g, ()))
            new_sets = []
            for c in cands:
                for sub in self._match_node(other, c, toks, kids,
                                            labels, heads):
                    for bs in bind_sets:
                        merged = dict(bs)
                        merged.update(sub)
                        new_sets.append(merged)
            bind_sets = new_sets
            if not bind_sets:
                return []
        return bind_sets

    def match(self, toks: Sequence[Dict[str, str]], heads: Sequence[int],
              labels: Sequence[str]) -> List[Dict[str, int]]:
        """All bindings {name: token_index} (sentence-local heads)."""
        kids: Dict[int, List[int]] = {}
        for i, h in enumerate(heads):
            if h >= 0:
                kids.setdefault(h, []).append(i)
        out = []
        for g in range(len(toks)):
            out.extend(self._match_node(self.root, g, toks, kids,
                                        labels, heads))
        return out

    @property
    def gov(self):
        return self.root.cons

    @property
    def gov_name(self):
        return self.root.name


# ------------------------------------------------- TokensRegexNER overlay ----

class TokensRegexNERStage:
    """Gazetteer overlay stage from mapping entries
    ``(pattern, type, priority)`` — TokensRegexNERAnnotator semantics:
    longest/priority wins, only overwrites 'O' tokens. Entries compile
    once per actor (__init__)."""

    def __init__(self, entries: Sequence[Tuple[str, str, float]]):
        self.rules = sorted(
            ((TokenPattern(p), t, pr) for p, t, pr in entries),
            key=lambda r: -r[2])

    def apply(self, words, lemmas, tags, ners) -> List[str]:
        toks = toks_of(words, lemmas, tags, ners)
        out = list(ners)
        for pat, typ, _pr in self.rules:
            for b, e in pat.find_all(toks):
                if all(out[k] == "O" for k in range(b, e)):
                    for k in range(b, e):
                        out[k] = typ
        return out

    def __call__(self, batch):
        import pyarrow as pa

        ner_c = []
        words_col = batch.column("tok_word").to_pylist()
        lem_col = batch.column("tok_lemma").to_pylist()
        pos_col = batch.column("tok_pos").to_pylist()
        ner_col = batch.column("tok_ner").to_pylist()
        for words, lemmas, tags, ners in zip(words_col, lem_col, pos_col,
                                             ner_col):
            ner_c.append(self.apply(words, lemmas, tags, ners))
        idx = batch.schema.get_field_index("tok_ner")
        return batch.set_column(idx, "tok_ner",
                                pa.array(ner_c, type=pa.list_(pa.string())))


def load_mapping_file(path: str) -> List[Tuple[str, str, float]]:
    """TSV mapping file: pattern \\t TYPE [\\t priority] — the
    TokensRegexNER file format (header comments with #)."""
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            pr = float(parts[2]) if len(parts) > 2 else 0.0
            out.append((parts[0], parts[1], pr))
    return out
