"""Simple API — the analogue of the reference's ``simple`` package
(/root/reference/src/edu/stanford/nlp/simple/Document.java,
Sentence.java): wrap a text, lazily run exactly the stages each accessor
needs, cache results. Demand-driven annotation over the same kernels the
distributed pipeline uses — handy for exploration and for writing tests;
NOT the scale path (that is the Dataset pipeline).

    >>> from corenlp_ray.api import Document
    >>> d = Document("Some cats have tails. They purr.")
    >>> d.sentences()[0].words()
    ['Some', 'cats', 'have', 'tails', '.']
    >>> d.sentences()[0].openie()
    {('cats', 'have', 'tails')}
"""
from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import pyarrow as pa

from corenlp_ray.sources.pages import PAGES_SCHEMA


class Document:
    def __init__(self, text: str, docdate: Optional[str] = None):
        self.text = text
        self.docdate = docdate
        self._row: Dict = {}
        self._done: set = set()
        self._triples_tbl = None

    # ------------------------------------------------------ lazy driving ----

    def _table(self) -> pa.Table:
        ts = 0
        if self.docdate:
            import datetime as _dt

            d = _dt.datetime.fromisoformat(self.docdate)
            ts = int(d.timestamp() * 1_000_000)
        return pa.Table.from_pylist([{
            "url": "simple://doc", "warc_ts": ts, "html": b"",
            "text": self.text, "lang": "en"}], schema=PAGES_SCHEMA)

    def _need(self, *stages: str):
        todo = [s for s in stages if s not in self._done]
        if not todo:
            return
        from corenlp_ray.stages.coref import coref_batch
        from corenlp_ray.stages.depparse import depparse_batch
        from corenlp_ray.stages.lemma import lemma_batch
        from corenlp_ray.stages.ner import ner_batch
        from corenlp_ray.stages.pos import pos_batch
        from corenlp_ray.stages.tokenize import tokenize_ssplit_batch

        order = [("tokenize", tokenize_ssplit_batch, ()),
                 ("pos", pos_batch, ("tokenize",)),
                 ("lemma", lemma_batch, ("pos",)),
                 ("ner", ner_batch, ("pos",)),
                 ("depparse", depparse_batch, ("pos",)),
                 ("coref", coref_batch, ("ner",))]
        tbl = self._tbl if self._done else self._table()
        for name, fn, reqs in order:
            wanted = name in todo or any(
                name in self._transitive(s) for s in todo)
            if name in self._done or not wanted:
                continue
            tbl = fn(tbl)
            self._done.add(name)
        self._tbl = tbl
        self._row = tbl.to_pylist()[0]

    @staticmethod
    def _transitive(stage: str) -> Tuple[str, ...]:
        chains = {
            "tokenize": ("tokenize",),
            "pos": ("tokenize", "pos"),
            "lemma": ("tokenize", "pos", "lemma"),
            "ner": ("tokenize", "pos", "ner"),
            "depparse": ("tokenize", "pos", "depparse"),
            "coref": ("tokenize", "pos", "ner", "coref"),
            "openie": ("tokenize", "pos", "lemma", "ner", "depparse",
                       "coref"),
            "kbp": ("tokenize", "pos", "lemma", "ner", "depparse",
                    "coref"),
        }
        return chains[stage]

    def _ensure_triples(self):
        if self._triples_tbl is not None:
            return
        self._need(*self._transitive("openie"))
        from corenlp_ray.pipelines.kg import TripleExtractor

        self._triples_tbl = TripleExtractor()(self._tbl)

    # ---------------------------------------------------------- accessors ----

    def sentences(self) -> List["Sentence"]:
        self._need("tokenize")
        return [Sentence(self, i)
                for i in range(len(self._row["sent_begin"]))]

    def coref_chains(self) -> Dict[int, List[str]]:
        self._need(*self._transitive("coref"))
        chains: Dict[int, List[str]] = {}
        r = self._row
        for mi, c in enumerate(r["men_chain"]):
            surface = " ".join(
                r["tok_word"][r["men_begin"][mi]:r["men_end"][mi]])
            chains.setdefault(c, []).append(surface)
        return {k: v for k, v in chains.items() if len(v) > 1}

    def kbp(self) -> Set[Tuple[str, str, str]]:
        self._ensure_triples()
        t = self._triples_tbl
        return {(s, p, o) for s, p, o, src in zip(
            t.column("subj").to_pylist(), t.column("pred").to_pylist(),
            t.column("obj").to_pylist(), t.column("source").to_pylist())
            if src == "kbp"}

    def relations(self) -> Set[Tuple[str, str, str]]:
        """ACE-style relation mentions (the `relation` annotator,
        stages/relation.py — Roth/Yih inventory)."""
        self._need(*dict.fromkeys(self._transitive("lemma")
                                  + self._transitive("ner")
                                  + self._transitive("depparse")))
        from corenlp_ray.stages.relation import relation_batch

        tbl = self._tbl
        if "url" not in tbl.schema.names:
            tbl = tbl.append_column("url", pa.array(["simple://doc"]))
        out = relation_batch(tbl)
        return {(s, r, o) for s, r, o in zip(
            out.column("subj").to_pylist(), out.column("rel").to_pylist(),
            out.column("obj").to_pylist())}

    def sentiments(self) -> List[str]:
        """Per-sentence 5-class sentiment over projected trees (the
        SentimentAnnotator slot, stages/sentiment.sentiment_tree)."""
        self._need(*self._transitive("depparse"))
        from corenlp_ray.stages.parse_tree import parse_tree_batch
        from corenlp_ray.stages.sentiment import sentiment_tree

        trees = parse_tree_batch(self._tbl) \
            .column("parse_tree").to_pylist()[0]
        return [sentiment_tree(t) for t in trees]


class Sentence:
    def __init__(self, doc: Document, idx: int):
        self.doc = doc
        self.idx = idx

    def _span(self):
        r = self.doc._row
        return r["sent_begin"][self.idx], r["sent_end"][self.idx]

    def words(self) -> List[str]:
        b, e = self._span()
        return self.doc._row["tok_word"][b:e]

    def pos_tags(self) -> List[str]:
        self.doc._need(*Document._transitive("pos"))
        b, e = self._span()
        return self.doc._row["tok_pos"][b:e]

    def lemmas(self) -> List[str]:
        self.doc._need(*Document._transitive("lemma"))
        b, e = self._span()
        return self.doc._row["tok_lemma"][b:e]

    def ner_tags(self) -> List[str]:
        self.doc._need(*Document._transitive("ner"))
        b, e = self._span()
        return self.doc._row["tok_ner"][b:e]

    def dependencies(self) -> List[Tuple[int, str, int]]:
        """[(head_idx, label, dep_idx)] sentence-local, -1 = root."""
        self.doc._need(*Document._transitive("depparse"))
        b, e = self._span()
        r = self.doc._row
        out = []
        for k in range(b, e):
            h = r["dep_head"][k]
            out.append(((h - b) if h >= 0 else -1, r["dep_label"][k],
                        k - b))
        return out

    def openie(self) -> Set[Tuple[str, str, str]]:
        self.doc._ensure_triples()
        t = self.doc._triples_tbl
        return {(s, p, o) for s, p, o, si, src in zip(
            t.column("subj").to_pylist(), t.column("pred").to_pylist(),
            t.column("obj").to_pylist(), t.column("sent_idx").to_pylist(),
            t.column("source").to_pylist())
            if si == self.idx and src == "openie"}
