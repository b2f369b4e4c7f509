"""Cross-product determinism pins for the planted annotation-chain
oracles (pipelines/planted.py): every (template × slot) combination the
modular-arithmetic plant can produce must yield EXACTLY the mention /
triple set the SQL oracle computes — via the same per-doc kernels the
distributed stages run (kernel identity is pinned by
tests/test_fused_vs_staged.py)."""
from corenlp_ray.api import Document
from corenlp_ray.pipelines.planted import (
    KBP_PLANTED_TEMPLATES, _kbp_slots, _kbp_text, _mention_text,
    _openie_text)
from corenlp_ray.sources.pages import CITIES, ORGS, PERSONS, TOPICS


def _mentions(text):
    d = Document(text)
    d._need(*Document._transitive("ner"))
    r = d._row
    w = r["tok_word"]
    return [(" ".join(w[b:e]), t, nv)
            for b, e, t, nv in zip(r["men_begin"], r["men_end"],
                                   r["men_ner"], r["men_norm"])]


def _triples(text, source):
    d = Document(text)
    d._ensure_triples()
    t = d._triples_tbl
    return {(s, p, o) for s, p, o, src in zip(
        t.column("subj").to_pylist(), t.column("pred").to_pylist(),
        t.column("obj").to_pylist(), t.column("source").to_pylist())
        if src == source}


def test_mention_plant_full_cross_product():
    # 420 = lcm(12, 10, 28) / 4 cycles the person/city/day combinations;
    # doc_ids beyond the lcm repeat these exact texts
    for i in range(420):
        P, C, D = PERSONS[i % 12], CITIES[i % 10], i % 28 + 1
        got = _mentions(_mention_text(i))
        assert got == [(P, "PERSON", P), (C, "LOCATION", C),
                       (f"January {D} , 2003", "DATE",
                        "2003-01-%02d" % D)], (i, got)


def test_kbp_plant_full_cross_product():
    # 420 = lcm(7 templates, 12 persons, 10 orgs/cities)
    for i in range(420):
        s = _kbp_slots(i)
        _, rels = KBP_PLANTED_TEMPLATES[i % 7]
        want = {(s.get(a, a), rel, s.get(b, b)) for a, rel, b in rels}
        got = _triples(_kbp_text(i), "kbp")
        assert got == want, (i, _kbp_text(i), got, want)


def test_openie_plant_full_cross_product():
    # 60 = lcm(4 templates, 12 persons, 5 topics, 10 orgs)
    for i in range(120):
        t = i % 4
        if t == 0:
            want = {("cats", "have", "tails")}
        elif t == 1:
            want = {("rabbits", "eat", "vegetables")}
        elif t == 2:
            want = {(PERSONS[i % 12], "studies", TOPICS[i % 5])}
        else:
            want = {(ORGS[i % 10], "acquired", ORGS[(i + 3) % 10])}
        got = _triples(_openie_text(i), "openie")
        assert got == want, (i, _openie_text(i), got, want)
