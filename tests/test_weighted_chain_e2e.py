"""End-to-end integration of ALL trainable statistical slots at once:
distill tiny pos / depparse / kbp / coref models, register every
weighted path (the reference's equivalent: pointing pos.model /
depparse.model / kbp.model / coref.algorithm at .ser.gz files), and run
the full distributed annotate → extract chain with the pinned-weight
actor pools. Guards the slot composition — each swap is unit-tested
alone; this pins that they coexist in one pipeline."""
import pyarrow as pa
import pytest

from corenlp_ray.api import Document

DOCS = [
    "John Smith works for Acme Corp. He leads Acme Corp.",
    "Mary Johnson was born in Springfield. Johnson lives there.",
    "Robert Brown studies robotics. Brown visited Georgetown.",
    "Globex Inc. acquired Initech. Globex Inc. grew quickly.",
    "Patricia Davis met Linda Martinez. Davis greeted Martinez.",
    "Stark Industries is headquartered in Madison.",
]


def _annotated_rows():
    rows = []
    for text in DOCS:
        d = Document(text)
        d._need(*Document._transitive("kbp"))
        rows.append(dict(d._row))
    return rows


@pytest.fixture(scope="module")
def model_paths(tmp_path_factory):
    from corenlp_ray.models.coref_ranker import CorefRanker
    from corenlp_ray.models.kbp_classifier import KbpClassifier
    from corenlp_ray.models.perceptron_tagger import PerceptronTagger
    from corenlp_ray.models.transition_parser import TransitionParser
    from corenlp_ray.stages.kbp import Mention

    tmp = tmp_path_factory.mktemp("weighted")
    rows = _annotated_rows()
    sents, kbp_sents, coref_docs = [], [], []
    for r in rows:
        men = list(zip(r["men_begin"], r["men_end"], r["men_ner"],
                       r["men_norm"]))
        coref_docs.append((r["tok_word"], r["tok_pos"], r["tok_sent"],
                           men))
        mens = [Mention(b, e, ty, nv, cv) for b, e, ty, nv, cv in zip(
            r["men_begin"], r["men_end"], r["men_ner"], r["men_norm"],
            r["men_canonical"])]
        ners = ["O"] * len(r["tok_word"])
        for m in mens:
            for k in range(m.b, min(m.e, len(ners))):
                ners[k] = m.type
        for b, e in zip(r["sent_begin"], r["sent_end"]):
            sents.append((r["tok_word"][b:e], r["tok_pos"][b:e]))
            heads = [(h - b) if h >= 0 else -1 for h in r["dep_head"][b:e]]
            l_mens = [Mention(m.b - b, m.e - b, m.type, m.norm,
                              m.canonical)
                      for m in mens if b <= m.b and m.e <= e]
            kbp_sents.append((r["tok_word"][b:e], r["tok_pos"][b:e],
                              r["tok_lemma"][b:e], heads,
                              r["dep_label"][b:e], ners[b:e], l_mens))
    paths = {}
    for name, model in (
            ("pos", PerceptronTagger.distill([w for w, _ in sents],
                                             n_iter=4)),
            ("dep", TransitionParser.distill(sents, n_iter=3)),
            ("kbp", KbpClassifier.distill(kbp_sents, n_iter=4)),
            ("coref", CorefRanker.distill(coref_docs, n_iter=4))):
        p = str(tmp / f"{name}.json")
        model.save(p)
        paths[name] = p
    return paths


def test_all_weighted_slots_compose(ray_session, model_paths):
    """Full distributed chain with every statistical slot registered:
    weighted pos + depparse + coref actor pools, kbp ensemble with the
    classifier fallback — produces triples with the flagship schema."""
    import ray.data as rd

    from corenlp_ray.pipelines import kg as kg_mod
    from corenlp_ray.pipelines import registry
    from corenlp_ray.pipelines.registry import apply

    saved = {n: registry.get(n) for n in ("pos", "depparse", "coref")}
    saved_kbp = kg_mod._KBP_MODEL_PATH
    try:
        kg_mod.register_weighted_models(
            pos_model_path=model_paths["pos"],
            dep_model_path=model_paths["dep"],
            kbp_model_path=model_paths["kbp"],
            coref_model_path=model_paths["coref"])
        docs = rd.from_arrow(pa.Table.from_pydict(
            {"url": [str(i) for i in range(len(DOCS))],
             "text": list(DOCS)},
            schema=pa.schema([("url", pa.string()),
                              ("text", pa.string())])))
        ann = apply(docs, ("lemma", "depparse", "coref"),
                    distributed=True)
        triples = kg_mod.extract_triples(ann, distributed=True)
        t = pa.concat_tables(
            [b for b in triples.iter_batches(batch_format="pyarrow")]
            or [pa.Table.from_pydict({})])
        assert t.num_rows > 0
        for c in ("url", "subj", "pred", "obj", "confidence", "source"):
            assert c in t.column_names, c
        assert set(t.column("source").to_pylist()) <= {"openie", "kbp"}
    finally:
        for st in saved.values():
            registry.register(st)
        kg_mod._KBP_MODEL_PATH = saved_kbp
    assert registry.get("pos").fn.__name__ != "WeightedPosTagger"
