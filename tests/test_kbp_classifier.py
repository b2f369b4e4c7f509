"""KBP statistical extractor slot (models/kbp_classifier.py) — the
trainable analogue of the reference's logistic-regression KBP model
(ie/KBPStatisticalExtractor.java featurizer :246-545, ensemble contract
KBPEnsembleExtractor.java:58-66: rules first, statistical fallback)."""
import json

import pyarrow as pa
import pytest

from corenlp_ray.api import Document
from corenlp_ray.models.kbp_classifier import (NO_RELATION, KbpClassifier,
                                               candidate_pairs,
                                               kbp_features)
from corenlp_ray.stages.kbp import KbpExtractor, Mention

TRAIN_SENTS = [
    "John Smith works for Acme Corp.",
    "Mary Johnson works for Globex Inc.",
    "Robert Brown works for Initech.",
    "Patricia Davis works for Umbrella Group.",
    "David Anderson works for Stark Industries.",
    "John Smith was born in Springfield.",
    "Mary Johnson was born in Riverside.",
    "Robert Brown was born in Fairview.",
    "Patricia Davis was born in Georgetown.",
    "Linda Martinez was born in Madison.",
    "John Smith met Mary Johnson.",
    "Robert Brown met Patricia Davis yesterday.",
    "Acme Corp. hired twelve engineers.",
]


def _annotated(text):
    doc = Document(text)
    doc._need(*Document._transitive("kbp"))
    r = doc._row
    mens = [Mention(b, e, ty, nv, cv) for b, e, ty, nv, cv in zip(
        r["men_begin"], r["men_end"], r["men_ner"], r["men_norm"],
        r["men_canonical"])]
    ners = ["O"] * len(r["tok_word"])
    for m in mens:
        for k in range(m.b, min(m.e, len(ners))):
            ners[k] = m.type
    heads = [h for h in r["dep_head"]]
    return (r["tok_word"], r["tok_pos"], r["tok_lemma"], heads,
            r["dep_label"], ners, mens)


@pytest.fixture(scope="module")
def distilled(tmp_path_factory):
    sents = [_annotated(t) for t in TRAIN_SENTS]
    clf = KbpClassifier.distill(sents, n_iter=8, neg_keep=1)
    path = str(tmp_path_factory.mktemp("kbp") / "kbp_clf.json")
    clf.save(path)
    return clf, path


def test_featurizer_has_reference_template_groups():
    words, tags, lemmas, heads, labels, ners, mens = _annotated(
        "John Smith works for Acme Corp.")
    s = next(m for m in mens if m.type == "PERSON")
    o = next(m for m in mens if m.type == "ORGANIZATION")
    f = set(kbp_features(words, lemmas, tags, ners, heads, labels,
                         (s.b, s.e), (o.b, o.e), s.type, o.type))
    assert "type_sig=PERSON,ORGANIZATION" in f
    assert "subj_before_obj=y" in f
    assert "lemma_uni=work" in f
    assert any(x.startswith("dist=") for x in f)
    assert any(x.startswith("dep_path=") for x in f)
    assert any(x.startswith("subj_left=") for x in f)


def test_distilled_recovers_rule_decision_on_heldout(distilled):
    clf, _ = distilled
    # held-out: unseen PERSON/ORG fillers in a trained construction
    words, tags, lemmas, heads, labels, ners, mens = _annotated(
        "Susan Clark works for Hooli.")
    pairs = candidate_pairs(words, tags, lemmas, heads, labels, ners, mens)
    got = {(s.canonical, clf.predict(f, s.type, o.type)[0], o.canonical)
           for s, o, f in pairs}
    assert ("Susan Clark", "per:employee_of", "Hooli") in got


def test_signature_gate_blocks_type_mismatch(distilled):
    clf, _ = distilled
    words, tags, lemmas, heads, labels, ners, mens = _annotated(
        "Susan Clark works for Hooli.")
    s = next(m for m in mens if m.type == "PERSON")
    o = next(m for m in mens if m.type == "ORGANIZATION")
    f = kbp_features(words, lemmas, tags, ners, heads, labels,
                     (s.b, s.e), (o.b, o.e), s.type, o.type)
    # per:city_of_birth requires a LOCATION object: an ORGANIZATION
    # object can never be predicted as it regardless of weights
    rel, _conf = clf.predict(f, s.type, "ORGANIZATION")
    assert rel != "per:city_of_birth"


def test_no_relation_on_unrelated_pair(distilled):
    clf, _ = distilled
    words, tags, lemmas, heads, labels, ners, mens = _annotated(
        "William Lewis met Elizabeth Walker.")
    pairs = candidate_pairs(words, tags, lemmas, heads, labels, ners, mens)
    rels = {clf.predict(f, s.type, o.type)[0] for s, o, f in pairs}
    assert rels <= {NO_RELATION}


def test_save_load_roundtrip(distilled, tmp_path):
    clf, path = distilled
    clf2 = KbpClassifier.load(path)
    assert clf2.weights == json.loads(json.dumps(clf.weights))


def _doc_batch(text):
    doc = Document(text)
    doc._need(*Document._transitive("kbp"))
    return doc._tbl


def test_ensemble_rules_first_no_duplicates(distilled):
    _, path = distilled
    ext = KbpExtractor(classifier_path=path)
    out = ext(_doc_batch("Susan Clark works for Hooli."))
    trips = [(s, p, o, c) for s, p, o, c in zip(
        out.column("subj").to_pylist(), out.column("pred").to_pylist(),
        out.column("obj").to_pylist(),
        out.column("confidence").to_pylist())]
    emp = [t for t in trips if t[1] == "per:employee_of"]
    # exactly ONE per:employee_of triple: the rule's (conf 0.95-range),
    # not a second copy from the classifier (first-extractor-wins union)
    assert len(emp) == 1
    assert emp[0][0] == "Susan Clark" and emp[0][2] == "Hooli"


def test_statistical_path_alone_extracts(distilled):
    """_classify_rest with nothing claimed = the statistical extractor
    in isolation (no rule or built-in pattern involvement)."""
    _, path = distilled
    ext = KbpExtractor(rules_path=None, classifier_path=path)
    words, tags, lemmas, heads, labels, ners, mens = _annotated(
        "Susan Clark works for Hooli.")
    got = {(s, p, o) for s, p, o, _, _, _ in ext._classify_rest(
        words, tags, lemmas, heads, labels, mens, claimed=set())}
    assert ("Susan Clark", "per:employee_of", "Hooli") in got
