"""Clause-splitter classifier tests (the trainable
ClauseSplitterSearchProblem slot — models/clause_classifier.py)."""
import pytest

from corenlp_ray.models.clause_classifier import (
    ClauseClassifier, clause_features)

_SENTS = [
    "Cats do not eat meat .",
    "Cats eat meat .",
    "There is no doubt that he left .",
    "There is doubt that he left .",
    "She never eats meat .",
    "She eats meat .",
    "Dogs sitting in heaven bark loudly .",
    "The president wants to resign quietly .",
    "He said that she agreed completely .",
    "Investors bought bonds and sold stocks yesterday .",
]


def _parsed(sents):
    from corenlp_ray.stages.depparse import parse_sentence
    from corenlp_ray.stages.pos import tag_sentence

    out = []
    for s in sents:
        words = s.split()
        tags = tag_sentence(words)
        heads, labels = parse_sentence(words, tags)
        out.append((words, tags, heads, labels))
    return out


@pytest.fixture(scope="module")
def distilled():
    return ClauseClassifier.distill(_parsed(_SENTS), n_iter=10)


def test_distillation_matches_rule_gate(distilled):
    from corenlp_ray.stages.openie import clause_admissible

    agree = total = 0
    for words, tags, heads, labels in _parsed(_SENTS):
        for v in range(len(words)):
            if not tags[v].startswith("V"):
                continue
            want = clause_admissible(words, tags, heads, labels, v)
            got = distilled.admissible(words, tags, heads, labels, v)
            agree += got == want
            total += 1
    assert total >= 10
    assert agree / total >= 0.9


def test_negation_blocks_clause(distilled):
    rows = _parsed(["She never eats meat .", "She eats meat ."])
    words, tags, heads, labels = rows[0]
    v = words.index("eats")
    assert not distilled.admissible(words, tags, heads, labels, v)
    words, tags, heads, labels = rows[1]
    v = words.index("eats")
    assert distilled.admissible(words, tags, heads, labels, v)


def test_feature_template():
    words = "Cats like water .".split()
    tags = ["NNS", "VBP", "NN", "."]
    heads = [1, -1, 1, 1]
    labels = ["nsubj", "root", "dobj", "punct"]
    f = clause_features(words, tags, heads, labels, 1)
    assert "lbl=root" in f and "t=VBP" in f
    assert "ch=nsubj" in f and "ch=dobj" in f


def test_save_load_roundtrip(tmp_path, distilled):
    p = str(tmp_path / "clause.json")
    distilled.save(p)
    m2 = ClauseClassifier.load(p)
    assert m2.weights == distilled.weights
