"""Linear-chain CRF NER slot (models/crf_ner.py) — the reference's
actual model family (ie/crf/CRFClassifier.java). Pins: exact Viterbi
decoding uses the transition matrix (not greedy per-token argmax),
conditional-likelihood training fits a CoNLL-shaped corpus exactly and
deterministically, persistence round-trips, distillation reproduces the
cascade, and WeightedNerTagger dispatches on the JSON ``kind``."""
import numpy as np

from corenlp_ray.models.crf_ner import CrfNER
from corenlp_ray.stages.ner import WeightedNerTagger

CORPUS = [
    (["John", "Smith", "visited", "Paris", "."],
     ["NNP", "NNP", "VBD", "NNP", "."],
     ["PERSON", "PERSON", "O", "LOCATION", "O"]),
    (["Mary", "Johnson", "works", "for", "Acme", "Corp", "."],
     ["NNP", "NNP", "VBZ", "IN", "NNP", "NNP", "."],
     ["PERSON", "PERSON", "O", "O", "ORGANIZATION", "ORGANIZATION",
      "O"]),
    (["Springfield", "is", "nice", "."],
     ["NNP", "VBZ", "JJ", "."],
     ["LOCATION", "O", "O", "O"]),
    (["Acme", "hired", "Robert", "Brown", "."],
     ["NNP", "VBD", "NNP", "NNP", "."],
     ["ORGANIZATION", "O", "PERSON", "PERSON", "O"]),
    (["He", "lives", "in", "Madison", "."],
     ["PRP", "VBZ", "IN", "NNP", "."],
     ["O", "O", "O", "LOCATION", "O"]),
]


def test_train_fits_corpus_exactly():
    m = CrfNER.train(CORPUS, n_iter=30)
    for w, p, g in CORPUS:
        assert m.tag(w, p) == g


def test_training_deterministic():
    a = CrfNER.train(CORPUS, n_iter=15)
    b = CrfNER.train(CORPUS, n_iter=15)
    assert np.allclose(a.emit, b.emit) and np.allclose(a.trans, b.trans)


def test_generalizes_by_shape_and_context():
    m = CrfNER.train(CORPUS, n_iter=30)
    got = m.tag(["Linda", "Martinez", "visited", "Georgetown", "."],
                ["NNP", "NNP", "VBD", "NNP", "."])
    assert got == ["PERSON", "PERSON", "O", "LOCATION", "O"]


def test_viterbi_respects_transitions():
    # hand-built model: emissions alone prefer A at both positions,
    # but the A->A transition is so bad the best PATH is A,B —
    # a greedy per-token decoder would output A,A
    tags = ["A", "B"]
    feat_index = {"w=x": 0, "w=y": 1}
    emit = np.array([[2.0, 1.0],     # "x": prefers A
                     [2.0, 1.8]])    # "y": prefers A (barely)
    trans = np.zeros((3, 2))
    trans[0, 0] = -10.0              # A -> A forbidden
    m = CrfNER(tags, feat_index, emit, trans)
    # emission preference sanity (greedy would pick A at both slots)
    rows = [[0], [1]]
    em = m._emissions(rows)
    assert em[0][0] > em[0][1] and em[1][0] > em[1][1]
    got = m.tag(["x", "y"], ["NN", "NN"])
    # real features for "x"/"y" won't match feat_index keys except w=x/w=y
    assert got == ["A", "B"], got


def test_save_load_and_weighted_dispatch(tmp_path):
    m = CrfNER.train(CORPUS, n_iter=20)
    p = str(tmp_path / "crf.json")
    m.save(p)
    back = CrfNER.load(p)
    for w, pos, g in CORPUS:
        assert back.tag(w, pos) == m.tag(w, pos)
    stage = WeightedNerTagger(model_path=p)
    assert isinstance(stage.model, CrfNER)


def test_distill_reproduces_cascade():
    sents = [(w, p) for w, p, _ in CORPUS]
    m = CrfNER.distill(sents, n_iter=20)
    from corenlp_ray.stages.ner import ner_sentence

    for w, p in sents:
        want, _ = ner_sentence(w, p, None)
        assert m.tag(w, p) == list(want)
