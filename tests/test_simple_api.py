"""Simple API facade (the reference's simple/Document analogue)."""
from corenlp_ray.api import Document


def test_lazy_sentences_and_words():
    d = Document("Some cats have tails. They purr loudly.")
    sents = d.sentences()
    assert len(sents) == 2
    assert sents[0].words() == ["Some", "cats", "have", "tails", "."]


def test_pos_lemma_ner():
    d = Document("John Smith visited Paris.")
    s = d.sentences()[0]
    assert s.pos_tags()[0] == "NNP"
    assert s.lemmas()[1] == "Smith"
    assert s.ner_tags()[:2] == ["PERSON", "PERSON"]
    assert "LOCATION" in s.ner_tags()


def test_openie_accessor():
    d = Document("Some cats have tails.")
    assert ("cats", "have", "tails") in d.sentences()[0].openie()


def test_kbp_accessor():
    d = Document("Mary Johnson works for Initech.")
    assert ("Mary Johnson", "per:employee_of", "Initech") in d.kbp()


def test_coref_chains():
    d = Document("John Smith arrived. John Smith spoke.")
    chains = d.coref_chains()
    assert any(v.count("John Smith") == 2 for v in chains.values())


def test_dependencies():
    d = Document("Cats have tails.")
    deps = d.sentences()[0].dependencies()
    assert (-1, "root", 1) in deps  # have is root
    assert (1, "nsubj", 0) in deps
    assert (1, "obj", 2) in deps


def test_incremental_annotation_caches():
    d = Document("Cats sleep.")
    d.sentences()
    assert "tokenize" in d._done and "pos" not in d._done
    d.sentences()[0].pos_tags()
    assert "pos" in d._done


def test_document_relations_accessor():
    from corenlp_ray.api import Document

    d = Document("John Smith lives in Springfield.")
    assert d.relations() == {("John Smith", "Live_In", "Springfield")}


def test_document_sentiments_accessor():
    from corenlp_ray.api import Document

    d = Document("The movie was great. The plot was terrible.")
    got = d.sentiments()
    assert len(got) == 2
    assert got[0] in ("Positive", "Very positive")
    assert got[1] in ("Negative", "Very negative")
