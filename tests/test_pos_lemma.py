"""POS tagger + lemmatizer golden fixtures."""
from corenlp_ray.stages.lemma import lemma_of, lemma_batch
from corenlp_ray.stages.pos import tag_sentence, pos_batch
from corenlp_ray.stages.tokenize import tokenize, tokenize_ssplit_batch
from corenlp_ray.sources.pages import synth_pages_table


def tag(text):
    words = [t[0] for t in tokenize(text)]
    return list(zip(words, tag_sentence(words)))


def test_simple_svo():
    assert tag("The cat sat.") == [
        ("The", "DT"), ("cat", "NN"), ("sat", "VBD"), (".", ".")]


def test_proper_nouns_and_passive():
    got = tag("John Smith was born in Springfield.")
    assert got == [("John", "NNP"), ("Smith", "NNP"), ("was", "VBD"),
                   ("born", "VBN"), ("in", "IN"), ("Springfield", "NNP"),
                   (".", ".")]


def test_kbp_sentence():
    got = tag("Acme Corp. is headquartered in Madison.")
    assert got == [("Acme", "NNP"), ("Corp.", "NNP"), ("is", "VBZ"),
                   ("headquartered", "VBN"), ("in", "IN"),
                   ("Madison", "NNP"), (".", ".")]


def test_openie_golden_sentences():
    assert tag("Some cats have tails.") == [
        ("Some", "DT"), ("cats", "NNS"), ("have", "VBP"),
        ("tails", "NNS"), (".", ".")]
    assert tag("All rabbits eat vegetables.") == [
        ("All", "DT"), ("rabbits", "NNS"), ("eat", "VBP"),
        ("vegetables", "NNS"), (".", ".")]


def test_possessive():
    got = tag("IBM's research group studies robotics.")
    assert got == [("IBM", "NNP"), ("'s", "POS"), ("research", "NN"),
                   ("group", "NN"), ("studies", "VBZ"),
                   ("robotics", "NN"), (".", ".")]


def test_pronoun_verb():
    got = tag("He works for Initech.")
    assert got == [("He", "PRP"), ("works", "VBZ"), ("for", "IN"),
                   ("Initech", "NNP"), (".", ".")]


def test_numbers_dates():
    got = dict(tag("She died on March 3, 1999."))
    assert got["March"] == "NNP" and got["3"] == "CD" and got["1999"] == "CD"


def test_modal_verb():
    got = tag("They will visit Dover.")
    assert got == [("They", "PRP"), ("will", "MD"), ("visit", "VB"),
                   ("Dover", "NNP"), (".", ".")]


# ----------------------------------------------------------------- lemma ----

def test_lemma_irregular_verbs():
    assert lemma_of("was", "VBD") == "be"
    assert lemma_of("has", "VBZ") == "have"
    assert lemma_of("born", "VBN") == "bear"
    assert lemma_of("went", "VBD") == "go"
    assert lemma_of("n't", "RB") == "not"


def test_lemma_regular_verbs():
    assert lemma_of("studies", "VBZ") == "study"
    assert lemma_of("works", "VBZ") == "work"
    assert lemma_of("acquired", "VBD") == "acquire"
    assert lemma_of("jumped", "VBD") == "jump"
    assert lemma_of("visited", "VBD") == "visit"
    assert lemma_of("making", "VBG") == "make"
    assert lemma_of("running", "VBG") == "run"
    assert lemma_of("planned", "VBD") == "plan"


def test_lemma_nouns():
    assert lemma_of("tails", "NNS") == "tail"
    assert lemma_of("companies", "NNS") == "company"
    assert lemma_of("children", "NNS") == "child"
    assert lemma_of("boxes", "NNS") == "box"
    assert lemma_of("news", "NN") == "news"


def test_lemma_proper_keeps_case():
    assert lemma_of("Springfield", "NNP") == "Springfield"
    assert lemma_of("The", "DT") == "the"


def test_batch_pipeline():
    tbl = synth_pages_table(n=6, seed=5)
    out = lemma_batch(pos_batch(tokenize_ssplit_batch(tbl)))
    assert "tok_pos" in out.column_names and "tok_lemma" in out.column_names
    for i in range(out.num_rows):
        words = out.column("tok_word")[i].as_py()
        tags = out.column("tok_pos")[i].as_py()
        lemmas = out.column("tok_lemma")[i].as_py()
        assert len(words) == len(tags) == len(lemmas)
        assert all(t for t in tags)
