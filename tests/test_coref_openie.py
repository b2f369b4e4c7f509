"""Coref sieves + OpenIE golden triples (FIXTURES F5/F7, modeled on the
reference's OpenIEITest goldens)."""
from corenlp_ray.stages.coref import coref_batch, resolve_coref
from corenlp_ray.stages.depparse import depparse_batch, parse_sentence
from corenlp_ray.stages.lemma import lemma_batch, lemma_of
from corenlp_ray.stages.ner import ner_batch, ner_sentence
from corenlp_ray.stages.openie import extract_sentence_triples, openie_batch
from corenlp_ray.stages.pos import pos_batch, tag_sentence
from corenlp_ray.stages.tokenize import tokenize, tokenize_ssplit_batch
from corenlp_ray.sources.pages import synth_pages_table


def annotate(text):
    words = [t[0] for t in tokenize(text)]
    tags = tag_sentence(words)
    lemmas = [lemma_of(w, t) for w, t in zip(words, tags)]
    types, mentions = ner_sentence(words, tags)
    heads, labels = parse_sentence(words, tags)
    mens = [(b, e, t) for b, e, t, _ in mentions]
    return words, tags, lemmas, heads, labels, mens


def triples(text, pron=None):
    words, tags, lemmas, heads, labels, mens = annotate(text)
    got = extract_sentence_triples(words, tags, lemmas, heads, labels,
                                   mens, pron)
    return {(s, p, o) for s, p, o, *_ in got}


def test_golden_cats():
    assert ("cats", "have", "tails") in triples("Some cats have tails.")


def test_golden_rabbits():
    assert ("rabbits", "eat", "vegetables") in triples(
        "All rabbits eat vegetables.")


def test_golden_possessive():
    # reference golden: "IBM's research group." → (IBM, has, research group)
    assert ("IBM", "has", "research group") in triples(
        "IBM's research group studies robotics.")


def test_passive_obl():
    t = triples("John Smith was born in Springfield.")
    assert ("John Smith", "was born in", "Springfield") in t


def test_works_for():
    t = triples("Mary Johnson works for Initech.")
    assert ("Mary Johnson", "works for", "Initech") in t


def test_copula():
    t = triples("Robert Brown is the chief executive officer of Hooli.")
    assert ("Robert Brown", "is", "chief executive officer") in t
    assert ("Robert Brown", "is chief executive officer of", "Hooli") in t


def test_founded_with_year():
    t = triples("Patricia Davis founded Hooli in 2004.")
    assert ("Patricia Davis", "founded", "Hooli") in t
    assert ("Patricia Davis", "founded Hooli in", "2004") in t


def test_pronoun_canonicalization():
    words, tags, lemmas, heads, labels, mens = annotate("He works for Initech.")
    got = extract_sentence_triples(words, tags, lemmas, heads, labels, mens,
                                   {0: "John Smith"})
    canon = {(sc, p, oc) for s, p, o, sc, oc, *_ in got}
    assert ("John Smith", "works for", "Initech") in canon


# ----------------------------------------------------------------- coref ----

def doc_mentions(text):
    """Run the full doc-level stack on one text via batch fns."""
    import pyarrow as pa
    from corenlp_ray.sources.pages import PAGES_SCHEMA
    tbl = pa.Table.from_pylist([{
        "url": "u", "warc_ts": 0, "html": b"", "text": text, "lang": "en",
    }], schema=PAGES_SCHEMA)
    out = coref_batch(ner_batch(pos_batch(tokenize_ssplit_batch(tbl))))
    return out


def test_coref_exact_and_pronoun():
    out = doc_mentions(
        "John Smith visited Madison. John Smith works for Initech. "
        "He lives in Dover.")
    canon = out.column("men_canonical")[0].as_py()
    mner = out.column("men_ner")[0].as_py()
    # both John Smith mentions share a canonical form
    js = [c for c, t in zip(canon, mner) if t == "PERSON"]
    assert js.count("John Smith") >= 2
    # pronoun resolved to John Smith
    pcan = out.column("pron_canonical")[0].as_py()
    assert "John Smith" in pcan


def test_coref_head_match():
    out = doc_mentions("Barbara Taylor arrived. Taylor spoke first.")
    canon = out.column("men_canonical")[0].as_py()
    assert canon.count("Barbara Taylor") >= 2


def test_coref_it_to_org():
    out = doc_mentions("Globex Inc. announced profits. It hired workers.")
    pcan = out.column("pron_canonical")[0].as_py()
    assert "Globex Inc." in pcan


def test_coref_gender():
    out = doc_mentions(
        "Mary Johnson met Robert Brown. She thanked him.")
    pidx = out.column("pron_idx")[0].as_py()
    pcan = out.column("pron_canonical")[0].as_py()
    resolved = dict(zip(pidx, pcan))
    words = out.column("tok_word")[0].as_py()
    she = words.index("She")
    him = words.index("him")
    assert resolved.get(she) == "Mary Johnson"
    assert resolved.get(him) == "Robert Brown"


# ------------------------------------------------------------- batch glue ----

def test_openie_batch_on_pages():
    tbl = synth_pages_table(n=10, seed=17)
    docs = coref_batch(depparse_batch(lemma_batch(ner_batch(pos_batch(
        tokenize_ssplit_batch(tbl))))))
    trip = openie_batch(docs)
    assert trip.num_rows > 0
    assert set(trip.column_names) >= {"url", "subj", "pred", "obj",
                                      "confidence", "source"}
    assert all(s == "openie" for s in trip.column("source").to_pylist())


def test_coref_acronym_sieve():
    out = doc_mentions(
        "International Business Machines reported profits. IBM hired workers.")
    canon = out.column("men_canonical")[0].as_py()
    assert canon.count("International Business Machines") >= 2
