"""natlog polarity, entitylink, gender, truecase, quotes."""
import pyarrow as pa

from corenlp_ray.sources.pages import PAGES_SCHEMA
from corenlp_ray.stages.coref import coref_batch
from corenlp_ray.stages.depparse import depparse_batch, parse_sentence
from corenlp_ray.stages.entitylink import EntityLinker, link_of, entitylink_batch
from corenlp_ray.stages.lemma import lemma_batch
from corenlp_ray.stages.misc_annotators import (attribute_quote, find_quotes,
                                                gender_batch, gender_of,
                                                quote_batch, truecase_batch,
                                                truecase_word)
from corenlp_ray.stages.natlog import natlog_batch, polarity_sentence
from corenlp_ray.stages.ner import ner_batch
from corenlp_ray.stages.pos import pos_batch, tag_sentence
from corenlp_ray.stages.tokenize import tokenize, tokenize_ssplit_batch


def doc(text):
    tbl = pa.Table.from_pylist([{
        "url": "u", "warc_ts": 0, "html": b"", "text": text, "lang": "en",
    }], schema=PAGES_SCHEMA)
    return coref_batch(depparse_batch(lemma_batch(ner_batch(pos_batch(
        tokenize_ssplit_batch(tbl))))))


# ----------------------------------------------------------------- natlog ----

def pol(text):
    words = [t[0] for t in tokenize(text)]
    tags = tag_sentence(words)
    heads, labels = parse_sentence(words, tags)
    return dict(zip(words, polarity_sentence(words, tags, heads, labels)))


def test_no_flips_body_and_restrictor():
    p = pol("No cats eat vegetables.")
    assert p["cats"] == "down"
    assert p["eat"] == "down" and p["vegetables"] == "down"


def test_all_downward_restrictor_upward_body():
    p = pol("All rabbits eat vegetables.")
    assert p["rabbits"] == "down"
    assert p["eat"] == "up" and p["vegetables"] == "up"


def test_negation_body():
    p = pol("Cats do n't eat vegetables.")
    assert p["vegetables"] == "down"


def test_plain_up():
    p = pol("Some cats have tails.")
    assert p["tails"] == "up"


def test_natlog_batch():
    out = natlog_batch(doc("No dogs eat vegetables. Cats have tails."))
    pols = out.column("tok_polarity")[0].as_py()
    words = out.column("tok_word")[0].as_py()
    assert len(pols) == len(words)


# ------------------------------------------------------------- entitylink ----

def test_link_dict_and_fallback():
    assert link_of("the U.S.", "LOCATION", "") == "United_States"
    assert link_of("Stanford University", "ORGANIZATION", "") == "Stanford_University"
    assert link_of("John Smith", "PERSON", "") == "John_Smith"
    assert link_of("March 3 , 1999", "DATE", "1999-03-03") == "1999-03-03"
    assert link_of("", "PERSON", "") is None


def test_entitylink_batch():
    out = entitylink_batch(doc("John Smith visited London."))
    links = out.column("men_link")[0].as_py()
    mner = out.column("men_ner")[0].as_py()
    by = dict(zip(mner, links))
    assert by.get("PERSON") == "John_Smith"
    assert by.get("LOCATION") == "London"


# ----------------------------------------------------------------- gender ----

def test_gender():
    assert gender_of("Mary") == "FEMALE"
    assert gender_of("John") == "MALE"
    assert gender_of("Zorp") == "UNKNOWN"
    out = gender_batch(doc("Mary Johnson met Robert Brown."))
    genders = out.column("men_gender")[0].as_py()
    assert "FEMALE" in genders and "MALE" in genders


# --------------------------------------------------------------- truecase ----

def test_truecase_word():
    assert truecase_word("london", False) == "London"
    assert truecase_word("ibm", False) == "IBM"
    assert truecase_word("cats", True) == "Cats"
    assert truecase_word("cats", False) == "cats"


def test_truecase_batch():
    out = truecase_batch(tokenize_ssplit_batch(pa.Table.from_pylist(
        [{"url": "u", "warc_ts": 0, "html": b"",
          "text": "mary lives in london. ibm hired her.", "lang": "en"}],
        schema=PAGES_SCHEMA)))
    tc = out.column("tok_truecase")[0].as_py()
    assert tc[:1] == ["Mary"]
    assert "London" in tc and "IBM" in tc


# ------------------------------------------------------------------ quote ----

def test_find_quotes_straight_and_curly():
    words = [t[0] for t in tokenize('He said "stop now" and left.')]
    spans = find_quotes(words)
    assert len(spans) == 1
    b, e = spans[0]
    assert words[b:e] == ["stop", "now"]


def test_quote_attribution():
    out = quote_batch(doc('"We will win," said Mary Johnson.'))
    speakers = out.column("quo_speaker")[0].as_py()
    texts = out.column("quo_text")[0].as_py()
    assert len(texts) == 1
    assert speakers[0] == "Mary Johnson"


def test_quote_attribution_before():
    out = quote_batch(doc('Robert Brown said "this is fine."'))
    speakers = out.column("quo_speaker")[0].as_py()
    assert speakers and speakers[0] == "Robert Brown"
