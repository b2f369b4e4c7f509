"""Word shapes, Americanize, sentiment approximation."""
import pyarrow as pa

from corenlp_ray.functions.shapes import americanize, shape_batch, word_shape
from corenlp_ray.sources.pages import PAGES_SCHEMA
from corenlp_ray.stages.sentiment import sentiment_batch, sentiment_sentence
from corenlp_ray.stages.tokenize import tokenize_ssplit_batch


def test_word_shape():
    assert word_shape("John") == "Xxxx"
    assert word_shape("IBM") == "XXX"
    assert word_shape("12") == "dd"
    assert word_shape("Smith-Jones") == "Xx-xXx" or "-" in word_shape("Smith-Jones")
    assert word_shape("a") == "x"


def test_word_shape_collapse_long():
    s = word_shape("Springfield")
    assert s.startswith("Xx") and len(s) <= 6


def test_americanize():
    assert americanize("colour") == "color"
    assert americanize("Colour") == "Color"
    assert americanize("organisation") == "organization"
    assert americanize("hour") == "hour"       # guard list
    assert americanize("realise") == "realize"
    assert americanize("cat") == "cat"


def test_sentiment_labels():
    assert sentiment_sentence("This is a great and wonderful day .".split()) == "Very positive"
    assert sentiment_sentence("This is good .".split()) == "Positive"
    assert sentiment_sentence("The cat sat .".split()) == "Neutral"
    assert sentiment_sentence("This is bad .".split()) == "Negative"
    assert sentiment_sentence("This is not good .".split()) == "Negative"
    assert sentiment_sentence("This was a terrible awful failure .".split()) == "Very negative"


def test_batch_stages():
    tbl = pa.Table.from_pylist([{
        "url": "u", "warc_ts": 0, "html": b"",
        "text": "IBM is great. The colour failed badly.", "lang": "en"}],
        schema=PAGES_SCHEMA)
    out = sentiment_batch(shape_batch(tokenize_ssplit_batch(tbl)))
    shapes = out.column("tok_shape")[0].as_py()
    sents = out.column("sent_sentiment")[0].as_py()
    assert shapes[0] == "XXX"
    assert sents[0] in ("Positive", "Very positive")
    assert sents[1] in ("Negative", "Very negative")


# ---------------------------------------------- tree-composed sentiment ----

def _tree_of(s):
    from corenlp_ray.stages.depparse import parse_sentence
    from corenlp_ray.stages.parse_tree import dep_to_constituency
    from corenlp_ray.stages.pos import tag_sentence

    w = s.split()
    t = tag_sentence(w)
    h, _ = parse_sentence(w, t)
    return dep_to_constituency(w, t, h)


def test_tree_sentiment_basic():
    from corenlp_ray.stages.sentiment import sentiment_tree

    assert sentiment_tree(_tree_of("The movie was good .")) == "Positive"
    assert sentiment_tree(_tree_of("The movie was terrible .")) == \
        "Very negative"
    assert sentiment_tree(_tree_of("The report was neutral stuff .")) \
        == "Neutral"


def test_tree_sentiment_negation_scopes_over_phrase():
    from corenlp_ray.stages.sentiment import sentiment_tree

    assert sentiment_tree(_tree_of("The movie was not good .")) == \
        "Negative"
    assert sentiment_tree(_tree_of("The movie was very good .")) == \
        "Very positive"
    assert sentiment_tree(_tree_of("The movie was not very good .")) \
        == "Very negative"


def test_tree_sentiment_malformed_is_neutral():
    from corenlp_ray.stages.sentiment import sentiment_tree

    assert sentiment_tree("((broken") == "Neutral"
    assert sentiment_tree("") == "Neutral"
