"""Token-level CleanXml parity with the reference's own
CleanXmlAnnotatorTest (test/src/edu/stanford/nlp/pipeline/
CleanXmlAnnotatorTest.java) — tokenize the raw tagged string (SGML tags
come out as tokens, as in PTBTokenizer), drop tag tokens, and compare
against the gold token sequences / offsets those tests assert."""
from corenlp_ray.stages.extract import cleanxml_tokens
from corenlp_ray.stages.tokenize import tokenize


def _clean_words(text):
    return [t[0] for t in cleanxml_tokens(tokenize(text))]


def test_remove_xml():                      # CleanXmlAnnotatorTest:155
    assert _clean_words("<xml>This is a test string.</xml>") == \
        ["This", "is", "a", "test", "string", "."]


def test_sentence_splitting_tags_flat():    # :172
    assert _clean_words("<p>This sentence is split</p>"
                        "<foo>over two tags</foo>") == \
        ["This", "sentence", "is", "split", "over", "two", "tags"]


def test_nested_tags():                     # :184
    assert _clean_words("<p><p>This text is in a</p>nested tag</p>") == \
        ["This", "text", "is", "in", "a", "nested", "tag"]


def test_missing_close_tags():              # :195 (flaw-tolerant path)
    assert _clean_words(
        "<text><p>This text <p>has closing tags wrong</text>") == \
        ["This", "text", "has", "closing", "tags", "wrong"]


def test_early_end():                       # :211 (flaw-tolerant path)
    assert _clean_words("<text>This text ends before all tags closed") \
        == ["This", "text", "ends", "before", "all", "tags", "closed"]


def test_offsets_preserved():               # :269
    text = "<p><p>This text is in a</p>nested tag</p>"
    toks = cleanxml_tokens(tokenize(text))
    assert toks[0][0] == "This"
    assert (toks[0][2], toks[0][3]) == (6, 10)
    # every surviving token still slices the ORIGINAL string
    for word, orig, b, e in toks:
        assert text[b:e] == orig


def test_attributes():                      # :284
    assert _clean_words('<p a="b">This text has an attribute</p>') == \
        ["This", "text", "has", "an", "attribute"]


def test_invertible_whitespace_variants():  # :227
    gold = ["This", "sentence", "should", "be", "invertible", "."]
    for text in (
            "  <xml>  This sentence should  be  invertible.  </xml>  ",
            " <xml>   <foo>       <bar>This sentence should     </bar>"
            "be invertible.   </foo>   </xml> ",
            "  This sentence <xml>should</xml>  be  invertible.  ",
            "  This sentence<xml> should </xml>be  invertible.  ",
            "  This sentence <xml> should </xml>  be  invertible.  "):
        toks = cleanxml_tokens(tokenize(text))
        assert [t[0] for t in toks] == gold, (text, toks)
        for word, orig, b, e in toks:
            assert text[b:e] == orig
