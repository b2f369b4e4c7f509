"""Quote-extraction parity with the reference's OWN QuoteAnnotatorITest
(itest/src/edu/stanford/nlp/pipeline/QuoteAnnotatorITest.java) — every
(text, options) → expected-quote-strings case below is copied from that
test's assertions. Pipelines map to options:
  pipeline                  → single_quotes=True
  pipelineNoSingleQuotes    → defaults
  pipelineMaxFive           → single_quotes=True, max_length=5
  pipelineAsciiQuotes       → ascii_quotes=True
  pipelineAllowEmbeddedSame → allow_embedded_same=True
"""
import pytest

from corenlp_ray.functions.quotes import extract_quotes, top_level


def _texts(text, spans):
    return [text[a:b] for a, b in spans]


def _run(text, expected_top, **opts):
    q, _ = extract_quotes(text, **opts)
    tl = _texts(text, top_level(q))
    assert tl == expected_top, tl
    return text, q


def _assert_embedded(inner, outer, text, spans):
    """inner's span lies strictly inside outer's span (itest
    assertEmbedded)."""
    all_texts = _texts(text, spans)
    assert inner in all_texts, all_texts
    si = spans[all_texts.index(inner)]
    so = spans[all_texts.index(outer)]
    assert so[0] <= si[0] and si[1] <= so[1] and si != so


def test_basic_embedded_same_unicode():     # QuoteAnnotatorITest:84
    text = "“Hello,” he said, “how “are” you doing?”"
    _, q = _run(text, ["“Hello,”", "“how “are” you doing?”"],
                single_quotes=True)
    assert "“are”" not in _texts(text, q)   # no same-kind embedding


def test_basic_allow_embedded_same_unicode():   # :93
    text = "“Hello,” he said, “how “are” you doing?”"
    _, q = _run(text, ["“Hello,”", "“how “are” you doing?”"],
                allow_embedded_same=True)
    _assert_embedded("“are”", "“how “are” you doing?”", text, q)


def test_basic_ascii_quotes():              # :101
    text = "“Hello,“ he said, “how are you doing?”"
    q, _ = extract_quotes(text, ascii_quotes=True)
    assert len(top_level(q)) == 2


def test_max_length():                      # :108
    text = "`Hel,' he said, ``how are \"you\" blar a \"farrrrrooom\""
    _run(text, ["`Hel,'", '"you"'], single_quotes=True, max_length=5)


def test_dashes():                          # :124
    _run("\"Hello\"--said Mr. Cornwallaby", ['"Hello"'],
         single_quotes=True)
    _run("“-Wish- you success!”—In what", ["“-Wish- you success!”"],
         single_quotes=True)
    _run("\"-Wish- you success!\"—In what", ['"-Wish- you success!"'],
         single_quotes=True)


def test_basic_internal_punc():             # :136
    text = ("\"Impossible, Mr. Bennet, impossible, when I am not "
            "acquainted with him\n myself; how can you be so teasing?\"")
    _run(text, [text], single_quotes=True)


def test_basic_latex_quotes():              # :144
    _run("`Hello,' he said, ``how are you doing?''",
         ["`Hello,'", "``how are you doing?''"], single_quotes=True)


def test_latex_quotes_with_directed_apostrophes():  # :153
    _run("John`s he said, ``how are you doing?''",
         ["``how are you doing?''"], single_quotes=True)


def test_embedded_latex_quotes():           # :159
    text = "``Hello ``how are you doing?''''"
    _, q = _run(text, [text], allow_embedded_same=True)
    _assert_embedded("``how are you doing?''", text, text, q)


def test_embedded_latex_quotes_no_embedded():   # :168
    text = "``Hello ``how are you doing?''''"
    _, q = _run(text, [text], single_quotes=True)
    assert _texts(text, q) == [text]


def test_embedded_single_latex_quotes():    # :176
    text = "`Hello `how are you doing?''"
    _, q = _run(text, [text], allow_embedded_same=True)
    _assert_embedded("`how are you doing?'", text, text, q)


def test_embedded_latex_all_end_same_place():   # :183
    text = "``Hello ``how `are ``you doing?'''''''"
    _, q = _run(text, [text], allow_embedded_same=True)
    _assert_embedded("``how `are ``you doing?'''''", text, text, q)
    _assert_embedded("`are ``you doing?'''",
                     "``how `are ``you doing?'''''", text, q)
    _assert_embedded("``you doing?''", "`are ``you doing?'''", text, q)


def test_triple_embedded_latex_quotes():    # :200
    text = "``Hel ``lo ``how'' are you'' doing?''"
    _, q = _run(text, [text], allow_embedded_same=True)
    _assert_embedded("``lo ``how'' are you''", text, text, q)
    _assert_embedded("``how''", "``lo ``how'' are you''", text, q)


def test_triple_embedded_latex_no_embedded():   # :209
    text = "``Hel ``lo ``how'' are you'' doing?''"
    _, q = _run(text, [text])       # no single quotes, no embedded-same
    assert _texts(text, q) == [text]


def test_triple_embedded_unicode_quotes():  # :218
    text = "“Hel «lo “how” are you» doing?”"
    _, q = _run(text, [text], allow_embedded_same=True)
    _assert_embedded("«lo “how” are you»", text, text, q)
    _assert_embedded("“how”", "«lo “how” are you»", text, q)


def test_basic_ignore_single_quotes():      # :226
    text = "“Hello,” he 'said', “how are you doing?”"
    _run(text, ["“Hello,”", "“how are you doing?”"],
         allow_embedded_same=True)


def test_basic_unicode_quotes():            # :240
    _run("“Hello,” he said, “how are you doing?”",
         ["“Hello,”", "“how are you doing?”"], single_quotes=True)


def test_unicode_quotes_with_bad_unicode_quotes():  # :247
    _run("“Hello,” he said, “how‚ are‘ you doing?”",
         ["“Hello,”", "“how‚ are‘ you doing?”"], single_quotes=True)


def test_unicode_quotes_with_apostrophes():     # :254
    _run("“Hello,” he said, “where is the dog‘s ball today?”",
         ["“Hello,”", "“where is the dog‘s ball today?”"],
         single_quotes=True)


def test_basic_double_quotes():             # :261
    _run('"Hello," he said, "how are you doing?"',
         ['"Hello,"', '"how are you doing?"'], single_quotes=True)


def test_unclosed_initial_quotes():         # :269
    _run("Hello,   \" he said, 'how are you doing?'",
         ["'how are you doing?'"], single_quotes=True)


def test_unclosed_last_double_quotes():     # :275
    _run('"Hello," he said, "how are you doing?',
         ['"Hello,"'], single_quotes=True)


def test_double_enclosed_in_single():       # :281
    text = "'\"Hello,\" he said, \"how are you doing?\"'"
    _, q = _run(text, [text], single_quotes=True)
    _assert_embedded('"Hello,"', text, text, q)
    _assert_embedded('"how are you doing?"', text, text, q)


def test_single_enclosed_in_double():       # :289
    text = "\"'Hello,' he said, 'how are you doing?'\""
    _, q = _run(text, [text], single_quotes=True)
    _assert_embedded("'Hello,'", text, text, q)
    _assert_embedded("'how are you doing?'", text, text, q)


def test_tis():                             # :115
    text = ("\"'Tis Impossible, “Mr. 'tis “Mr. Bennet” Bennet”, "
            "impossible, when 'tis I am not acquainted with him\n"
            " myself; how can you be so teasing?\"")
    _, q = _run(text, [text], single_quotes=True)
    _assert_embedded("“Mr. Bennet”", "“Mr. 'tis “Mr. Bennet” Bennet”",
                     text, q)
    _assert_embedded("“Mr. 'tis “Mr. Bennet” Bennet”", text, text, q)


def test_embedded_quotes_multiline():       # :300 testEmbeddedQuotes
    second = ("'and I will\n\ntry in what manner I can relieve your\n\n"
              "wants; but, unfortunately, my children\n\n"
              "are from home, and, as I am blind, I\n\n"
              "am afraid I shall find it difficult to procure\n\n"
              "food for you.'")
    text = "\"'Enter,' said De Lacy; " + second + "\""
    _, q = _run(text, [text], single_quotes=True)
    _assert_embedded("'Enter,'", text, text, q)
    _assert_embedded(second, text, text, q)


# --------------------------------------------------- truecase (itest) ----

def test_truecase_itest_sentences():
    """TrueCaseAnnotatorITest.java:55-76: all three case variants map to
    the same truecased answer."""
    from corenlp_ray.stages.misc_annotators import truecase_words

    ans1 = ["Heather", "Brown", "was", "lead", "woman", "at", "Duke",
            "University", "."]
    for variant in (
            ["HEATHER", "BROWN", "WAS", "LEAD", "WOMAN", "AT", "DUKE",
             "UNIVERSITY", "."],
            ["heather", "brown", "was", "lead", "woman", "at", "duke",
             "university", "."]):
        assert truecase_words([w.lower() for w in variant], {0}) == ans1

    ans4 = ['"', "Good", "Morning", "America", "from", "McVey", "!",
            '"']
    for variant in (
            ['"', "GOOD", "MORNING", "AMERICA", "FROM", "MCVEY", "!",
             '"'],
            ['"', "good", "morning", "america", "from", "mcvey", "!",
             '"']):
        assert truecase_words([w.lower() for w in variant], {0}) == ans4


def test_truecase_leaves_common_words_alone():
    from corenlp_ray.stages.misc_annotators import truecase_words

    assert truecase_words("the brown dog ran .".split(), {0}) == \
        ["The", "brown", "dog", "ran", "."]
    assert truecase_words("nasa met john smith .".split(), {0}) == \
        ["NASA", "met", "John", "Smith", "."]
