"""Round-2 regression tests for the judge/advisor findings (ADVICE.md).

Each case pins the corrected behavior so the fix can't regress:
  * lemma -ese early-return no longer freezes geese/these/cheese
  * word-number recursion composes descending multipliers (reference
    QuantifiableEntityNormalizer.wordToNumberRecurse semantics)
  * leading-title NER rule no longer steals LOCATION/ORG runs
  * 'No.'/'So.' abbreviation fusing restricted to place continuations
  * duplicated sentence-final period keeps a real (non-zero-width) span
"""
from corenlp_ray.functions.quantifiable import (
    _word_number, normalized_number_string, normalized_ordinal_string)
from corenlp_ray.stages.lemma import lemma_of
from corenlp_ray.stages.ner import _type_nnp_run
from corenlp_ray.stages.tokenize import tokenize


# ------------------------------------------------------------- lemma ----

def test_geese_lemma_goose():
    assert lemma_of("geese", "NNS") == "goose"


def test_these_cheese_lowercase():
    assert lemma_of("These", "DT") == "these"
    assert lemma_of("Cheese", "NN") == "cheese"


def test_nationality_ese_invariant():
    assert lemma_of("Chinese", "NNS") == "Chinese"
    assert lemma_of("Burmese", "JJ") == "Burmese"


# ------------------------------------------------------- word numbers ----

def test_descending_multiplier_composition():
    assert _word_number("one thousand two hundred") == 1200.0
    assert _word_number("two hundred thousand five") == 200005.0
    assert _word_number("three million four hundred thousand") == 3_400_000.0


def test_chained_big_multipliers():
    assert _word_number("ten thousand million") == 1e10


def test_ordinal_multiplier():
    assert normalized_ordinal_string("one hundredth") == "100.0"
    assert normalized_ordinal_string("hundredth") == "100.0"
    assert normalized_ordinal_string("twenty-second") == "22.0"


def test_number_string_still_works():
    assert normalized_number_string("twenty-five") == "25.0"
    assert normalized_number_string("1.3 million") == "1300000.0"


# ---------------------------------------------------------------- ner ----

def _type(words, prev="."):
    lowers = [w.lower() for w in words]
    return _type_nnp_run(words, lowers, 0, len(words), prev)


def test_title_rule_still_types_persons():
    assert _type(["Queen", "Elizabeth", "II"]) == "PERSON"
    assert _type(["President", "Obama"]) == "PERSON"


def test_title_rule_yields_to_location_and_org():
    assert _type(["Prince", "Edward", "Island"]) == "LOCATION"
    # 'systems' is an org suffix → title rule must not fire
    assert _type(["General", "Dynamics", "Land",
                  "Systems"]) == "ORGANIZATION"


# ----------------------------------------------------------- tokenize ----

def test_no_period_sentence_final_splits():
    words = [t[0] for t in tokenize("No. She refused.")]
    assert words[:2] == ["No", "."]


def test_no_korea_still_fused():
    words = [t[0] for t in tokenize("We went to No. Korea.")]
    assert "No." in words


def test_duplicated_period_has_real_span():
    text = "Kemper Corp.\n</HEADLINE>"
    toks = tokenize(text)
    # every token must satisfy the text[b:e] == orig invariant with a
    # non-empty orig (the duplicated '.' shares the abbreviation's span)
    for word, orig, b, e in toks:
        assert orig != ""
        assert text[b:e] == orig
    assert [t[0] for t in toks[:3]] == ["Kemper", "Corp.", "."]
