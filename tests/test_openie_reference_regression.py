"""Regression suite against the reference's OWN OpenIE golden triples
(/root/reference/itest/src/edu/stanford/nlp/naturalli/OpenIEITest.java:
45-260 and test/.../RelationTripleSegmenterTest). Containment assertions:
for each reference sentence, the KEY reference triples must appear in
our extraction set (the reference's full sets additionally contain
entailment-shortened variants; band scored below)."""
import pytest

from corenlp_ray.stages.depparse import parse_sentence
from corenlp_ray.stages.lemma import lemma_of
from corenlp_ray.stages.ner import ner_sentence
from corenlp_ray.stages.openie import extract_sentence_triples
from corenlp_ray.stages.pos import tag_sentence
from corenlp_ray.stages.tokenize import tokenize


def triples(text):
    words = [t[0] for t in tokenize(text)]
    tags = tag_sentence(words)
    lemmas = [lemma_of(w, t) for w, t in zip(words, tags)]
    types, mentions = ner_sentence(words, tags)
    heads, labels = parse_sentence(words, tags)
    mens = [(b, e, t) for b, e, t, _ in mentions]
    got = extract_sentence_triples(words, tags, lemmas, heads, labels, mens)
    return {(s.lower(), p.lower(), o.lower()) for s, p, o, *_ in got}


# (sentence, [key golden triples]) — drawn from OpenIEITest goldens
GOLDENS = [
    ("some cats have tails", [("cats", "have", "tails")]),
    ("All rabbits eat vegetables.", [("rabbits", "eat", "vegetables")]),
    ("IBM's research group.", [("ibm", "has", "research group")]),
    ("There are cats with tails.", [("cats", "is with", "tails")]),
    ("Barack Hussein Obama is the President of the United States.",
     [("barack hussein obama", "is", "president"),
      ("barack hussein obama", "is president of", "united states")]),
    ("George Boyd joined on loan from Peterborough United.",
     [("george boyd", "joined on", "loan")]),
    ("He defeated Republican nominee John McCain.",
     [("he", "defeated", "republican nominee john mccain")]),
    ("He was inaugurated as president.",
     [("he", "was inaugurated as", "president")]),
    ("He worked as a civil rights attorney.",
     [("he", "worked as", "civil rights attorney")]),
    ("He taught constitutional law.",
     [("he", "taught", "constitutional law")]),
    ("Obama was born in Hawaii.", [("obama", "was born in", "hawaii")]),
    ("Mary is beautiful.", [("mary", "is", "beautiful")]),
]


@pytest.mark.parametrize("text,expected", GOLDENS,
                         ids=[g[0][:40] for g in GOLDENS])
def test_reference_golden_contained(text, expected):
    got = triples(text)
    for t in expected:
        assert t in got, f"missing {t}; got {sorted(got)}"


def test_recall_band_over_suite():
    """Recall of key reference triples across the whole suite ≥ 0.95
    (the OpenIE-regression leg of the P/R gate)."""
    total = hits = 0
    for text, expected in GOLDENS:
        got = triples(text)
        for t in expected:
            total += 1
            hits += t in got
    assert hits / total >= 0.95, f"recall {hits}/{total}"


# clause-splitting goldens (the ClauseSplitterSearchProblem territory:
# complement clauses, relative clauses — OpenIEITest testThereIsNoDoubt
# and the RelationTripleSegmenter clause fixtures)
CLAUSE_GOLDENS = [
    ("There is no doubt that cats have tails.",
     [("cats", "have", "tails")]),
    ("He said that Patricia Davis founded Hooli.",
     [("patricia davis", "founded", "hooli")]),
    ("The man who founded Hooli died in Dover.",
     [("man", "founded", "hooli"), ("man", "died in", "dover")]),
    ("Mary Johnson, who leads Initech, lives in Salem.",
     [("mary johnson", "leads", "initech"),
      ("mary johnson", "lives in", "salem")]),
]


@pytest.mark.parametrize("text,expected", CLAUSE_GOLDENS,
                         ids=[g[0][:40] for g in CLAUSE_GOLDENS])
def test_clause_golden_contained(text, expected):
    got = triples(text)
    for t in expected:
        assert t in got, f"missing {t}; got {sorted(got)}"


# conjunction-propagation goldens (enhanced++ conj distribution; cf. the
# reference's ObamaWikiFour "did X, did Y, and did Z" pattern family)
CONJ_GOLDENS = [
    ("John Smith and Mary Johnson work for Initech.",
     [("john smith", "work for", "initech"),
      ("mary johnson", "work for", "initech")]),
    ("Cats eat fish and mice.",
     [("cats", "eat", "fish"), ("cats", "eat", "mice")]),
]


@pytest.mark.parametrize("text,expected", CONJ_GOLDENS,
                         ids=[g[0][:40] for g in CONJ_GOLDENS])
def test_conj_golden_contained(text, expected):
    got = triples(text)
    for t in expected:
        assert t in got, f"missing {t}; got {sorted(got)}"


# the heavier multi-clause goldens from OpenIEITest (key triples)
HARD_GOLDENS = [
    ("On 21 February 2013 George Boyd joined on loan from Peterborough "
     "United for the remainder of the season.",
     [("george boyd", "joined on", "loan"),
      ("george boyd", "joined for", "remainder")]),
    ("He then defeated Republican nominee John McCain in the general "
     "election, and was inaugurated as president on January 20, 2009.",
     [("he", "defeated", "republican nominee john mccain"),
      ("he", "was inaugurated as", "president"),
      ("he", "was inaugurated on", "january 20 2009")]),
    ("He worked as a civil rights attorney and taught constitutional law "
     "at the University of Chicago Law School from 1992 to 2004.",
     [("he", "worked as", "civil rights attorney"),
      ("he", "taught", "constitutional law")]),
]


@pytest.mark.parametrize("text,expected", HARD_GOLDENS,
                         ids=[g[0][:40] for g in HARD_GOLDENS])
def test_hard_golden_contained(text, expected):
    got = triples(text)
    for t in expected:
        assert t in got, f"missing {t}; got {sorted(got)}"
