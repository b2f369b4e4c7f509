"""Exact-set micro-P/R gate against the reference's own OpenIE golden
SETS (/root/reference/itest/src/edu/stanford/nlp/naturalli/
OpenIEITest.java: testExtractionsGeorgeBoyd:135, ObamaWikiOne:146,
ObamaWikiFour:186, ObamaWikiSix:225, testThereIsNoDoubt:253,
testChessIsNotAPhysicalSport:266, testSara:276 — the non-@Ignore'd
assertExtracted(Set) cases). These are EXACT set assertions in the
reference, so both precision and recall are measured; the north rule
requires P/R ≥ 0.95 vs the reference's emitted triples."""
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


SETS = [
 ("On 21 February 2013 George Boyd joined on loan from Peterborough United for the remainder of the season.",
  {("george boyd","joined on","21 february 2013"),
   ("george boyd","joined for","remainder"),
   ("george boyd","joined for","remainder of season"),
   ("george boyd","joined on","loan"),
   ("george boyd","joined on","loan from peterborough united")}),
 ("Barack Hussein Obama II is the 44th and current President of the United States, and the first African American to hold the office.",
  {("barack hussein obama ii","is 44th and current president of","united states"),
   ("barack hussein obama ii","is 44th president of","united states"),
   ("barack hussein obama ii","is president of","united states"),
   ("barack hussein obama ii","is","president"),
   ("barack hussein obama ii","is","44th president")}),
 ("He worked as a civil rights attorney and taught constitutional law at the University of Chicago Law School from 1992 to 2004.",
  {("he","worked as","civil rights attorney"),
   ("he","worked as","rights attorney"),
   ("he","taught","constitutional law"),
   ("he","taught","law"),
   ("he","taught law at","university of chicago law school"),
   ("he","taught law at","university"),
   ("he","taught law from","1992 to 2004")}),
 ("He then defeated Republican nominee John McCain in the general election, and was inaugurated as president on January 20, 2009.",
  {("he","defeated","republican nominee john mccain"),
   ("he","defeated republican nominee john mccain in","election"),
   ("he","defeated republican nominee john mccain in","general election"),
   ("he","was","inaugurated as president on january 20 2009"),
   ("he","was inaugurated as","president"),
   ("he","was","inaugurated"),
   ("he","was inaugurated on","january 20 2009")}),
 ("There is no doubt that I am great.", {("i","am","great")}),
 ("There is no doubt that cats have tails.", {("cats","have","tails")}),
 ("There is doubt that cats have tails.", set()),
 ("Chess is a physical sport",
  {("chess","is","physical"),("chess","is","physical sport"),("chess","is","sport")}),
 ("Chess is not a physical sport", set()),
 ("John did see Sara", {("john","did see","sara")}),
 ("John did not see Sara", set()),
]


def test_micro_pr_at_least_095():
    tp = fp = fn = 0
    for text, gold in SETS:
        got = triples(text)
        tp += len(got & gold)
        fp += len(got - gold)
        fn += len(gold - got)
    P = tp / (tp + fp) if tp + fp else 1.0
    R = tp / (tp + fn) if tp + fn else 1.0
    assert P >= 0.95, f"precision {P:.3f} (tp={tp} fp={fp})"
    assert R >= 0.95, f"recall {R:.3f} (tp={tp} fn={fn})"


def test_negation_rejects_all():
    for text in ("Chess is not a physical sport", "John did not see Sara",
                 "There is doubt that cats have tails."):
        assert triples(text) == set(), text
