"""Round-2 KBP relation expansion tests — the new rule-bank entries
translated from the reference's UD semgrex banks
(data/edu/stanford/nlp/kbp/en/semgrex/per_siblings.rules,
per_parents.rules, per_children.rules, per_other_family.rules,
per_cause_of_death.rules, per_charges.rules, per_alternate_names.rules,
org_shareholders.rules), driven end-to-end through the simple API
(tokenize → pos → lemma → ner → depparse → kbp)."""
import pytest

from corenlp_ray.api import Document


def _rel(text, relation):
    return {(s, o) for s, r, o in Document(text).kbp() if r == relation}


def test_siblings_copular():
    got = _rel("Maya Soetoro is the sister of Barack Obama.",
               "per:siblings")
    assert ("Maya Soetoro", "Barack Obama") in got
    assert ("Barack Obama", "Maya Soetoro") in got   # symmetric


def test_children_possessive_compound():
    assert ("Bill Gates", "Rory") in _rel(
        "Bill Gates's son Rory spoke yesterday.", "per:children")


def test_parents_reverse_of_children():
    assert ("Rory", "Bill Gates") in _rel(
        "Bill Gates's son Rory spoke yesterday.", "per:parents")


def test_other_family_flat_appositive():
    got = _rel("Mary Jones's uncle, Joe Smith, arrived.",
               "per:other_family")
    assert ("Mary Jones", "Joe Smith") in got


def test_cause_of_death():
    assert ("John Smith", "cancer") in _rel(
        "John Smith died of cancer last year.", "per:cause_of_death")


def test_charges():
    assert ("John Smith", "fraud") in _rel(
        "Prosecutors charged John Smith with fraud.", "per:charges")


def test_alternate_names_symmetric():
    got = _rel("Anna Politkovskaya, also known as Anna Mazepa, left.",
               "per:alternate_names")
    assert ("Anna Politkovskaya", "Anna Mazepa") in got
    assert ("Anna Mazepa", "Anna Politkovskaya") in got


def test_shareholders():
    assert ("Intel Corp.", "Apple") in _rel(
        "Apple acquired a stake in Intel Corp.", "org:shareholders")


def test_no_false_family_without_kinship_noun():
    assert not _rel("Bill Gates met Rory yesterday.", "per:children")
    assert not _rel("Bill Gates met Rory yesterday.", "per:siblings")


@pytest.mark.parametrize("text,rel,obj", [
    ("John Smith lives in France.", "per:countries_of_residence",
     "France"),
    ("John Smith lives in Texas.", "per:stateorprovinces_of_residence",
     "Texas"),
    ("John Smith lives in Chicago.", "per:cities_of_residence",
     "Chicago"),
    ("Acme Corp. is based in Germany.", "org:country_of_headquarters",
     "Germany"),
])
def test_geo_subtype_splits_relation(text, rel, obj):
    got = _rel(text, rel)
    assert any(o == obj for _, o in got), got
