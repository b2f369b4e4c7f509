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


# --- round-3 expansion: the final 12 relations completing the
# reference's 47-relation TAC-KBP inventory
# (ie/KBPRelationExtractor.java:121-170; per-relation semgrex dirs per
# DefaultPaths.java:59-60: per_religion, per_member_of, org_members,
# org_political_religious_affiliation,
# org_number_of_employees_members, org_website, org_dissolved) ---

def test_religion_converted_to():
    assert ("John Smith", "Islam") in _rel(
        "John Smith converted to Islam in 1990.", "per:religion")


def test_religion_copular_adjective():
    assert ("John Smith", "Catholic") in _rel(
        "John Smith is a devout Catholic.", "per:religion")


def test_religion_practices():
    assert ("John Smith", "Buddhism") in _rel(
        "John Smith practices Buddhism.", "per:religion")


def test_per_member_of_copular():
    assert ("Mary Jones", "National Rifle Association") in _rel(
        "Mary Jones is a member of the National Rifle Association.",
        "per:member_of")


def test_per_member_of_board_seat():
    assert ("John Smith", "Acme Corp.") in _rel(
        "John Smith sits on the board of Acme Corp.", "per:member_of")


def test_org_member_of_and_members_inverse():
    text = "France is a member of the United Nations."
    assert ("France", "United Nations") in _rel(text, "org:member_of")
    assert ("United Nations", "France") in _rel(text, "org:members")


def test_political_religious_affiliation_in_mention():
    assert ("Islamic Salvation Front", "Islamic") in _rel(
        "The Islamic Salvation Front won the election.",
        "org:political/religious_affiliation")


def test_number_of_employees_verb():
    assert ("Acme Corp.", "5,000") in _rel(
        "Acme Corp. employs 5,000 people.",
        "org:number_of_employees/members")


def test_number_of_employees_have():
    assert ("Acme Corp.", "5,000") in _rel(
        "Acme Corp. has 5,000 employees.",
        "org:number_of_employees/members")


def test_website_parenthesized():
    assert ("Acme Corp.", "www.acme.com") in _rel(
        "Acme Corp. ( www.acme.com ) announced profits.", "org:website")


def test_website_copular():
    assert ("Acme Corp.", "www.acme.com") in _rel(
        "Acme Corp.'s website is www.acme.com.", "org:website")


def test_dissolved_passive():
    assert ("Acme Corp.", "1999") in _rel(
        "Acme Corp. was dissolved in 1999.", "org:dissolved")


def test_no_affiliation_for_plain_org():
    assert not _rel("Acme Corp. hired John Smith.",
                    "org:political/religious_affiliation")


# ---- round-4: tokensregex surface banks (KBPTokensregexExtractor
# analogue, resources/kbp_surface_patterns.tsv), run FIRST in the
# ensemble — shapes the dep banks do not cover ----

def test_surface_widow_spouse_symmetric():
    got = _rel("Mary Smith, the widow of John Doe, spoke to reporters.",
               "per:spouse")
    assert ("Mary Smith", "John Doe") in got
    assert ("John Doe", "Mary Smith") in got


def test_surface_graduated_from():
    assert ("John Smith", "Stanford University") in _rel(
        "John Smith graduated from Stanford University.",
        "per:schools_attended")


def test_surface_based_in_headquarters():
    assert ("Acme Corp.", "Paris") in _rel(
        "Acme Corp., based in Paris, announced a profit.",
        "org:city_of_headquarters")


def test_surface_unit_of_subsidiaries_and_parents():
    t = "Globex Corp., a unit of Initech Inc., filed for bankruptcy."
    assert ("Initech Inc.", "Globex Corp.") in _rel(t, "org:subsidiaries")
    assert ("Globex Corp.", "Initech Inc.") in _rel(t, "org:parents")


def test_surface_appositive_age_uses_normalized_value():
    got = _rel("Mary Jones, 47, retired from Acme Corp. on Monday.",
               "per:age")
    assert got == {("Mary Jones", "47")}   # not the coref canonical


def test_surface_son_of_parents_and_children():
    t = "Pat Brown, the son of Jane Brown, joined Initech Inc."
    assert ("Pat Brown", "Jane Brown") in _rel(t, "per:parents")
    assert ("Jane Brown", "Pat Brown") in _rel(t, "per:children")


def test_surface_led_by_top_members():
    assert ("Acme Corp.", "Mary Smith") in _rel(
        "Acme Corp., led by Mary Smith, expanded overseas.",
        "org:top_members/employees")


def test_surface_bank_first_wins_over_classifier_claim():
    # the surface bank claims the pair, so dedup keeps its triple once
    from corenlp_ray.stages.kbp import KbpSurfaceBank

    bank = KbpSurfaceBank()
    assert len(bank.rules) >= 18
