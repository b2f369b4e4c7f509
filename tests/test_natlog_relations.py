"""NatLog relation-algebra parity with the reference's own
NaturalLogicRelationTest (test/src/edu/stanford/nlp/naturalli/
NaturalLogicRelationTest.java) — every assertion below mirrors one
there."""
from corenlp_ray.functions.natlog_relations import (
    NatLogRelation as R, for_dependency_deletion, for_dependency_insertion)


def test_fixed_index():                     # NaturalLogicRelationTest:14
    for rel in R:
        assert R.by_fixed_index(rel.fixed_index) is rel


def test_spot_join_table():                 # :21
    assert R.NEGATION.join(R.FORWARD_ENTAILMENT) is R.COVER
    assert R.ALTERNATION.join(R.NEGATION) is R.FORWARD_ENTAILMENT
    assert R.COVER.join(R.ALTERNATION) is R.REVERSE_ENTAILMENT
    assert R.NEGATION.join(R.NEGATION) is R.EQUIVALENT
    for rel in R:
        assert R.EQUIVALENT.join(rel) is rel
        assert R.INDEPENDENCE.join(rel) is R.INDEPENDENCE
        assert rel.join(R.INDEPENDENCE) is R.INDEPENDENCE


def test_entailment_state():                # :34
    assert R.EQUIVALENT.maintains_truth
    assert R.FORWARD_ENTAILMENT.maintains_truth
    assert R.NEGATION.negates_truth
    assert R.ALTERNATION.negates_truth
    assert not R.EQUIVALENT.negates_truth
    assert not R.FORWARD_ENTAILMENT.negates_truth
    assert not R.NEGATION.maintains_truth
    assert not R.ALTERNATION.maintains_truth
    assert not R.COVER.maintains_truth
    assert not R.COVER.negates_truth
    assert not R.INDEPENDENCE.maintains_truth
    assert not R.INDEPENDENCE.negates_truth


def test_some_insertion_relations():        # :52
    assert for_dependency_insertion("quantmod") is R.FORWARD_ENTAILMENT
    assert for_dependency_insertion("amod") is R.REVERSE_ENTAILMENT


def test_conj_or_peculiarities():           # :59
    assert for_dependency_insertion("conj:or") is R.FORWARD_ENTAILMENT
    assert for_dependency_insertion("conj:or", True) is \
        R.FORWARD_ENTAILMENT
    assert for_dependency_insertion("conj:or", False) is \
        R.REVERSE_ENTAILMENT


def test_some_deletion_relations():         # :66
    assert for_dependency_deletion("quantmod") is R.REVERSE_ENTAILMENT
    assert for_dependency_deletion("amod") is R.FORWARD_ENTAILMENT


def test_join_table_is_total():
    for a in R:
        for b in R:
            assert a.join(b) in R


def test_prefix_fallbacks():
    assert for_dependency_insertion("nmod:under") is \
        R.REVERSE_ENTAILMENT
    assert for_dependency_insertion("obl:with") is R.REVERSE_ENTAILMENT
    assert for_dependency_insertion("advcl:while") is \
        R.REVERSE_ENTAILMENT
    assert for_dependency_insertion("totally_unknown") is \
        R.INDEPENDENCE


def test_neither_preconj():
    assert for_dependency_insertion(
        "cc:preconj", False, "neither") is R.INDEPENDENCE
