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


# ----------------------------------------------------------- Polarity ----
# (test/src/edu/stanford/nlp/naturalli/PolarityTest.java — operator
# fixtures and every projection assertion mirrored)

from corenlp_ray.functions.natlog_relations import (   # noqa: E402
    ADDITIVE, ANTITONE, BOTH, MONOTONE, MULTIPLICATIVE, Polarity)

_none = Polarity([])
_additive = Polarity([(MONOTONE, ADDITIVE)])
_multiplicative = Polarity([(MONOTONE, MULTIPLICATIVE)])
_antimultiplicative = Polarity([(MONOTONE, ADDITIVE),
                                (ANTITONE, MULTIPLICATIVE)])
_add_antimult = Polarity([(MONOTONE, ADDITIVE),
                          (ANTITONE, MULTIPLICATIVE)])
_mult_antimult = Polarity([(MONOTONE, MULTIPLICATIVE),
                           (ANTITONE, MULTIPLICATIVE)])


def test_none_projects_identity():          # PolarityTest:63
    for rel in R:
        assert _none.project_lexical_relation(rel) is rel


def test_additive_antimultiplicative_project():     # :75
    p = _add_antimult
    assert p.project_lexical_relation(R.EQUIVALENT) is R.EQUIVALENT
    assert p.project_lexical_relation(R.FORWARD_ENTAILMENT) is \
        R.REVERSE_ENTAILMENT
    assert p.project_lexical_relation(R.REVERSE_ENTAILMENT) is \
        R.FORWARD_ENTAILMENT
    assert p.project_lexical_relation(R.NEGATION) is R.COVER
    assert p.project_lexical_relation(R.ALTERNATION) is R.COVER
    assert p.project_lexical_relation(R.COVER) is R.INDEPENDENCE
    assert p.project_lexical_relation(R.INDEPENDENCE) is R.INDEPENDENCE


def test_multiplicative_antimultiplicative_project():   # :85
    p = _mult_antimult
    assert p.project_lexical_relation(R.EQUIVALENT) is R.EQUIVALENT
    assert p.project_lexical_relation(R.FORWARD_ENTAILMENT) is \
        R.REVERSE_ENTAILMENT
    assert p.project_lexical_relation(R.REVERSE_ENTAILMENT) is \
        R.FORWARD_ENTAILMENT
    assert p.project_lexical_relation(R.NEGATION) is R.INDEPENDENCE
    assert p.project_lexical_relation(R.ALTERNATION) is R.INDEPENDENCE
    assert p.project_lexical_relation(R.COVER) is R.INDEPENDENCE


def test_additive_project():                # :96
    p = _additive
    assert p.project_lexical_relation(R.FORWARD_ENTAILMENT) is \
        R.FORWARD_ENTAILMENT
    assert p.project_lexical_relation(R.REVERSE_ENTAILMENT) is \
        R.REVERSE_ENTAILMENT
    assert p.project_lexical_relation(R.NEGATION) is R.COVER
    assert p.project_lexical_relation(R.ALTERNATION) is R.INDEPENDENCE
    assert p.project_lexical_relation(R.COVER) is R.COVER


def test_antimultiplicative_project():      # :108
    p = _antimultiplicative
    assert p.project_lexical_relation(R.FORWARD_ENTAILMENT) is \
        R.REVERSE_ENTAILMENT
    assert p.project_lexical_relation(R.REVERSE_ENTAILMENT) is \
        R.FORWARD_ENTAILMENT
    assert p.project_lexical_relation(R.NEGATION) is R.COVER
    assert p.project_lexical_relation(R.ALTERNATION) is R.COVER
    assert p.project_lexical_relation(R.COVER) is R.INDEPENDENCE


def test_multiplicative_truth():            # :119
    p = _multiplicative
    maintains = {rel: p.project_lexical_relation(rel).maintains_truth
                 for rel in R}
    negates = {rel: p.project_lexical_relation(rel).negates_truth
               for rel in R}
    assert maintains[R.EQUIVALENT] and maintains[R.FORWARD_ENTAILMENT]
    assert not any(maintains[r] for r in (
        R.REVERSE_ENTAILMENT, R.NEGATION, R.ALTERNATION, R.COVER,
        R.INDEPENDENCE))
    assert negates[R.NEGATION] and negates[R.ALTERNATION]
    assert not any(negates[r] for r in (
        R.EQUIVALENT, R.FORWARD_ENTAILMENT, R.REVERSE_ENTAILMENT,
        R.COVER, R.INDEPENDENCE))


def test_upward_downward():                 # :138
    assert _multiplicative.is_upwards
    assert _additive.is_upwards
    assert not _antimultiplicative.is_upwards
    assert not _mult_antimult.is_upwards
    assert not _add_antimult.is_upwards
    assert not _multiplicative.is_downwards
    assert not _additive.is_downwards
    assert _antimultiplicative.is_downwards
    assert _mult_antimult.is_downwards
    assert _add_antimult.is_downwards
