"""MacCartney natural-logic relation algebra — the NaturalLogicRelation
analogue (src/edu/stanford/nlp/naturalli/NaturalLogicRelation.java:29-
171 for the relation set, truth flags and join table; :202-537 for the
dependency-arc insertion map; :593-606 insertionToDeletion). The
algebra itself is MacCartney & Manning (2009)'s seven-relation set with
its published join table; behavior is pinned by the reference's own
NaturalLogicRelationTest (tests/test_natlog_relations.py).
"""
from __future__ import annotations

from enum import Enum
from typing import Optional


class NatLogRelation(Enum):
    # (fixed_index, maintains_truth, negates_truth,
    #  maintains_falsehood, negates_falsehood)
    EQUIVALENT = (0, True, False, True, False)
    FORWARD_ENTAILMENT = (1, True, False, False, False)
    REVERSE_ENTAILMENT = (2, False, False, True, False)
    NEGATION = (3, False, True, False, True)
    ALTERNATION = (4, False, True, False, False)
    COVER = (5, False, False, False, True)
    INDEPENDENCE = (6, False, False, False, False)

    def __init__(self, fixed_index, maintains_truth, negates_truth,
                 maintains_falsehood, negates_falsehood):
        self.fixed_index = fixed_index
        self.maintains_truth = maintains_truth
        self.negates_truth = negates_truth
        self.maintains_falsehood = maintains_falsehood
        self.negates_falsehood = negates_falsehood

    @classmethod
    def by_fixed_index(cls, i: int) -> "NatLogRelation":
        for rel in cls:
            if rel.fixed_index == i:
                return rel
        raise ValueError(f"no relation with fixed index {i}")

    def join(self, other: "NatLogRelation") -> "NatLogRelation":
        """MacCartney join: the relation of a chain of two relations."""
        return _JOIN[(self, other)]


_EQ = NatLogRelation.EQUIVALENT
_FE = NatLogRelation.FORWARD_ENTAILMENT
_RE = NatLogRelation.REVERSE_ENTAILMENT
_NEG = NatLogRelation.NEGATION
_ALT = NatLogRelation.ALTERNATION
_COV = NatLogRelation.COVER
_IND = NatLogRelation.INDEPENDENCE

# rows: first relation; columns follow the enum order
_JOIN_ROWS = {
    _EQ:  [_EQ, _FE, _RE, _NEG, _ALT, _COV, _IND],
    _FE:  [_FE, _FE, _IND, _COV, _COV, _IND, _IND],
    _RE:  [_RE, _IND, _RE, _COV, _IND, _COV, _IND],
    _NEG: [_NEG, _COV, _ALT, _EQ, _RE, _FE, _IND],
    _ALT: [_ALT, _IND, _ALT, _FE, _IND, _FE, _IND],
    _COV: [_COV, _COV, _IND, _RE, _RE, _IND, _IND],
    _IND: [_IND] * 7,
}
_ORDER = [_EQ, _FE, _RE, _NEG, _ALT, _COV, _IND]
_JOIN = {(a, _ORDER[j]): v for a, row in _JOIN_ROWS.items()
         for j, v in enumerate(row)}

# dependency arc → relation when the arc is INSERTED into a sentence
# (NaturalLogicRelation.java:202+; the nmod:*/obl:* prepositional family
# is uniformly REVERSE_ENTAILMENT and is handled by prefix fallback)
INSERTION_RELATIONS = {
    "acl": _RE, "acl:relcl": _RE, "acomp": _RE, "advcl": _RE,
    "advmod": _RE, "agent": _IND, "amod": _RE, "appos": _RE,
    "aux": _IND, "aux:pass": _IND, "case": _IND, "cc": _RE,
    "ccomp": _RE, "comp": _RE, "compound": _IND, "conj": _RE,
    "conj:and": _RE, "conj:and\\/or": _RE, "conj:both": _RE,
    "conj:but": _RE, "conj:nor": _FE, "conj:or": _FE, "conj:plus": _FE,
    "conj_x": _RE, "cop": _IND, "csubj": _RE, "csubj:pass": _IND,
    "dep": _RE, "det": _FE, "discourse": _EQ, "expl": _EQ,
    "flat": _IND, "goeswith": _EQ, "infmod": _RE, "iobj": _RE,
    "mark": _RE, "mwe": _IND, "neg": _NEG, "nmod": _RE, "nn": _IND,
    "npadvmod": _RE, "nsubj": _RE, "nsubj:pass": _IND, "number": _IND,
    "nummod": _IND, "obj": _RE, "obl": _RE, "op": _IND,
    "parataxis": _RE, "partmod": _RE, "pcomp": _IND, "pobj": _IND,
    "poss": _FE, "nmod:poss": _FE, "possessive": _IND,
    "preconj": _IND, "predet": _IND, "prt": _IND, "punct": _EQ,
    "purpcl": _RE, "quantmod": _FE, "rcmod": _RE, "ref": _RE,
    "root": _IND, "tmod": _RE, "vmod": _RE, "xcomp": _RE,
}


def for_dependency_insertion(label: str, is_subject: bool = True,
                             dependent: Optional[str] = None
                             ) -> NatLogRelation:
    """Relation for inserting an arc (object-side 'or' behaves as
    'and'; unknown prepositional/conj/advcl arcs default to RE)."""
    if not is_subject:
        if label in ("conj:or", "conj:nor"):
            return for_dependency_insertion("conj:and", False)
        if label == "cc:preconj":
            if dependent is not None and dependent.lower() == "neither":
                return _IND
            return _RE
    rel = INSERTION_RELATIONS.get(label.lower())
    if rel is not None:
        return rel
    if label.startswith(("nmod:", "obl:")) or label.startswith("conj") \
            or label.startswith("advcl"):
        return _RE
    return _IND


def insertion_to_deletion(rel: NatLogRelation) -> NatLogRelation:
    """Dual of insertion (forward↔reverse, alternation↔cover)."""
    return {
        _EQ: _EQ, _FE: _RE, _RE: _FE, _NEG: _NEG,
        _ALT: _COV, _COV: _ALT, _IND: _IND,
    }[rel]


def for_dependency_deletion(label: str, is_subject: bool = True,
                            dependent: Optional[str] = None
                            ) -> NatLogRelation:
    return insertion_to_deletion(
        for_dependency_insertion(label, is_subject, dependent))


# ------------------------------------------------------------ polarity ----
# Monotonicity projection (naturalli/Polarity.java:40-183: project() per
# operator; constructor composes operators outermost-last; Monotonicity
# / MonotonicityType per naturalli/Monotonicity*.java)

MONOTONE, ANTITONE, NONMONOTONE = "monotone", "antitone", "nonmonotone"
TYPE_NONE, ADDITIVE, MULTIPLICATIVE, BOTH = \
    "none", "additive", "multiplicative", "both"


def _project(rel: NatLogRelation, mono: str, mtype: str) -> NatLogRelation:
    """One operator's projection of a lexical relation."""
    if rel is _EQ:
        return _EQ
    if rel is _IND:
        return _IND
    if rel is _FE:
        return _FE if mono == MONOTONE else \
            _RE if mono == ANTITONE else _IND
    if rel is _RE:
        return _RE if mono == MONOTONE else \
            _FE if mono == ANTITONE else _IND
    if rel is _NEG:
        if mtype == TYPE_NONE or mono == NONMONOTONE:
            return _IND
        if mtype == BOTH:
            return _NEG
        if mtype == ADDITIVE:
            return _COV if mono == MONOTONE else _ALT
        return _ALT if mono == MONOTONE else _COV   # multiplicative
    if rel is _ALT:
        if mono == NONMONOTONE or mtype in (TYPE_NONE, ADDITIVE):
            return _IND
        return _ALT if mono == MONOTONE else _COV
    # COVER
    if mono == NONMONOTONE or mtype in (TYPE_NONE, MULTIPLICATIVE):
        return _IND
    return _COV if mono == MONOTONE else _ALT


class Polarity:
    """Composition of in-scope operators (innermost first) → a
    projection function over the seven relations."""

    def __init__(self, operators):
        ops = list(operators)
        if not ops:
            self.projection = {rel: rel for rel in NatLogRelation}
        else:
            self.projection = {}
            for rel in NatLogRelation:
                cur = rel
                for mono, mtype in reversed(ops):
                    cur = _project(cur, mono, mtype)
                self.projection[rel] = cur

    def project_lexical_relation(self, rel: NatLogRelation
                                 ) -> NatLogRelation:
        return self.projection[rel]

    @property
    def is_upwards(self) -> bool:
        return (self.projection[_FE] is _FE
                and self.projection[_RE] is _RE)

    @property
    def is_downwards(self) -> bool:
        return (self.projection[_FE] is _RE
                and self.projection[_RE] is _FE)

    def __str__(self) -> str:
        return "up" if self.is_upwards else \
            "down" if self.is_downwards else "flat"


POLARITY_DEFAULT = Polarity([(MONOTONE, BOTH)])
