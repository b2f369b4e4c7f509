"""Parity with the reference's AcronymMatcherTest
(/root/reference/test/src/edu/stanford/nlp/util/AcronymMatcherTest.java)."""
import pytest

from corenlp_ray.functions.shapes import acronym_of, is_acronym

POSITIVE = [("B", "B"), ("IBM", "International Business Machines"),
            ("SIWI", "Stockholm International Water Institute"),
            ("CBRC", "China Banking Regulatory Commission"),
            ("ECC", "Election Complaints Commission"),
            ("CML", "Council of Mortgage Lenders"),
            ("AAAS", "American Association for the Advancement of Science"),
            ("FCI", "Fake Company International Corp.")]


@pytest.mark.parametrize("short,long", POSITIVE, ids=[p[0] for p in POSITIVE])
def test_is_acronym(short, long):
    assert is_acronym(short, long.split())


def test_not_acronym():
    assert not is_acronym("XYZ", "International Business Machines".split())
    assert not is_acronym("I.B.M.", "International Business Machines".split())


def test_acronym_of_filters_function_words():
    assert acronym_of("Council of Mortgage Lenders".split()) == "CML"
    assert acronym_of("Fake Company International Corp.".split()) == "FCI"
