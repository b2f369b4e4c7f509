"""Parity with the reference's AmericanizeTest goldens
(/root/reference/test/src/edu/stanford/nlp/process/AmericanizeTest.java
exBrEWords/exAmEWords)."""
import pytest

from corenlp_ray.functions.shapes import americanize

PAIRS = [("colour", "color"), ("encyclopaedia", "encyclopedia"),
         ("devour", "devour"), ("glamour", "glamour"), ("armour", "armor"),
         ("haematophilia", "hematophilia"), ("programme", "program"),
         ("behaviours", "behaviors"), ("vapours", "vapors"),
         ("travelling", "traveling"), ("realise", "realize"),
         ("rumours", "rumors"), ("detour", "detour"),
         ("Defence", "Defense")]


@pytest.mark.parametrize("bre,ame", PAIRS, ids=[p[0] for p in PAIRS])
def test_americanize(bre, ame):
    assert americanize(bre) == ame
