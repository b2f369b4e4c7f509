"""WordShapeClassifier chris2 parity with the reference's own
WordShapeClassifierTest arrays (test/src/edu/stanford/nlp/process/
WordShapeClassifierTest.java:10-58 inputs/chris2outputs/knownLC) —
copied verbatim."""
import pytest

from corenlp_ray.functions.shapes import (word_shape_chris2,
                                          word_shape_digits)

INPUTS = ["fabulous", "Jørgensen", "--", "beta-carotene", "x-ray", "A.",
          "supercalifragilisticexpialadocious", "58", "59,000",
          "NF-kappa", "Exxon-Mobil", "a", "A4", "IFN-gamma-inducible",
          "PPARgamma", "NF-kappaB", "CBF1/RBP-Jkappa", "", "It's",
          "A-4", "congrès", "3,35%", "6€", "}", "《", "０-９", "四千",
          "五亿◯", "ＰＱ", "الحرازي", "2008", "427891", "A.B.C.",
          "22-34", "Ak47", "frEaKy", "美方称", "alphabeta", "betaalpha",
          "betalpha", "alpha-beta", "beta-alpha", "zalphabeta",
          "zbetaalpha", "zbetalpha", "zalpha-beta", "zbeta-alpha",
          "????", "***"]

CHRIS2 = ["xxxxx", "Xxxxx", "--", "g-xxx", "x-xxx", "X.", "xxxxx",
          "dd", "dd,ddd", "XX-g", "Xx-Xxxx", "x", "Xd", "XX-Xgxxx",
          "XXXg", "XX-gX", "XX-/Xdg", "", "Xx'x", "X-d", "xxxxx",
          "d,dd%", "d€", "}", "《", "d-d", "四千", "五亿◯", "XX",
          "الاحرزي", "dddd", "ddddd", "X..XX.", "dd-dd", "Xxdd",
          "xxXxXx", "美方称", "gg", "gg", "gxxx", "g-g", "g-g", "xgg",
          "xgg", "xgxxx", "xg-g", "xg-g", "????", "***"]

CHRIS2_KNOWN_LC = ["xxxxxk", "Xxxxx", "--", "g-xxx", "x-xxx", "X.",
                   "xxxxx", "dd", "dd,ddd", "XX-g", "Xx-Xxxx", "xk",
                   "Xd", "XX-Xgxxx", "XXXg", "XX-gX", "XX-/Xdg", "",
                   "Xx'x", "X-d", "xxxxx", "d,dd%", "d€", "}", "《",
                   "d-d", "四千", "五亿◯", "XX", "الاحرزي", "dddd",
                   "ddddd", "X..XX.", "dd-dd", "Xxdd", "xxXxXx", "美方称",
                   "gg", "gg", "gxxx", "g-g", "g-g", "xgg", "xgg",
                   "xgxxx", "xg-g", "xg-g", "????", "***"]

DIGITS = ["fabulous", "Jørgensen", "--", "beta-carotene", "x-ray", "A.",
          "supercalifragilisticexpialadocious", "99", "99,999",
          "NF-kappa", "Exxon-Mobil", "a", "A9", "IFN-gamma-inducible",
          "PPARgamma", "NF-kappaB", "CBF9/RBP-Jkappa", "", "It's",
          "A-9", "congrès", "9,99%", "9€", "}", "《", "9-9", "四千",
          "五亿◯", "ＰＱ", "الحرازي", "9999", "999999", "A.B.C.",
          "99-99", "Ak99", "frEaKy", "美方称", "alphabeta", "betaalpha",
          "betalpha", "alpha-beta", "beta-alpha", "zalphabeta",
          "zbetaalpha", "zbetalpha", "zalpha-beta", "zbeta-alpha",
          "????", "***"]

KNOWN_LC = {"house", "fabulous", "octopus", "a"}


@pytest.mark.parametrize("word,want", list(zip(INPUTS, CHRIS2)))
def test_chris2(word, want):
    assert word_shape_chris2(word) == want


@pytest.mark.parametrize("word,want",
                         list(zip(INPUTS, CHRIS2_KNOWN_LC)))
def test_chris2_known_lc(word, want):
    assert word_shape_chris2(word, KNOWN_LC) == want


@pytest.mark.parametrize("word,want", list(zip(INPUTS, DIGITS)))
def test_digits_shape(word, want):
    assert word_shape_digits(word) == want
