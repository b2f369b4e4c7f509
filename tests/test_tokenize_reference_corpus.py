"""Full-corpus parity with the reference PTBTokenizer test suite
(/root/reference/test/src/edu/stanford/nlp/process/PTBTokenizerTest.java
ptbInputs/ptbGold arrays, extracted verbatim into data/ptb_gold.json).
All 80 input/gold pairs must tokenize EXACTLY — PTB bracket escapes,
directional quotes, abbreviation periods (incl. the duplicated
sentence-final period), assimilations, hyphen/number compounds, SGML
tags, emoticons, unpaired-surrogate dropping."""
import json
import pathlib

import pytest

from corenlp_ray.stages.tokenize import tokenize

_D = json.loads((pathlib.Path(__file__).parent / "data"
                 / "ptb_gold.json").read_text())


@pytest.mark.parametrize("idx", range(len(_D["golds"])))
def test_ptb_corpus_case(idx):
    text, gold = _D["inputs"][idx], _D["golds"][idx]
    got = [t[0] for t in tokenize(text)]
    assert got == gold, f"input {text!r}"


def test_invertibility_over_corpus():
    for text in _D["inputs"]:
        for w, orig, b, e in tokenize(text):
            assert text[b:e] == orig
