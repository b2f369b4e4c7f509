"""Full parity with the reference's Morphology goldens
(/root/reference/test/src/edu/stanford/nlp/process/MorphologyTest.java
exWords/exTags/exAnswers, extracted verbatim into data/morph_gold.json):
every (word, POS) → lemma triple must match exactly — contracted
auxiliaries, pronoun nominatives, comparative/superlative repair,
doubling policy, invariant plurals, case preservation rules."""
import json
import pathlib

import pytest

from corenlp_ray.stages.lemma import lemma_of

_CASES = json.loads((pathlib.Path(__file__).parent / "data"
                     / "morph_gold.json").read_text())["cases"]


@pytest.mark.parametrize("word,tag,want", _CASES,
                         ids=[f"{w}/{t}" for w, t, _ in _CASES])
def test_morphology_case(word, tag, want):
    assert lemma_of(word, tag) == want
