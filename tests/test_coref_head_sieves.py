"""StrictHeadMatch1-3 / RelaxedHeadMatch sieve tests (reference:
dcoref/sievepasses/StrictHeadMatch{1,2,3}.java, RelaxedHeadMatch.java;
rules dcoref/Rules.java:104 entityWordsIncluded, :113/:399
entityHaveIncompatibleModifier, :320 entityHeadsAgree)."""
from corenlp_ray.stages.coref import resolve_coref


def _run(words, tags, tok_sent, men):
    chain, canon, _, _ = resolve_coref(words, tags, tok_sent, men)
    return chain, canon


def test_strict_head_match_word_inclusion():
    # later mention's words ⊆ antecedent cluster → merge
    words = "The Florida Supreme Court ruled . The Supreme Court agreed .".split()
    tags = ["DT", "NNP", "NNP", "NNP", "VBD", ".",
            "DT", "NNP", "NNP", "VBD", "."]
    ts = [0] * 6 + [1] * 5
    men = [(1, 4, "ORGANIZATION", ""), (7, 9, "ORGANIZATION", "")]
    chain, canon = _run(words, tags, ts, men)
    assert chain[0] == chain[1]
    assert canon[1] == "Florida Supreme Court"


def test_strict_head_match_blocks_extra_modifier():
    # later mention introduces a NEW modifier (florida) absent from the
    # antecedent → word inclusion fails → no merge
    words = "The Supreme Court ruled . The Florida Supreme Court agreed .".split()
    tags = ["DT", "NNP", "NNP", "VBD", ".",
            "DT", "NNP", "NNP", "NNP", "VBD", "."]
    ts = [0] * 5 + [1] * 6
    men = [(1, 3, "ORGANIZATION", ""), (6, 9, "ORGANIZATION", "")]
    chain, _ = _run(words, tags, ts, men)
    assert chain[0] != chain[1]


def test_relaxed_head_match_surname():
    words = "Bernard Sanders spoke . Sanders agreed .".split()
    tags = ["NNP", "NNP", "VBD", ".", "NNP", "VBD", "."]
    ts = [0] * 4 + [1] * 3
    men = [(0, 2, "PERSON", ""), (4, 5, "PERSON", "")]
    chain, canon = _run(words, tags, ts, men)
    assert chain[0] == chain[1]
    assert canon[1] == "Bernard Sanders"


def test_corporate_suffix_not_a_head():
    # both end in "Inc." — a naive last-token head key would merge them
    words = "Acme Inc. fell . Widget Inc. rose .".split()
    tags = ["NNP", "NNP", "VBD", ".", "NNP", "NNP", "VBD", "."]
    ts = [0] * 4 + [1] * 4
    men = [(0, 2, "ORGANIZATION", ""), (4, 6, "ORGANIZATION", "")]
    chain, _ = _run(words, tags, ts, men)
    assert chain[0] != chain[1]


def test_type_mismatch_blocks_head_match():
    # same head word, different NER type → no merge
    words = "Jordan visited . Jordan scored .".split()
    tags = ["NNP", "VBD", ".", "NNP", "VBD", "."]
    ts = [0] * 3 + [1] * 3
    men = [(0, 1, "LOCATION", ""), (3, 4, "PERSON", "")]
    chain, _ = _run(words, tags, ts, men)
    assert chain[0] != chain[1]


def test_location_modifier_blocks():
    # Rules.java locationModifier: "western X" vs "eastern X" must not
    # merge (modifier sets are incompatible in both directions)
    words = "The western region grew . The eastern region shrank .".split()
    tags = ["DT", "JJ", "NN", "VBD", ".", "DT", "JJ", "NN", "VBD", "."]
    ts = [0] * 5 + [1] * 5
    men = [(1, 3, "LOCATION", ""), (6, 8, "LOCATION", "")]
    chain, _ = _run(words, tags, ts, men)
    assert chain[0] != chain[1]
