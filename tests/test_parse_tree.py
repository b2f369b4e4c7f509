"""Dependency→constituency projection tests (stages/parse_tree.py —
the ParserAnnotator-surface ◐ row)."""
from corenlp_ray.stages.depparse import parse_sentence
from corenlp_ray.stages.parse_tree import (dep_to_constituency,
                                           tree_leaves)
from corenlp_ray.stages.pos import tag_sentence

_SENTS = [
    "The quick brown fox jumped over the lazy dog .",
    "President Obama visited Paris last week .",
    "Investors bought bonds and sold stocks .",
    "She sells shares of Acme Corp. in Chicago .",
    "He said the bank would cut costs .",
]


def _tree(s):
    words = s.split()
    tags = tag_sentence(words)
    heads, _ = parse_sentence(words, tags)
    return words, dep_to_constituency(words, tags, heads)


def test_leaves_are_the_sentence_in_order():
    for s in _SENTS:
        words, tree = _tree(s)
        assert tree_leaves(tree) == [w.replace("(", "-LRB-")
                                     .replace(")", "-RRB-")
                                     for w in words]


def test_balanced_brackets():
    for s in _SENTS:
        _, tree = _tree(s)
        depth = 0
        for ch in tree:
            depth += ch == "("
            depth -= ch == ")"
            assert depth >= 0
        assert depth == 0


def test_basic_structure():
    words, tree = _tree("The quick brown fox jumped over the lazy dog .")
    assert tree.startswith("(ROOT (S ")
    assert "(VP" in tree            # verbal head projects a VP
    assert "(NP" in tree            # nominal subtree projects an NP
    assert "(VBD jumped)" in tree


def test_simple_np():
    tree = dep_to_constituency(["The", "dog"], ["DT", "NN"], [1, -1])
    assert tree == "(ROOT (S (NP (DT The) (NN dog))))"


def test_bracket_escaping():
    tree = dep_to_constituency(["(", "ok", ")"], ["-LRB-", "JJ", "-RRB-"],
                               [1, -1, 1])
    assert "-LRB-" in tree and ")" not in tree_leaves(tree)[0]


def test_empty_sentence():
    assert dep_to_constituency([], [], []) == "(ROOT)"


def test_batch_stage(ray_session):
    import ray.data as rd

    from corenlp_ray.stages.parse_tree import parse_tree_batch

    words = "The dog ran .".split()
    tags = ["DT", "NN", "VBD", "."]
    heads, _ = parse_sentence(words, tags)
    ds = rd.from_items([{
        "tok_word": words, "tok_pos": tags, "dep_head": heads,
        "sent_begin": [0], "sent_end": [4]}])
    row = ds.map_batches(parse_tree_batch,
                         batch_format="pyarrow").take_all()[0]
    trees = list(row["parse_tree"])
    assert len(trees) == 1
    assert tree_leaves(trees[0]) == words
