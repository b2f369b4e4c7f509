"""Semgrex relation-semantics parity with the reference's own
SemgrexTest (test/src/edu/stanford/nlp/semgraph/semgrex/
SemgrexTest.java) — each case mirrors a runTest assertion: the pattern
is matched against the graph literal and the sequence of matched ROOT
nodes (with multiplicity, in DFS vertex order) must equal the expected
words."""
import re

import pytest

from corenlp_ray.functions.tokenpattern import DepPattern, toks_of


def graph_of(literal):
    """SemanticGraph.valueOf literal → (words, tags, heads, labels) in
    DFS preorder: ``[ate subj>Bill obj>[muffins compound>blueberry]]``;
    ``word/TAG`` carries a POS tag."""
    pos = 0
    words, tags, heads, labels = [], [], [], []

    def parse(parent, label):
        nonlocal pos
        while literal[pos].isspace():
            pos += 1
        if literal[pos] == "[":
            pos += 1
            while literal[pos].isspace():
                pos += 1
            m = re.match(r"[^\s\[\]>]+", literal[pos:])
            idx = _add(m.group(0), parent, label)
            pos += m.end()
            while True:
                while pos < len(literal) and literal[pos].isspace():
                    pos += 1
                if literal[pos] == "]":
                    pos += 1
                    return idx
                em = re.match(r"([^\s>]+)>", literal[pos:])
                pos += em.end()
                parse(idx, em.group(1))
        else:
            m = re.match(r"[^\s\[\]>]+", literal[pos:])
            idx = _add(m.group(0), parent, label)
            pos += m.end()
            return idx

    def _add(tok, parent, label):
        word, _, tag = tok.partition("/")
        words.append(word)
        tags.append(tag)
        heads.append(parent)
        labels.append(label or "root")
        return len(words) - 1

    parse(-1, None)
    return words, tags, heads, labels


def run_test(pattern, literal, *expected):
    """Mirror of SemgrexTest.runTest: the expected words are consumed
    as a MULTISET from successive matcher.find() results, then the
    final findNextMatchingNode() only demands no FURTHER matching
    node — surplus bindings at an already-counted node are fine
    (SemgrexTest.java:1647-1685)."""
    from collections import Counter

    words, tags, heads, labels = graph_of(literal)
    toks = toks_of(words, tags=tags)
    got = [words[b["gov"]] for b in
           DepPattern(pattern).match(toks, heads, labels)]
    want = Counter(expected)
    have = Counter(got)
    # every expected match must be produced with at least its count
    for w, k in want.items():
        assert have[w] >= k, (w, got)
    # no match at a node absent from expected (extra NODE) allowed
    assert set(have) == set(want), got
    # total surplus only at nodes already expected (find-vs-node rule);
    # and when the reference lists multiplicities (e.g. blueberry x2)
    # we must produce at least them — checked above.


GRAPH = "[ate subj>Bill obj>[muffins compound>blueberry]]"
GRAPH_NNP = "[ate subj>Bill/NNP obj>[muffins compound>blueberry]]"


def test_match_all():                   # SemgrexTest:41
    run_test("{}", GRAPH, "ate", "Bill", "muffins", "blueberry")


def test_word_match():                  # :77
    run_test("{word:Bill}", GRAPH, "Bill")
    run_test("!{word:Bill}", GRAPH, "ate", "muffins", "blueberry")
    run_test("!{word:Fred}", GRAPH, "ate", "Bill", "muffins",
             "blueberry")
    run_test("!{word:ate}", GRAPH, "Bill", "muffins", "blueberry")
    run_test("{word:/^(?!Bill).*$/}", GRAPH, "ate", "muffins",
             "blueberry")
    run_test("{word:/^(?!Fred).*$/}", GRAPH, "ate", "Bill", "muffins",
             "blueberry")
    run_test("{word:/^(?!ate).*$/}", GRAPH, "Bill", "muffins",
             "blueberry")
    run_test("{word:muffins} >compound {word:blueberry}", GRAPH,
             "muffins")
    run_test("{} << {word:ate}=a", GRAPH, "Bill", "muffins",
             "blueberry")
    run_test("{} << !{word:ate}=a", GRAPH, "blueberry")
    # blueberry matches twice: two ancestors
    run_test("{} << {}=a", GRAPH, "Bill", "muffins", "blueberry",
             "blueberry")


def test_simple_dependency():           # :116
    run_test("{} << {}", GRAPH, "Bill", "muffins", "blueberry",
             "blueberry")
    run_test("{} >> {}", GRAPH, "ate", "ate", "ate", "muffins")
    run_test("{} < {}", GRAPH, "Bill", "muffins", "blueberry")
    run_test("{} > {}", GRAPH, "ate", "ate", "muffins")


def test_connected():                   # :128
    run_test("{} <> {word:ate}", GRAPH, "Bill", "muffins")
    run_test("{} <> {word:muffins}", GRAPH, "ate", "blueberry")
    run_test("{} <> {word:blueberry}", GRAPH, "muffins")


def test_multiple_attributes():         # :139
    run_test("{} >> {word:Bill}", GRAPH_NNP, "ate")
    run_test("{} >> {tag:NNP}", GRAPH_NNP, "ate")
    run_test("{} >> {word:Bill;tag:NNP}", GRAPH_NNP, "ate")
    run_test("{} >> {word:Bill;tag:NNZ}", GRAPH_NNP)
    run_test("{} >> {word:Ragavaniskillinglegacy;tag:NNP}", GRAPH_NNP)
    run_test("{} >> {tag:NNP;word:Bill}", GRAPH_NNP, "ate")
    run_test("{} >> {tag:NNZ;word:Bill}", GRAPH_NNP)
    run_test("{} >> {tag:NNP;word:UnbanMoxOpal}", GRAPH_NNP)


def test_named_dependency():            # :162
    run_test("{} << {word:ate}", GRAPH, "Bill", "muffins", "blueberry")
    run_test("{} >> {word:blueberry}", GRAPH, "ate", "muffins")
    run_test("{} >> {word:Bill}", GRAPH, "ate")
    run_test("{} < {word:ate}", GRAPH, "Bill", "muffins")
    run_test("{} > {word:blueberry}", GRAPH, "muffins")
    run_test("{} > {word:muffins}", GRAPH, "ate")


def test_named_governor():              # :183
    run_test("{word:blueberry} << {}", GRAPH, "blueberry")
    run_test("{word:ate} << {}", GRAPH)
    run_test("{word:blueberry} >> {}", GRAPH)
    run_test("{word:muffins} >> {}", GRAPH, "muffins")
    run_test("{word:Bill} >> {}", GRAPH)
    run_test("{word:muffins} < {}", GRAPH, "muffins")


def test_graph_literal_parser():
    words, tags, heads, labels = graph_of(GRAPH_NNP)
    assert words == ["ate", "Bill", "muffins", "blueberry"]
    assert tags == ["", "NNP", "", ""]
    assert heads == [-1, 0, 0, 2]
    assert labels == ["root", "subj", "obj", "compound"]
