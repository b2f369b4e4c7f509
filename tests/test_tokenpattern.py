"""TokensRegex-style and semgrex-style mini engines (extension surface)."""
import pytest

from corenlp_ray.functions.tokenpattern import (DepPattern, TokenPattern,
                                                TokensRegexNERStage,
                                                load_mapping_file, toks_of)
from corenlp_ray.stages.depparse import parse_sentence
from corenlp_ray.stages.pos import tag_sentence
from corenlp_ray.stages.tokenize import tokenize


def sent(text):
    words = [t[0] for t in tokenize(text)]
    tags = tag_sentence(words)
    heads, labels = parse_sentence(words, tags)
    return words, tags, heads, labels


def test_token_pattern_literal_and_regex():
    words, tags, _, _ = sent("John Smith works for Initech.")
    toks = toks_of(words, tags=tags)
    p = TokenPattern("[pos:NNP]+ [word:works]")
    assert p.find_all(toks) == [(0, 3)]


def test_token_pattern_quantifiers():
    toks = toks_of(["a", "b", "b", "b", "c"])
    assert TokenPattern("[word:a] [word:b]{1,2} [word:b] [word:c]").find_all(toks) == [(0, 5)]
    assert TokenPattern("[word:a] [word:b]* [word:c]").find_all(toks) == [(0, 5)]
    assert TokenPattern("[word:x]?").find_all(toks) == []


def test_token_pattern_any_token():
    toks = toks_of(["x", "y", "z"])
    assert TokenPattern("[word:x] [] [word:z]").find_all(toks) == [(0, 3)]


def test_token_pattern_regex_attr():
    words, tags, _, _ = sent("He paid $5 and $10.")
    toks = toks_of(words, tags=tags)
    p = TokenPattern(r"[word:$] [word:/\d+/]")
    assert len(p.find_all(toks)) == 2


def test_token_pattern_errors():
    with pytest.raises(ValueError):
        TokenPattern("[unknown:x]")
    with pytest.raises(ValueError):
        TokenPattern("garbage [word:a]")


def test_dep_pattern_svo():
    words, tags, heads, labels = sent("Mary Johnson founded Hooli.")
    toks = toks_of(words, tags=tags)
    p = DepPattern("{pos:/VB.*/}=v >nsubj {}=s >obj {}=o")
    ms = p.match(toks, heads, labels)
    assert len(ms) == 1
    m = ms[0]
    assert words[m["v"]] == "founded"
    assert words[m["s"]] == "Johnson"
    assert words[m["o"]] == "Hooli"


def test_dep_pattern_no_match():
    words, tags, heads, labels = sent("Cats sleep.")
    toks = toks_of(words, tags=tags)
    assert DepPattern("{}=v >obj {}").match(toks, heads, labels) == []


def test_tokensregexner_overlay_priority_and_o_only():
    words, tags, _, _ = sent("The acme widget works with Initech gear.")
    ners = ["O"] * len(words)
    ners[5] = "ORGANIZATION"  # Initech pre-labeled
    stage = TokensRegexNERStage([
        ("[lower:acme] [lower:widget]", "PRODUCT", 1.0),
        ("[lower:initech]", "MISC", 5.0),  # must NOT overwrite non-O
        ("[lower:acme]", "ORG_X", 0.5),    # lower priority, overlapped
    ])
    out = stage.apply(words, None, tags, ners)
    assert out[1] == "PRODUCT" and out[2] == "PRODUCT"
    assert out[5] == "ORGANIZATION"


def test_mapping_file(tmp_path):
    f = tmp_path / "map.tsv"
    f.write_text("# comment\n[lower:foo]\tFOO\t2.0\n[lower:bar]\tBAR\n")
    entries = load_mapping_file(str(f))
    assert entries == [("[lower:foo]", "FOO", 2.0), ("[lower:bar]", "BAR", 0.0)]


def test_dep_pattern_governor_operator():
    """Semgrex '<' relation: the node is a dependent of the matched
    governor (SemgrexPattern.java child/parent relations)."""
    from corenlp_ray.functions.tokenpattern import DepPattern, toks_of

    words = "Cats eat meat".split()
    toks = toks_of(words, lemmas=["cat", "eat", "meat"],
                   tags=["NNS", "VBP", "NN"])
    heads = [1, -1, 1]
    labels = ["nsubj", "root", "obj"]
    p = DepPattern("{lemma:cat}=s <nsubj {pos:/VB.*/}=v")
    assert p.match(toks, heads, labels) == [{"s": 0, "v": 1}]
    # wrong edge label → no match
    p2 = DepPattern("{lemma:cat}=s <obj {pos:/VB.*/}=v")
    assert p2.match(toks, heads, labels) == []
    # governor with its own child clause
    p3 = DepPattern("{lemma:meat}=o <obj ( {pos:/VB.*/}=v "
                    ">nsubj {lemma:cat}=s )")
    m3 = p3.match(toks, heads, labels)
    assert m3 and m3[0]["v"] == 1 and m3[0]["s"] == 0
