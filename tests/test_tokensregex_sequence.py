"""TokensRegex sequence-language parity (round-2 verdict missing #6).

Expected values mined from the reference's own
itest/src/edu/stanford/nlp/ling/tokensregex/TokenSequenceMatcherITest.java
(golden-output mining): testTokenSequenceMatcher1 (:160 literals,
alternation), 3 (:315 groups+repeats), 8 (:985 wildcard-class runs),
9 (:1020 named groups), 10 (:1052 bare alternation), BackRef (:1642),
MultiNodePattern2 (:1615 greedy vs reluctant), MultiPatternMatcher
(:1662 priority), plus the annotate action (:1534 ==> &annotate).

Token streams are built directly (word/pos/ner dicts) so the suite
pins MATCHER semantics, not the tokenizer.
"""
from corenlp_ray.functions.tokensregex import (MultiTokensRegex,
                                               TokensRegex,
                                               annotate_rules,
                                               extract_rules)

TEXT1 = ("Mellitus was the first Bishop of London , the third Archbishop "
         "of Canterbury , and a member of the Gregorian mission sent to "
         "England to convert the Anglo-Saxons . He arrived in 601 AD , "
         "and was consecrated as Bishop of London in 604 .")


def toks(text, tags=None, ners=None):
    words = text.split()
    tags = tags or [""] * len(words)
    ners = ners or [""] * len(words)
    return [{"word": w, "lower": w.lower(), "lemma": w.lower(),
             "pos": p, "ner": e}
            for w, p, e in zip(words, tags, ners)]


T1 = toks(TEXT1)


def groups_of(p, ts):
    return [(m.group(0), [m.group(i) for i in range(1, p.ngroups + 1)])
            for m in p.find_all(ts)]


# --- testTokenSequenceMatcher1: literal sequence + alternation ---

def test_literal_sequence():
    p = TokensRegex.compile("/Archbishop/ /of/ /Canterbury/")
    ms = p.find_all(T1)
    assert [m.group() for m in ms] == ["Archbishop of Canterbury"]


def test_alternation_of_sequences():
    p = TokensRegex.compile(
        "Archbishop of Canterbury | Bishop of London")
    ms = p.find_all(T1)
    assert [m.group() for m in ms] == [
        "Bishop of London", "Archbishop of Canterbury",
        "Bishop of London"]


def test_anchors():
    assert not TokensRegex.compile(
        "^ Archbishop of Canterbury").find_all(T1)
    begin = TokensRegex.compile("^ Mellitus was the").find_all(T1)
    assert [m.group() for m in begin] == ["Mellitus was the"]
    assert not TokensRegex.compile(
        "Archbishop of Canterbury $").find_all(T1)
    end = TokensRegex.compile("London in 604 . $").find_all(T1)
    assert [m.group() for m in end] == ["London in 604 ."]


# --- testTokenSequenceMatcher3: groups + {m,n} repeats ---

def test_groups_with_repeats():
    p = TokensRegex.compile("(/[A-Za-z]+/{1,2}) /of/ (/[A-Za-z]+/{1,3})")
    got = groups_of(p, T1)
    assert got[0] == ("first Bishop of London, the".split()[0:0] or
                      "first Bishop of London",
                      ["first Bishop", "London"])
    assert got[1] == ("third Archbishop of Canterbury",
                      ["third Archbishop", "Canterbury"])
    assert got[2] == ("a member of the Gregorian mission",
                      ["a member", "the Gregorian mission"])
    assert got[3] == ("as Bishop of London in",
                      ["as Bishop", "London in"])
    assert len(got) == 4


def test_groups_reluctant_inner():
    p = TokensRegex.compile("(/[A-Za-z]+/{2,2}) /of/ (/[A-Za-z]+/{1,3}?)")
    got = groups_of(p, T1)
    assert got[0] == ("first Bishop of London",
                      ["first Bishop", "London"])
    assert got[2] == ("a member of the", ["a member", "the"])
    assert got[3] == ("as Bishop of London", ["as Bishop", "London"])


# --- testTokenSequenceMatcher8: [ /re/ ] runs + anchored literals ---

def test_bracket_regex_star_runs():
    p = TokensRegex.compile("[ /[A-Za-z]+/ ]*")
    ms = p.find_all(T1)
    assert ms[0].group() == "Mellitus was the first Bishop of London"
    assert ms[1].group() == "the third Archbishop of Canterbury"


def test_star_then_literals_matches_empty_prefix():
    p = TokensRegex.compile('[ /[A-Za-z]+/ ]*  ["Mellitus"] [ "was"]')
    ms = p.find_all(T1)
    assert [m.group() for m in ms] == ["Mellitus was"]
    p = TokensRegex.compile('[ /[A-Za-z]+/ ]+  ["Mellitus"] [ "was"]')
    assert p.find_all(T1) == []


# --- testTokenSequenceMatcher9: named groups + attr conjunction ---

def test_named_groups_and_conjunction():
    tags = [""] * len(T1)
    # tag the NNPs the reference's tagger finds in the relevant window
    words = TEXT1.split()
    for i, w in enumerate(words):
        if w in ("Mellitus", "Bishop", "London", "Archbishop",
                 "Canterbury", "England", "Anglo-Saxons", "AD"):
            tags[i] = "NNP"
    ts = toks(TEXT1, tags=tags)
    p = TokensRegex.compile(
        "(?$contextprev /.*/) (?$test [{tag:NNP} & /.*/]) "
        "(?$contextnext [/.*/])")
    m = p.find_all(ts)[0]
    assert p.ngroups == 3
    assert m.group() == "first Bishop of"
    assert m.group(1) == "first"
    assert m.group(2) == "Bishop"
    assert m.group(3) == "of"
    assert m.group("contextprev") == "first"
    assert m.group("test") == "Bishop"
    assert m.group("contextnext") == "of"
    assert m.span("test") == (4, 5)


# --- testTokenSequenceMatcher10: bare alternation in one group ---

def test_bare_alternation_scan():
    ts = toks("the number is five or 5 or 5.0 or but not 5x or -5 "
              "or 5L .")
    p = TokensRegex.compile("(five|5|5x|5.0|-5|5L)")
    got = [m.group(1) for m in p.find_all(ts)]
    assert got == ["five", "5", "5.0", "5x", "-5", "5L"]


# --- testTokenSequenceMatcherBackRef ---

def test_backreference():
    ts = toks("A A A A A A A B A A B A C A E A A A A A A A A A A A B "
              "A A A")
    p = TokensRegex.compile(r"(/A/+) B \1")
    got = [m.group() for m in p.find_all(ts)]
    assert got == ["A A B A A", "A A A B A A A"]


# --- testTokenSequenceMatcherMultiNodePattern2: greedy vs reluctant ---

def test_greedy_vs_reluctant_group_repeat():
    ts = toks("Replace the lamp with model wss.32dc55c3e945384dbc5e533ab711fd24")
    # whole-token regexes (the reference aggregates sub-tokens; our
    # tokens arrive pre-split so the {1,4} run is over whole tokens)
    g = TokensRegex.compile(r"/model/ (/\w+\.\w+/{1,1})")
    m = g.find_all(ts)[0]
    assert m.group(1) == "wss.32dc55c3e945384dbc5e533ab711fd24"


def test_reluctant_quantifiers():
    ts = toks("a b b b c")
    greedy = TokensRegex.compile("a (/b/+) ")
    assert greedy.find_all(ts)[0].group(1) == "b b b"
    reluctant = TokensRegex.compile("a (/b/+?)")
    assert reluctant.find_all(ts)[0].group(1) == "b"


# --- testMultiPatternMatcher: priority overlap resolution ---

def test_multi_pattern_priority():
    p1 = TokensRegex.compile("/Archbishop/ /of/ /Canterbury/",
                             priority=1)
    p2 = TokensRegex.compile("/[a-zA-Z]+/{1,2} /of/ /[a-zA-Z]+/+")
    multi = MultiTokensRegex([p2, p1])
    got = [m.group() for m, _ in multi.find_non_overlapping(T1)]
    # p1's higher priority carves out the exact Canterbury span
    assert "Archbishop of Canterbury" in got
    assert all("Archbishop of Canterbury" not in g or
               g == "Archbishop of Canterbury" for g in got)


# --- annotate action (==> &annotate({ner=...})) + extraction ---

def test_annotate_action():
    ts = toks("He served four years in office")
    rules = [(TokensRegex.compile("/four/ /years/"), {"ner": "DURATION"})]
    out = annotate_rules(ts, rules)
    assert [t["ner"] for t in out] == ["", "", "DURATION", "DURATION",
                                      "", ""]
    # input untouched
    assert all(t["ner"] == "" for t in ts)
    # annotated stream is matchable by an ner constraint (the
    # reference's follow-on "[ { ner:YEAR } ]+" pattern)
    p2 = TokensRegex.compile("[ { ner:DURATION } ]+")
    assert [m.group() for m in p2.find_all(out)] == ["four years"]


def test_extract_rules_group_template():
    ts = toks("Susan Clark is the chief executive officer of Hooli")
    p = TokensRegex.compile(
        "(?$title /chief|executive|officer/+) /of/ (?$org /[A-Z]\\w+/)")
    got = extract_rules(ts, [(p, "$title@$org")])
    assert got == [("chief executive officer@Hooli",
                    "chief executive officer of Hooli", 4, 9)]


def test_case_insensitive_flag():
    ts = toks("ATROPINE causes sweating")
    p = TokensRegex.compile('(?i) "atropine"')
    assert [m.group() for m in p.find_all(ts)] == ["ATROPINE"]


def test_negated_bracket_constraint():
    ts = toks("one two three", tags=["CD", "CD", "NN"])
    p = TokensRegex.compile("[ !{pos:CD} ]")
    assert [m.group() for m in p.find_all(ts)] == ["three"]


def test_curly_exact_repeat():
    ts = toks("x x x x")
    p = TokensRegex.compile("/x/{2}")
    ms = p.find_all(ts)
    assert [m.group() for m in ms] == ["x x", "x x"]


def test_open_ended_repeat():
    ts = toks("y x x x z")
    p = TokensRegex.compile("/x/{2,}")
    assert [m.group() for m in p.find_all(ts)] == ["x x x"]
