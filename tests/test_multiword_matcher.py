"""MultiWordStringMatcher parity with the reference's own
MultiWordStringMatcherTest (test/src/edu/stanford/nlp/ling/tokensregex/
MultiWordStringMatcherTest.java) — every offset assertion mirrored."""
from corenlp_ray.functions.multiword_matcher import find_target_offsets


def test_exctws_matching():                 # MultiWordStringMatcherTest:16
    assert find_target_offsets("the government Al-Ahram newspaper",
                               "Al-Ahram", "EXCTWS") == [(15, 23)]
    assert find_target_offsets("the government Al- Ahram newspaper",
                               "Al-Ahram", "EXCTWS") == [(15, 24)]
    # 'Al -Ahram' requires whitespace between Al and the hyphen
    assert find_target_offsets("the government Al- Ahram newspaper",
                               "Al -Ahram", "EXCTWS") == []
    assert find_target_offsets("the government Al-Ahramnewspaper",
                               "Al -Ahram", "EXCTWS") == []
    assert find_target_offsets("the government AlAhram newspaper",
                               "Al -Ahram", "EXCTWS") == []
    # EXCTWS is case-sensitive
    assert find_target_offsets("the government alahram newspaper",
                               "Al -Ahram", "EXCTWS") == []
    assert find_target_offsets("NZ Oil &amp;amp; Gas",
                               "NZ Oil &amp;amp; Gas",
                               "EXCTWS") == [(0, 20)]


def test_lnrm_matching():                   # :46
    assert find_target_offsets("the government Al-Ahram newspaper",
                               "Al-Ahram", "LNRM") == [(15, 23)]
    assert find_target_offsets("the government Al- Ahram newspaper",
                               "Al-Ahram", "LNRM") == [(15, 24)]
    assert find_target_offsets("the government Al- Ahram newspaper",
                               "Al -Ahram", "LNRM") == [(15, 24)]
    # no boundary: glued following word blocks the match
    assert find_target_offsets("the government Al-Ahramnewspaper",
                               "Al -Ahram", "LNRM") == []
    assert find_target_offsets("the government AlAhram newspaper",
                               "Al -Ahram", "LNRM") == [(15, 22)]
    assert find_target_offsets("the government alahram newspaper",
                               "Al -Ahram", "LNRM") == [(15, 22)]


def test_exct_and_lws():
    assert find_target_offsets("see Al-Ahram here", "Al-Ahram",
                               "EXCT") == [(4, 12)]
    assert find_target_offsets("see al-ahram here", "Al-Ahram",
                               "LWS") == [(4, 12)]
