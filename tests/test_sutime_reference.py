"""SUTime relative/holiday resolution parity with the reference's own
itest goldens (itest/src/edu/stanford/nlp/time/SUTimeITest.java) —
each (phrase, docdate) → value triple below appears verbatim in the
reference's expectedTimexesResolved lists (or follows directly from its
holiday table in src/edu/stanford/nlp/time/rules/
english.holidays.sutime.txt + JollyDayHolidays.java)."""
import datetime as dt

import pytest

from corenlp_ray.functions.sutime import (
    RELATIVE_RE, easter_date, find_relative_expressions, resolve_relative)

D95 = dt.date(1995, 7, 20)    # Thursday — SUTimeITest testSUTime2
D99 = dt.date(1999, 12, 30)   # testSUTimeDate
D03 = dt.date(2003, 4, 14)    # Monday — testSUTimeDateRanges
D98 = dt.date(1998, 4, 17)    # testSUTimeTime

REFERENCE_GOLDENS = [
    # SUTimeITest.java:465-487 (docdate 19950720)
    ("two weeks from next Tuesday", D95, "1995-08-08"),
    ("2 days before yesterday", D95, "1995-07-17"),
    ("Thursday", D95, "1995-07-20"),
    ("Friday", D95, "1995-07-21"),
    ("Saturday", D95, "1995-07-22"),
    ("yesterday", D95, "1995-07-19"),
    ("today", D95, "1995-07-20"),
    ("second quarter", D95, "1995-Q2"),
    ("the second of December", D95, "1994-12-02"),
    ("the second of June", D95, "1995-06-02"),
    ("the second of July", D95, "1995-07-02"),
    ("the second of August", D95, "1994-08-02"),
    ("October of 1963", D95, "1963-10"),
    # SUTimeITest.java:550-560 (docdate 1999-12-30)
    ("the summer of 1964", D99, "1964-SU"),
    ("last week", D99, "1999-W51"),
    ("Saturday last week", D99, "1999-12-25"),
    # SUTimeITest.java:857-867 (docdate 20030414)
    ("this week", D03, "2003-W16"),
    ("last week", D03, "2003-W15"),
    ("last month", D03, "2003-03"),
    ("tomorrow", D03, "2003-04-15"),
    # SUTimeITest.java:670 (docdate 19980417)
    ("tomorrow", D98, "1998-04-18"),
    ("yesterday", D98, "1998-04-16"),
    # SUTimeITest.java:1253-1261 + holiday rules
    ("Christmas 2010", D95, "2010-12-25"),
    ("Easter 2011", D95, "2011-04-24"),
    ("mother's day 2012", D95, "2012-05-13"),
    ("November 1943", D95, "1943-11"),
]


@pytest.mark.parametrize("phrase,docdate,want", REFERENCE_GOLDENS)
def test_reference_golden(phrase, docdate, want):
    assert resolve_relative(phrase, docdate) == want


def test_offsets_and_arithmetic():
    assert resolve_relative("3 days ago", D95) == "1995-07-17"
    assert resolve_relative("two weeks from now", D95) == "1995-08-03"
    assert resolve_relative("2 years ago", D95) == "1993"
    assert resolve_relative("six months ago", D95) == "1995-01"
    assert resolve_relative("next month", dt.date(2003, 12, 14)) == "2004-01"
    assert resolve_relative("last quarter", dt.date(2003, 1, 14)) == "2002-Q4"
    assert resolve_relative("next year", D95) == "1996"


def test_weekday_modifiers():
    # next <wd> = strictly after; last <wd> = strictly before
    assert resolve_relative("next Thursday", D95) == "1995-07-27"
    assert resolve_relative("last Thursday", D95) == "1995-07-13"
    assert resolve_relative("next Tuesday", D95) == "1995-07-25"
    assert resolve_relative("last Friday", D95) == "1995-07-14"


def test_holidays_resolve_to_most_recent_past_without_year():
    assert resolve_relative("Thanksgiving", D03) == "2002-11-28"
    assert resolve_relative("Christmas", D99) == "1999-12-25"
    assert resolve_relative("Halloween", D95) == "1994-10-31"
    assert resolve_relative("good friday", D95) == "1995-04-14"


def test_easter_computus():
    assert easter_date(2011) == dt.date(2011, 4, 24)
    assert easter_date(2010) == dt.date(2010, 4, 4)
    assert easter_date(2000) == dt.date(2000, 4, 23)


def test_docdate_accepts_iso_string():
    assert resolve_relative("yesterday", "1995-07-20") == "1995-07-19"
    assert resolve_relative("yesterday", "1995-07-20T10:30:00") == \
        "1995-07-19"


def test_find_expressions_spans():
    text = "We met last week and will meet next Tuesday near Christmas."
    out = find_relative_expressions(text, D03)
    assert [(b, e) == (text.index(p), text.index(p) + len(p))
            for b, e, p, _ in out]
    assert [(p, v) for _, _, p, v in out] == [
        ("last week", "2003-W15"), ("next Tuesday", "2003-04-15"),
        ("Christmas", "2002-12-25")]


def test_pattern_is_lookahead_free_for_re2():
    """The alternation must stay shareable with DuckDB RE2 oracles."""
    assert "(?=" not in RELATIVE_RE.pattern
    assert "(?!" not in RELATIVE_RE.pattern
    assert "(?<" not in RELATIVE_RE.pattern


def test_clock_time_with_relative_day():
    # SUTimeITest.java:670 (docdate 19980417)
    assert resolve_relative("9 a.m. tomorrow", D98) == "1998-04-18T09:00"
    assert resolve_relative("6:15 yesterday", D98) == "1998-04-16T06:15"
    assert resolve_relative("tomorrow at 3 pm", D98) == "1998-04-18T15:00"
    assert resolve_relative("today at 12 am", D98) == "1998-04-17T00:00"


def test_durations():
    # SUTimeITest.java:848/866: 'the last 3 months' → P3M
    assert resolve_relative("the last 3 months", D98) == "P3M"
    assert resolve_relative("past two weeks", D98) == "P2W"
    assert resolve_relative("next 5 days", D98) == "P5D"
    assert resolve_relative("last 2 years", D98) == "P2Y"


def test_duration_does_not_shadow_plain_relatives():
    import datetime as dt
    assert resolve_relative("last week", dt.date(2003, 4, 14)) == \
        "2003-W15"
    assert resolve_relative("3 days ago", D95) == "1995-07-17"


# ------------------------------------------ testNext/testThis ranges ----
# (test/src/edu/stanford/nlp/time/SUTimeTest.java:38-110 — anchor
# Sunday 2016-06-19; expected range strings mirrored)

D16 = dt.date(2016, 6, 19)


def _rng(phrase, d=D16):
    from corenlp_ray.functions.sutime import value_range
    return value_range(resolve_relative(phrase, d))


def test_sutime_test_next_ranges():
    assert _rng("next Monday") == "2016-06-20/2016-06-20"
    assert _rng("next Saturday") == "2016-06-25/2016-06-25"
    assert _rng("next Sunday") == "2016-06-26/2016-06-26"
    assert _rng("next week") == "2016-06-20/2016-06-26"
    assert _rng("next month") == "2016-07-01/2016-07-31"
    assert _rng("next quarter") == "2016-07-01/2016-09-30"
    assert _rng("next year") == "2017-01-01/2017-12-31"


def test_sutime_test_this_ranges():
    assert _rng("this Monday") == "2016-06-13/2016-06-13"
    assert _rng("this Friday") == "2016-06-17/2016-06-17"
    assert _rng("this week") == "2016-06-13/2016-06-19"
    assert _rng("this month") == "2016-06-01/2016-06-30"
    assert _rng("this quarter") == "2016-04-01/2016-06-30"
    assert _rng("this year") == "2016-01-01/2016-12-31"


def test_season_range_format():
    from corenlp_ray.functions.sutime import value_range
    # SUTimeTest.java:100-103 rendering
    assert value_range("2016-WI") == "2016-12-01/2016-03"
    assert value_range("2016-SP") == "2016-03-01/2016-06"
    assert value_range("2016-SU") == "2016-06-01/2016-09"
    assert value_range("2016-FA") == "2016-09-01/2016-12"


def test_duration_passes_through():
    from corenlp_ray.functions.sutime import value_range
    assert value_range("P3M") == "P3M"


def test_parse_datetime_instant_formats():
    # SUTimeTest.java:113-133
    from corenlp_ray.functions.sutime import parse_datetime_instant

    assert parse_datetime_instant("2017-11-02T19:30:00Z") == \
        1509651000000
    # naive local datetime interpreted as UTC (the test's resolution)
    assert parse_datetime_instant("2017-11-02T15:30") == 1509636600000
    assert parse_datetime_instant("not a date") is None


# ---- round-4 grammar families: durations / decades / SETs / quarters /
# ranges (english.sutime.txt families; DURATION goldens from
# SUTimeITest.java:89-92 'a decade'→P10Y, 'a few decades'→PXY,
# 'hundred decades'→P1000Y, 'recent weeks'→PXW; SET goldens from
# :450,968 'every Monday'→XXXX-WXX-1, 'Every 2 days'→P2D) ----

import datetime as _dt

_D = _dt.date(1988, 1, 16)


@pytest.mark.parametrize("phrase,want", [
    ("a decade", "P10Y"), ("a few decades", "PXY"),
    ("hundred decades", "P1000Y"), ("recent weeks", "PXW"),
    ("three weeks", "P3W"), ("a week", "P1W"),
    ("30 minutes", "PT30M"), ("three hours", "PT3H"),
    ("every monday", "XXXX-WXX-1"), ("every tuesday", "XXXX-WXX-2"),
    ("every 2 days", "P2D"), ("every other sunday", "XXXX-WXX-7"),
    ("daily", "P1D"), ("annually", "P1Y"), ("hourly", "PT1H"),
    ("the 1990s", "199X"), ("the '90s", "199X"),
    ("the nineties", "199X"), ("this decade", "198X"),
    ("next decade", "199X"), ("last century", "18XX"),
    ("the third quarter of 2003", "2003-Q3"),
    ("first quarter", "1988-Q1"),
    ("from may 2002 to june 2003", "2002-05/2003-06"),
    ("from 1999 to 2003", "1999/2003"),
    ("between 1999 and 2003", "1999/2003"),
])
def test_round4_grammar_families(phrase, want):
    assert resolve_relative(phrase, _D) == want


def test_round4_families_found_in_text():
    txt = ("He stayed for three weeks in the 1990s and visited every "
           "Tuesday, three weeks ago.")
    got = [(p, v) for _, _, p, v in find_relative_expressions(txt, _D)]
    assert got == [("three weeks", "P3W"), ("the 1990s", "199X"),
                   ("every Tuesday", "XXXX-WXX-2"),
                   ("three weeks ago", "1987-12-26")]


def test_weekend_partofday_season_goldens():
    """SUTimeITest.java:852-861 resolved values (docdate 2003-04-14):
    weekend of the ISO week, part-of-day TIMEX suffixes, anaphoric
    season."""
    import datetime as dt

    from corenlp_ray.functions.sutime import resolve_relative

    d = dt.date(2003, 4, 14)
    assert resolve_relative("this winter", d) == "2003-WI"
    assert resolve_relative("the weekend", d) == "2003-W16-WE"
    assert resolve_relative("last weekend", d) == "2003-W15-WE"
    assert resolve_relative("tomorrow night", d) == "2003-04-15TNI"
    assert resolve_relative("Wednesday afternoon", d) == "2003-04-16TAF"
    assert resolve_relative("yesterday morning", d) == "2003-04-13TMO"


def test_partofday_found_in_text():
    import datetime as dt

    from corenlp_ray.functions.sutime import find_relative_expressions

    got = find_relative_expressions(
        "The event happens tomorrow night, not Wednesday afternoon. "
        "They watched a movie over the weekend.", dt.date(2003, 4, 14))
    vals = [v for (_b, _e, _s, v) in got]
    assert vals == ["2003-04-15TNI", "2003-04-16TAF", "2003-W16-WE"]


def test_partofday_of_explicit_date():
    """SUTimeITest.java:850 resolved golden: 'The morning of January
    31' with docdate 2003-04-14 → 2003-01-31TMO."""
    import datetime as dt

    from corenlp_ray.functions.sutime import (find_relative_expressions,
                                              resolve_relative)

    d = dt.date(2003, 4, 14)
    assert resolve_relative("the morning of January 31", d) \
        == "2003-01-31TMO"
    got = find_relative_expressions(
        "The morning of January 31 was very cold.", d)
    assert got == [(0, 25, "The morning of January 31",
                    "2003-01-31TMO")]
