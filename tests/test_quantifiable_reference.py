"""Parity with the reference's QuantifiableEntityNormalizer goldens
(/root/reference/test/src/edu/stanford/nlp/ie/
QuantifiableEntityNormalizerTest.java — every dates/percent/money/
number/ordinal/time pair)."""
import pytest

from corenlp_ray.functions.quantifiable import (
    normalized_date_string, normalized_money_string,
    normalized_number_string, normalized_ordinal_string,
    normalized_percent_string, normalized_time_string)

DATES = [("February 5, 1923", "19230205"), ("Mar 3", "****0303"),
         ("18 July 2005", "20050718"), ("18 Sep 05", "20050918"),
         ("Jan. 13 , '90", "19900113"), ("Jan. 13", "****0113"),
         ("2009-07-19", "20090719"), ("2007-06-16", "20070616")]

PERCENTS = [("one percent", "%1.0"), ("% 8", "%8.0"), ("8 %", "%8.0"),
            ("8.25 %", "%8.25"), ("48 percent", "%48.0"), ("%4.9", "%4.9")]

MONEY = [("24 cents", "$0.24"), ("18¢", "$0.18"),
         ("250 won", "₩250.0"), ("£5.40", "£5.4"),
         ("10 thousand million pounds", "£1.0E10"),
         ("10 thousand million dollars", "$1.0E10"),
         ("million dollars", "$1000000.0"),
         ("four million dollars", "$4000000.0"), ("$1m", "$1000000.0"),
         ("50 million yuan", "元5.0E7"), ("50 cents", "$0.5"),
         ("# 1500", "£1500.0"), ("£ 1500", "£1500.0"),
         ("£ .50", "£0.5"), ("# .50", "£0.5"),
         ("$ 1500", "$1500.0"), ("$1500", "$1500.0"),
         ("$ 1,500", "$1500.0"), ("$1,500", "$1500.0"),
         ("$48.75", "$48.75"), ("$ 57 . 60", "$57.6"), ("2.30", "$2.3"),
         ("8 million", "$8000000.0"), ("$8 thousand", "$8000.0"),
         ("$42,33", "$42.33")]

NUMBERS = [("twenty-five", "25.0"), ("1.3 million", "1300000.0"),
           ("10 thousand million", "1.0E10"), ("3.625", "3.625"),
           ("-15", "-15.0"), ("117-111", "117.0 - 111.0"),
           ("", ""), (" ", " "), ("   ", "   ")]

ORDINALS = [("twelfth", "12.0"), ("twenty-second", "22.0"),
            ("0th", "0.0"), ("1,000th", "1000.0")]

TIMES = [("4:30", "4:30"), ("11:00 pm", "11:00pm"), ("2 am", "2:00am"),
         ("12:29 p.m.", "12:29pm"), ("midnight", "00:00am"),
         ("22:26:48", "22:26:48")]


@pytest.mark.parametrize("s,want", DATES, ids=[d[0] for d in DATES])
def test_dates(s, want):
    assert normalized_date_string(s) == want


@pytest.mark.parametrize("s,want", PERCENTS, ids=[d[0] for d in PERCENTS])
def test_percents(s, want):
    assert normalized_percent_string(s) == want


@pytest.mark.parametrize("s,want", MONEY, ids=[d[0] for d in MONEY])
def test_money(s, want):
    assert normalized_money_string(s) == want


@pytest.mark.parametrize("s,want", NUMBERS,
                         ids=[repr(d[0]) for d in NUMBERS])
def test_numbers(s, want):
    assert normalized_number_string(s) == want


@pytest.mark.parametrize("s,want", ORDINALS, ids=[d[0] for d in ORDINALS])
def test_ordinals(s, want):
    assert normalized_ordinal_string(s) == want


@pytest.mark.parametrize("s,want", TIMES, ids=[d[0] for d in TIMES])
def test_times(s, want):
    assert normalized_time_string(s) == want
