"""SUTime-style relative/holiday date resolution against a document date.

Deterministic re-expression of the resolution behavior pinned by the
reference's own itest goldens (itest/src/edu/stanford/nlp/time/
SUTimeITest.java — e.g. docdate 1995-07-20: 'two weeks from next
Tuesday' → 1995-08-08, 'the second of August' → 1994-08-02; docdate
1999-12-30: 'Saturday last week' → 1999-12-25, 'last week' → 1999-W51;
docdate 2003-04-14: 'last month' → 2003-03) and the holiday pattern
table (src/edu/stanford/nlp/time/rules/english.holidays.sutime.txt,
JollyDayHolidays.java — 'Christmas 2010' → 2010-12-25, 'Easter 2011' →
2011-04-24, "mother's day 2012" → 2012-05-13).

Resolution conventions distilled from the goldens:
  * bare weekday → CLOSEST occurrence (docdate itself if same weekday);
  * ``next <weekday>`` → first occurrence strictly after docdate,
    ``last <weekday>`` → last strictly before;
  * month-day with no year (and holidays with no year) → most recent
    occurrence at or before docdate;
  * week values are ISO weeks (%G-W%V), month values %Y-%m, seasons
    SP/SU/FA/WI, quarters Qn.
"""
from __future__ import annotations

import datetime as dt
import re
from typing import List, Optional, Tuple

WEEKDAYS = {"monday": 0, "tuesday": 1, "wednesday": 2, "thursday": 3,
            "friday": 4, "saturday": 5, "sunday": 6}
MONTHS = {"january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
          "june": 6, "july": 7, "august": 8, "september": 9,
          "october": 10, "november": 11, "december": 12}
_ORD_DAY = {"first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
            "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
            "eleventh": 11, "twelfth": 12, "thirteenth": 13,
            "fourteenth": 14, "fifteenth": 15, "sixteenth": 16,
            "seventeenth": 17, "eighteenth": 18, "nineteenth": 19,
            "twentieth": 20, "thirtieth": 30}
SEASONS = {"spring": "SP", "summer": "SU", "fall": "FA", "autumn": "FA",
           "winter": "WI"}
_QUARTERS = {"first": 1, "second": 2, "third": 3, "fourth": 4,
             "1st": 1, "2nd": 2, "3rd": 3, "4th": 4}
_UNIT_WORDS = {"one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
               "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10}


def easter_date(year: int) -> dt.date:
    """Gregorian computus (Meeus/Jones/Butcher) — Easter Sunday."""
    a = year % 19
    b, c = divmod(year, 100)
    d, e = divmod(b, 4)
    f = (b + 8) // 25
    g = (b - f + 1) // 3
    h = (19 * a + b - d - g + 15) % 30
    i, k = divmod(c, 4)
    l = (32 + 2 * e + 2 * i - h - k) % 7
    mm = (a + 11 * h + 22 * l) // 451
    month = (h + l - 7 * mm + 114) // 31
    day = (h + l - 7 * mm + 114) % 31 + 1
    return dt.date(year, month, day)


def _nth_weekday(year: int, month: int, weekday: int, n: int) -> dt.date:
    """n-th (1-based) given weekday of a month; n=-1 → last."""
    if n > 0:
        d = dt.date(year, month, 1)
        off = (weekday - d.weekday()) % 7
        return d + dt.timedelta(days=off + 7 * (n - 1))
    nxt = dt.date(year + (month == 12), month % 12 + 1, 1)
    d = nxt - dt.timedelta(days=1)
    return d - dt.timedelta(days=(d.weekday() - weekday) % 7)


# holiday name (lowercased, apostrophes stripped) → fn(year) -> date.
# Fixed dates from english.holidays.sutime.txt; floating from
# Holidays_sutime.xml / JollyDayHolidays.java (US conventions).
HOLIDAYS = {
    "new years eve": lambda y: dt.date(y, 12, 31),
    "new years day": lambda y: dt.date(y, 1, 1),
    "new years": lambda y: dt.date(y, 1, 1),
    "inauguration day": lambda y: dt.date(y, 1, 20),
    "groundhog day": lambda y: dt.date(y, 2, 2),
    "valentines day": lambda y: dt.date(y, 2, 14),
    "st valentines day": lambda y: dt.date(y, 2, 14),
    "st patricks day": lambda y: dt.date(y, 3, 17),
    "april fools day": lambda y: dt.date(y, 4, 1),
    "april fools": lambda y: dt.date(y, 4, 1),
    "cinco de mayo": lambda y: dt.date(y, 5, 5),
    "independence day": lambda y: dt.date(y, 7, 4),
    "fourth of july": lambda y: dt.date(y, 7, 4),
    "halloween": lambda y: dt.date(y, 10, 31),
    "veterans day": lambda y: dt.date(y, 11, 11),
    "christmas eve": lambda y: dt.date(y, 12, 24),
    "christmas day": lambda y: dt.date(y, 12, 25),
    "christmas": lambda y: dt.date(y, 12, 25),
    "xmas": lambda y: dt.date(y, 12, 25),
    "martin luther king day": lambda y: _nth_weekday(y, 1, 0, 3),
    "mlk day": lambda y: _nth_weekday(y, 1, 0, 3),
    "presidents day": lambda y: _nth_weekday(y, 2, 0, 3),
    "memorial day": lambda y: _nth_weekday(y, 5, 0, -1),
    "mothers day": lambda y: _nth_weekday(y, 5, 6, 2),
    "fathers day": lambda y: _nth_weekday(y, 6, 6, 3),
    "labor day": lambda y: _nth_weekday(y, 9, 0, 1),
    "labour day": lambda y: _nth_weekday(y, 9, 0, 1),
    "columbus day": lambda y: _nth_weekday(y, 10, 0, 2),
    "thanksgiving": lambda y: _nth_weekday(y, 11, 3, 4),
    "easter sunday": easter_date,
    "easter day": easter_date,
    "easter": easter_date,
    "good friday": lambda y: easter_date(y) - dt.timedelta(days=2),
    "ash wednesday": lambda y: easter_date(y) - dt.timedelta(days=46),
}

_WD = r"(?:mon|tues|wednes|thurs|fri|satur|sun)day"
_MON = (r"(?:january|february|march|april|may|june|july|august|september"
        r"|october|november|december)")
_NUM = r"(?:\d{1,3}|one|two|three|four|five|six|seven|eight|nine|ten)"
_HOLIDAY = (r"(?:new year(?:'|’)?s(?: eve| day)?|inauguration day"
            r"|groundhog day|(?:st\.? )?valentine(?:'|’)?s day"
            r"|st\.? patrick(?:'|’)?s day|april fools?(?: day)?"
            r"|cinco de mayo|independence day|fourth of july|halloween"
            r"|veterans day|(?:x-?mas|christmas)(?: eve| day)?"
            r"|martin luther king day|mlk day|president(?:'|’)?s day"
            r"|memorial day|mother(?:'|’)?s day|father(?:'|’)?s day"
            r"|labou?r day|columbus day|thanksgiving"
            r"|easter(?: sunday| day)?|good friday|ash wednesday)")

# ordered alternation: longest/most-specific first. Lookahead-free (the
# same pattern text must be usable from DuckDB RE2 oracles).
_CLOCK = (r"(?:\d{1,2}(?::\d{2})? ?(?:a\.?m\.?|p\.?m\.?)"
          r"|\d{1,2}:\d{2})")

# duration vocabulary (english.sutime.txt DURATION family /
# time/SUTime.java duration grammars): exact quantities → PnU, vague
# quantifiers → PXU (SUTimeITest goldens: 'a decade'→P10Y, 'a few
# decades'→PXY, 'recent weeks'→PXW, 'hundred decades'→P1000Y)
_DUR_NUM = (r"(?:a few|several|recent|some|many|an?|one|two|three|four"
            r"|five|six|seven|eight|nine|ten|hundred|\d{1,4})")
_DUR_UNIT = (r"(?:seconds?|minutes?|hours?|days?|weeks?|months?"
             r"|quarters?|years?|decades?|centuries|century)")
_DECADE_WORDS = (r"(?:twenties|thirties|forties|fifties|sixties"
                 r"|seventies|eighties|nineties)")
_DECADE_WORD_MAP = {"twenties": 2, "thirties": 3, "forties": 4,
                    "fifties": 5, "sixties": 6, "seventies": 7,
                    "eighties": 8, "nineties": 9}

RELATIVE_PATTERN = (
    r"(?:" + _CLOCK + r" (?:yesterday|today|tomorrow)"
    r"|(?:yesterday|today|tomorrow) at " + _CLOCK
    + r"|(?:the )?(?:last|past|next) " + _NUM
    + r" (?:days?|weeks?|months?|years?)"
    + r"|" + _NUM + r" (?:days?|weeks?) from next " + _WD
    + r"|" + _NUM + r" (?:days?|weeks?|months?|years?) before yesterday"
    + r"|" + _NUM + r" (?:days?|weeks?|months?|years?) after tomorrow"
    + r"|" + _NUM + r" (?:days?|weeks?|months?|years?) (?:ago|earlier)"
    + r"|" + _NUM + r" (?:days?|weeks?|months?|years?) from (?:now|today)"
    + r"|" + _WD + r" (?:last|this|next) week"
    # day + part-of-day BEFORE the bare day forms so the longer match
    # wins the start position ('tomorrow night', 'Wednesday afternoon')
    + r"|(?:(?:last |this |next )?" + _WD
    + r"|yesterday|today|tomorrow)"
    r" (?:morning|afternoon|evening|night)"
    + r"|(?:last|next|this) " + _WD
    + r"|(?:last|this|next) (?:week|month|year|quarter|decade|century)"
    + r"|(?:the )?(?:last |this |next )?weekend"
    + r"|(?:last|this|next) (?:spring|summer|fall|autumn|winter)"
    + r"|(?:the )?(?:morning|afternoon|evening|night) of " + _MON
    + r" \d{1,2}(?:, \d{4})?"
    # ---- SET / recurring (english.sutime.txt SET family) ----
    + r"|every (?:other )?" + _WD
    + r"|every " + _NUM + r" (?:seconds?|minutes?|hours?|days?|weeks?"
    r"|months?|years?)"
    + r"|(?:daily|weekly|monthly|yearly|annually|hourly)"
    # ---- ranges (from X to Y / between X and Y) ----
    + r"|from " + _MON + r" \d{4} to " + _MON + r" \d{4}"
    + r"|from \d{4} to \d{4}"
    + r"|between \d{4} and \d{4}"
    + r"|" + _HOLIDAY + r" \d{4}"
    + r"|" + _HOLIDAY
    + r"|(?:the )?(?:first|second|third|fourth|fifth|sixth|seventh"
    r"|eighth|ninth|tenth|eleventh|twelfth|thirteenth|fourteenth"
    r"|fifteenth|sixteenth|seventeenth|eighteenth|nineteenth|twentieth"
    r"|thirtieth|\d{1,2}(?:st|nd|rd|th)) of " + _MON
    + r"|" + _MON + r" (?:of )?\d{4}"
    + r"|(?:spring|summer|fall|autumn|winter) of \d{4}"
    # quarter WITH year before the bare anaphoric quarter
    + r"|(?:the )?(?:first|second|third|fourth|1st|2nd|3rd|4th) quarter"
    r" of \d{4}"
    + r"|(?:first|second|third|fourth|1st|2nd|3rd|4th) quarter"
    # ---- decades ----
    + r"|(?:the )?\d{4}s"
    + r"|(?:the )?'?\d{2}s"
    + r"|(?:the )?" + _DECADE_WORDS
    # ---- bare durations LAST among quantity forms, so the suffixed
    # relative families ('three weeks ago', '3 months from now', the
    # 'last 3 months' window) win the same start position ----
    + r"|" + _DUR_NUM + r" " + _DUR_UNIT
    + r"|yesterday|today|tomorrow|tonight"
    + r"|" + _WD
    + r")")
RELATIVE_RE = re.compile(RELATIVE_PATTERN, re.IGNORECASE)


def _iso_week(d: dt.date) -> str:
    y, w, _ = d.isocalendar()
    return f"{y}-W{w:02d}"


def _month_str(y: int, m: int) -> str:
    return f"{y:04d}-{m:02d}"


def _add_months(d: dt.date, n: int) -> Tuple[int, int]:
    m = d.year * 12 + (d.month - 1) + n
    return m // 12, m % 12 + 1


def _num(tok: str) -> int:
    return _UNIT_WORDS.get(tok, None) if tok.isalpha() else int(tok)


def _closest_weekday(d: dt.date, wd: int) -> dt.date:
    """Closest occurrence of weekday wd to d (ties → future, same-day
    wins): SUTimeITest docdate Thu 1995-07-20 resolves Thursday→07-20,
    Friday→07-21, Saturday→07-22."""
    fwd = (wd - d.weekday()) % 7
    back = (d.weekday() - wd) % 7
    return d + dt.timedelta(days=fwd) if fwd <= back \
        else d - dt.timedelta(days=back)


def _holiday_key(s: str) -> str:
    s = s.lower().replace("’", "").replace("'", "")
    s = re.sub(r"\bst\.? ", "st ", s)
    s = s.replace("x-mas", "xmas")
    return re.sub(r"\s+", " ", s).strip()


def resolve_relative(phrase: str, docdate: dt.date | str) -> Optional[str]:
    """phrase (as matched by RELATIVE_RE) + docdate → TIMEX value string
    (ISO date / %G-WVV week / %Y-%m month / year / season / quarter)."""
    if isinstance(docdate, str):
        docdate = dt.date.fromisoformat(docdate[:10])
    p = re.sub(r"\s+", " ", phrase.strip().lower())
    p = re.sub(r"^the ", "", p)

    # clock time + relative day: '9 a.m. tomorrow' → 1998-04-18T09:00
    # (SUTimeITest.java:670 resolved values)
    m = re.fullmatch(r"(" + _CLOCK + r") (yesterday|today|tomorrow)", p) \
        or re.fullmatch(r"(yesterday|today|tomorrow) at (" + _CLOCK + r")",
                        p)
    if m:
        a, b = m.group(1), m.group(2)
        clock, day = (a, b) if b in ("yesterday", "today",
                                     "tomorrow") else (b, a)
        cm = re.fullmatch(
            r"(\d{1,2})(?::(\d{2}))? ?(a\.?m\.?|p\.?m\.?)?", clock)
        hh = int(cm.group(1))
        mm = int(cm.group(2) or 0)
        ampm = (cm.group(3) or "").replace(".", "")
        if ampm == "pm" and hh < 12:
            hh += 12
        elif ampm == "am" and hh == 12:
            hh = 0
        off = {"yesterday": -1, "today": 0, "tomorrow": 1}[day]
        d = docdate + dt.timedelta(days=off)
        return f"{d.isoformat()}T{hh:02d}:{mm:02d}"

    # duration: 'the last 3 months' → P3M (TIMEX3 DURATION value,
    # SUTimeITest.java:848/866)
    m = re.fullmatch(r"(?:last|past|next) (\S+) "
                     r"(day|week|month|year)s?", p)
    if m:
        n = _num(m.group(1))
        if n is None:
            return None
        return f"P{n}{m.group(2)[0].upper()}"

    if p in ("today", "tonight"):
        return docdate.isoformat()
    if p == "yesterday":
        return (docdate - dt.timedelta(days=1)).isoformat()
    if p == "tomorrow":
        return (docdate + dt.timedelta(days=1)).isoformat()

    m = re.fullmatch(r"(\S+) (day|week|month|year)s? "
                     r"(ago|earlier|from now|from today|before yesterday"
                     r"|after tomorrow)", p)
    if m:
        n = _num(m.group(1))
        if n is None:
            return None
        unit, direction = m.group(2), m.group(3)
        anchor = docdate
        sign = -1 if direction in ("ago", "earlier",
                                   "before yesterday") else 1
        if direction == "before yesterday":
            anchor = docdate - dt.timedelta(days=1)
        elif direction == "after tomorrow":
            anchor = docdate + dt.timedelta(days=1)
        if unit == "day":
            return (anchor + dt.timedelta(days=sign * n)).isoformat()
        if unit == "week":
            return (anchor + dt.timedelta(weeks=sign * n)).isoformat()
        y, mo = _add_months(anchor, sign * n)
        if unit == "month":
            return _month_str(y, mo)
        return f"{anchor.year + sign * n:04d}"

    m = re.fullmatch(r"(\S+) (day|week)s? from next (" + _WD + ")", p)
    if m:
        n = _num(m.group(1))
        wd = WEEKDAYS[m.group(3)]
        nxt = docdate + dt.timedelta(days=(wd - docdate.weekday()) % 7 or 7)
        days = n * (7 if m.group(2) == "week" else 1)
        return (nxt + dt.timedelta(days=days)).isoformat()

    m = re.fullmatch(r"(" + _WD + r") (last|this|next) week", p)
    if m:
        wd = WEEKDAYS[m.group(1)]
        off = {"last": -7, "this": 0, "next": 7}[m.group(2)]
        monday = docdate - dt.timedelta(days=docdate.weekday()) \
            + dt.timedelta(days=off)
        return (monday + dt.timedelta(days=wd)).isoformat()

    m = re.fullmatch(r"(last|this|next) (" + _WD + ")", p)
    if m:
        wd = WEEKDAYS[m.group(2)]
        if m.group(1) == "this":
            # same ISO week's occurrence (SUTimeTest.testThis: anchor
            # Sunday 2016-06-19, THIS Monday → 2016-06-13)
            monday = docdate - dt.timedelta(days=docdate.weekday())
            return (monday + dt.timedelta(days=wd)).isoformat()
        if m.group(1) == "next":
            off = (wd - docdate.weekday()) % 7 or 7
            return (docdate + dt.timedelta(days=off)).isoformat()
        off = (docdate.weekday() - wd) % 7 or 7
        return (docdate - dt.timedelta(days=off)).isoformat()

    # weekend of an ISO week: 'the weekend' → 2003-W16-WE
    # (SUTimeITest.java:858 resolved golden, docdate 2003-04-14)
    m = re.fullmatch(r"(?:(last|this|next) )?weekend", p)
    if m:
        off = {"last": -1, None: 0, "this": 0, "next": 1}[m.group(1)]
        return _iso_week(docdate + dt.timedelta(weeks=off)) + "-WE"

    # time-of-day attached to a resolvable day: 'tomorrow night' →
    # 2003-04-15TNI, 'Wednesday afternoon' → 2003-04-16TAF
    # (SUTimeITest.java:859-861 resolved goldens; TMO/TAF/TEV/TNI per
    # the TIMEX3 part-of-day codes SUTime emits)
    m = re.fullmatch(
        r"((?:last |this |next )?(?:" + _WD
        + r")|yesterday|today|tomorrow) "
        r"(morning|afternoon|evening|night)", p)
    if m:
        base = resolve_relative(m.group(1), docdate)
        if base is not None:
            pod = {"morning": "TMO", "afternoon": "TAF",
                   "evening": "TEV", "night": "TNI"}[m.group(2)]
            return base + pod

    # part-of-day of an explicit date: 'morning of January 31' →
    # 2003-01-31TMO (SUTimeITest.java:850 resolved golden — most
    # recent past occurrence when the year is omitted, like day-of)
    m = re.fullmatch(r"(morning|afternoon|evening|night) of ("
                     + _MON + r") (\d{1,2})(?:, (\d{4}))?", p)
    if m:
        pod = {"morning": "TMO", "afternoon": "TAF",
               "evening": "TEV", "night": "TNI"}[m.group(1)]
        mon, day = MONTHS[m.group(2)], int(m.group(3))
        try:
            if m.group(4):
                d = dt.date(int(m.group(4)), mon, day)
            else:
                d = dt.date(docdate.year, mon, day)
                if d > docdate:
                    d = dt.date(docdate.year - 1, mon, day)
        except ValueError:
            return None
        return d.isoformat() + pod

    # anaphoric season: 'this winter' → 2003-WI (SUTimeITest.java:852)
    m = re.fullmatch(r"(last|this|next) "
                     r"(spring|summer|fall|autumn|winter)", p)
    if m:
        off = {"last": -1, "this": 0, "next": 1}[m.group(1)]
        return f"{docdate.year + off:04d}-{SEASONS[m.group(2)]}"

    m = re.fullmatch(r"(last|this|next) (week|month|year|quarter"
                     r"|decade|century)", p)
    if m:
        off = {"last": -1, "this": 0, "next": 1}[m.group(1)]
        unit = m.group(2)
        if unit == "week":
            return _iso_week(docdate + dt.timedelta(weeks=off))
        if unit == "month":
            return _month_str(*_add_months(docdate, off))
        if unit == "year":
            return f"{docdate.year + off:04d}"
        if unit == "decade":
            # SUTimeITest decade goldens: 1988 this→198X next→199X
            return f"{docdate.year // 10 + off}X"
        if unit == "century":
            return f"{docdate.year // 100 + off}XX"
        q = (docdate.month - 1) // 3 + 1 + off
        y = docdate.year + (q - 1) // 4 if q > 4 else \
            docdate.year - 1 if q < 1 else docdate.year
        q = (q - 1) % 4 + 1
        return f"{y:04d}-Q{q}"

    m = re.fullmatch(r"(" + _HOLIDAY + r")(?: (\d{4}))?", p)
    if m and _holiday_key(m.group(1)) in HOLIDAYS:
        fn = HOLIDAYS[_holiday_key(m.group(1))]
        if m.group(2):
            return fn(int(m.group(2))).isoformat()
        d = fn(docdate.year)          # no year → most recent occurrence
        if d > docdate:
            d = fn(docdate.year - 1)
        return d.isoformat()

    m = re.fullmatch(r"([a-z]+|\d{1,2}(?:st|nd|rd|th)?) of ("
                     + _MON + ")", p)
    if m:
        tok = m.group(1)
        digits = re.sub(r"(st|nd|rd|th)$", "", tok)
        day = _ORD_DAY.get(tok) or (int(digits) if digits.isdigit()
                                    else None)
        if day is None:
            return None
        mon = MONTHS[m.group(2)]
        try:                           # most recent past occurrence
            d = dt.date(docdate.year, mon, day)
        except ValueError:
            return None
        if d > docdate:
            d = dt.date(docdate.year - 1, mon, day)
        return d.isoformat()

    m = re.fullmatch(r"(" + _MON + r") (?:of )?(\d{4})", p)
    if m:
        return _month_str(int(m.group(2)), MONTHS[m.group(1)])

    m = re.fullmatch(r"(spring|summer|fall|autumn|winter) of (\d{4})", p)
    if m:
        return f"{int(m.group(2)):04d}-{SEASONS[m.group(1)]}"

    # fiscal/calendar quarter with explicit year: 'third quarter of 2003'
    m = re.fullmatch(r"(\S+) quarter of (\d{4})", p)
    if m and m.group(1) in _QUARTERS:
        return f"{int(m.group(2)):04d}-Q{_QUARTERS[m.group(1)]}"

    m = re.fullmatch(r"(\S+) quarter", p)
    if m and m.group(1) in _QUARTERS:
        return f"{docdate.year:04d}-Q{_QUARTERS[m.group(1)]}"

    # ---- SETs (TIMEX3 type=SET; english.sutime.txt recurrence rules):
    # 'every Tuesday' → XXXX-WXX-2 (periodicity P1W),
    # 'every 2 days' → P2D, 'daily' → P1D (SUTimeITest.java:968,450)
    m = re.fullmatch(r"every (?:other )?(" + _WD + ")", p)
    if m:
        return f"XXXX-WXX-{WEEKDAYS[m.group(1)] + 1}"
    m = re.fullmatch(r"every (\S+) (second|minute|hour|day|week|month"
                     r"|year)s?", p)
    if m:
        n = _num(m.group(1))
        if n is None:
            return None
        unit = m.group(2)
        if unit in ("second", "minute", "hour"):
            return f"PT{n}{unit[0].upper()}"
        return f"P{n}{unit[0].upper()}"
    if p in ("daily", "weekly", "monthly", "yearly", "annually", "hourly"):
        return {"daily": "P1D", "weekly": "P1W", "monthly": "P1M",
                "yearly": "P1Y", "annually": "P1Y", "hourly": "PT1H"}[p]

    # ---- ranges: 'from May 2002 to June 2003' → 2002-05/2003-06,
    # 'from 1999 to 2003' / 'between 1999 and 2003' → 1999/2003
    # (the reference's interval values, e.g. 1988-01-09/1988-01-23)
    m = re.fullmatch(r"from (" + _MON + r") (\d{4}) to ("
                     + _MON + r") (\d{4})", p)
    if m:
        return (f"{int(m.group(2)):04d}-{MONTHS[m.group(1)]:02d}/"
                f"{int(m.group(4)):04d}-{MONTHS[m.group(3)]:02d}")
    m = re.fullmatch(r"(?:from (\d{4}) to|between (\d{4}) and) (\d{4})", p)
    if m:
        return f"{int(m.group(1) or m.group(2)):04d}/{int(m.group(3)):04d}"

    # ---- decades: 'the 1990s' → 199X, "the '90s" / 'the nineties' →
    # 199X (two-digit decades ≥ 30 read as 19xx, < 30 as 20xx)
    m = re.fullmatch(r"(\d{4})s", p)
    if m:
        return f"{int(m.group(1)) // 10}X"
    m = re.fullmatch(r"'?(\d{2})s", p)
    if m:
        d2 = int(m.group(1)) // 10
        return f"{19 if int(m.group(1)) >= 30 else 20}{d2}X"
    if p in _DECADE_WORD_MAP:
        return f"19{_DECADE_WORD_MAP[p]}X"

    # ---- durations (TIMEX3 type=DURATION): exact → PnU, vague → PXU
    # ('a decade' → P10Y, 'a few decades' → PXY, 'recent weeks' → PXW,
    # 'hundred decades' → P1000Y; SUTimeITest.java:89-92)
    m = re.fullmatch(r"(a few|several|recent|some|many|an?|one|\S+) "
                     r"(second|minute|hour|day|week|month|quarter|year"
                     r"|decade|centur)(?:s|y|ies)?", p)
    if m:
        qty, unit = m.group(1), m.group(2)
        if qty in ("a few", "several", "recent", "some", "many"):
            n = None
        elif qty in ("a", "an", "one"):
            n = 1
        elif qty == "hundred":
            n = 100
        else:
            n = _num(qty)
            if n is None:
                return None
        if unit in ("second", "minute", "hour"):
            return f"PT{'X' if n is None else n}{unit[0].upper()}"
        if unit == "decade":
            return "PXY" if n is None else f"P{n * 10}Y"
        if unit == "centur":
            return "PXY" if n is None else f"P{n * 100}Y"
        if unit == "quarter":
            return "PXM" if n is None else f"P{n * 3}M"
        return f"P{'X' if n is None else n}{unit[0].upper()}"

    if p in WEEKDAYS:
        return _closest_weekday(docdate, WEEKDAYS[p]).isoformat()
    return None


def find_relative_expressions(text: str, docdate) \
        -> List[Tuple[int, int, str, str]]:
    """All RELATIVE_RE matches in ``text`` resolved against ``docdate``:
    [(begin, end, phrase, value)] — the batch kernel for the sutime
    stage."""
    out = []
    for m in RELATIVE_RE.finditer(text or ""):
        v = resolve_relative(m.group(0), docdate)
        if v is not None:
            out.append((m.start(), m.end(), m.group(0), v))
    return out


_SEASON_START = {"SP": 3, "SU": 6, "FA": 9, "WI": 12}


def value_range(value: str) -> str:
    """Resolved TIMEX value → its ISO range "begin/end" (the TIMEX3
    ``range`` attribute; golden forms from the reference's
    test/time/SUTimeTest.java testNext/testThis expected strings).
    Durations (PnU) and times pass through unchanged."""
    m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})", value)
    if m:
        return f"{value}/{value}"
    m = re.fullmatch(r"(\d{4})-W(\d{2})", value)
    if m:
        monday = dt.date.fromisocalendar(int(m.group(1)),
                                         int(m.group(2)), 1)
        return f"{monday.isoformat()}/" \
               f"{(monday + dt.timedelta(days=6)).isoformat()}"
    m = re.fullmatch(r"(\d{4})-(\d{2})", value)
    if m:
        y, mo = int(m.group(1)), int(m.group(2))
        nxt = dt.date(y + (mo == 12), mo % 12 + 1, 1)
        last = nxt - dt.timedelta(days=1)
        return f"{y:04d}-{mo:02d}-01/{last.isoformat()}"
    m = re.fullmatch(r"(\d{4})-Q([1-4])", value)
    if m:
        y, q = int(m.group(1)), int(m.group(2))
        mo = 3 * (q - 1) + 1
        nxt = dt.date(y + (q == 4), (mo + 3 - 1) % 12 + 1, 1)
        last = nxt - dt.timedelta(days=1)
        return f"{y:04d}-{mo:02d}-01/{last.isoformat()}"
    m = re.fullmatch(r"(\d{4})-(SP|SU|FA|WI)", value)
    if m:
        y, mo = int(m.group(1)), _SEASON_START[m.group(2)]
        # the reference renders season ranges as start-date / end-MONTH
        # ("2016-12-01/2016-03" for winter — SUTimeTest.java:100-103)
        end_mo = (mo + 3 - 1) % 12 + 1
        return f"{y:04d}-{mo:02d}-01/{y:04d}-{end_mo:02d}"
    m = re.fullmatch(r"(\d{4})", value)
    if m:
        return f"{value}-01-01/{value}-12-31"
    return value


def parse_datetime_instant(s: str) -> Optional[int]:
    """ISO instant / local datetime string → epoch millis (UTC), the
    SUTime.parseDateTime contract (test/time/SUTimeTest.java
    parseDateTimeStandardInstantFormat / LocalDateTimeFormat: naive
    datetimes are interpreted as UTC)."""
    t = s.strip()
    if not t:
        return None
    if t.endswith("Z"):
        t = t[:-1] + "+00:00"
    try:
        d = dt.datetime.fromisoformat(t)
    except ValueError:
        return None
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1000)
