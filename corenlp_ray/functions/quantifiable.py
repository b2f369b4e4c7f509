"""String-level quantity normalization — the QuantifiableEntityNormalizer
analogue (/root/reference/src/edu/stanford/nlp/ie/
QuantifiableEntityNormalizer.java; goldens in
test/src/edu/stanford/nlp/ie/QuantifiableEntityNormalizerTest.java).

Six pure functions with the reference's exact output conventions,
including Java's Double.toString formatting (25.0, 3.625, 1.0E10):
  normalized_number_string    "twenty-five" → "25.0"
  normalized_percent_string   "8.25 %"      → "%8.25"
  normalized_money_string     "24 cents"    → "$0.24"
  normalized_ordinal_string   "twelfth"     → "12.0"
  normalized_date_string      "Mar 3"       → "****0303"
  normalized_time_string      "2 am"        → "2:00am"
"""
from __future__ import annotations

import re
from typing import Optional

_UNITS = {"zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
          "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10,
          "eleven": 11, "twelve": 12, "thirteen": 13, "fourteen": 14,
          "fifteen": 15, "sixteen": 16, "seventeen": 17, "eighteen": 18,
          "nineteen": 19}
_TENS = {"twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "sixty": 60,
         "seventy": 70, "eighty": 80, "ninety": 90}
_MULTS = {"hundred": 100, "thousand": 1_000, "million": 1_000_000,
          "billion": 1_000_000_000, "trillion": 1_000_000_000_000,
          "m": 1_000_000, "b": 1_000_000_000, "k": 1_000}
_ORD_UNITS = {"first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
              "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9,
              "tenth": 10, "eleventh": 11, "twelfth": 12,
              "thirteenth": 13, "fourteenth": 14, "fifteenth": 15,
              "sixteenth": 16, "seventeenth": 17, "eighteenth": 18,
              "nineteenth": 19, "twentieth": 20, "thirtieth": 30,
              "fortieth": 40, "fiftieth": 50, "sixtieth": 60,
              "seventieth": 70, "eightieth": 80, "ninetieth": 90,
              "hundredth": 100, "thousandth": 1000, "millionth": 10**6}
_ORD_TO_CARD = {
    "first": "one", "second": "two", "third": "three", "fourth": "four",
    "fifth": "five", "sixth": "six", "seventh": "seven", "eighth": "eight",
    "ninth": "nine", "tenth": "ten", "eleventh": "eleven",
    "twelfth": "twelve", "thirteenth": "thirteen",
    "fourteenth": "fourteen", "fifteenth": "fifteen",
    "sixteenth": "sixteen", "seventeenth": "seventeen",
    "eighteenth": "eighteen", "nineteenth": "nineteen",
    "twentieth": "twenty", "thirtieth": "thirty", "fortieth": "forty",
    "fiftieth": "fifty", "sixtieth": "sixty", "seventieth": "seventy",
    "eightieth": "eighty", "ninetieth": "ninety",
    "hundredth": "hundred", "thousandth": "thousand",
    "millionth": "million",
}

_MONTHS = {"jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
           "jul": 7, "aug": 8, "sep": 9, "sept": 9, "oct": 10, "nov": 11,
           "dec": 12, "january": 1, "february": 2, "march": 3, "april": 4,
           "june": 6, "july": 7, "august": 8, "september": 9,
           "october": 10, "november": 11, "december": 12}


def jdouble(v: float) -> str:
    """Java Double.toString: decimal in [1e-3, 1e7), else scientific
    with a one-digit-minimum mantissa fraction (1.0E10)."""
    if v == 0:
        return "0.0"
    a = abs(v)
    if 1e-3 <= a < 1e7:
        s = repr(float(v))
        if "e" in s or "E" in s:
            s = f"{v:.10f}".rstrip("0")
            if s.endswith("."):
                s += "0"
        if "." not in s:
            s += ".0"
        return s
    exp = 0
    m = v
    while abs(m) >= 10:
        m /= 10
        exp += 1
    while abs(m) < 1:
        m *= 10
        exp -= 1
    ms = repr(float(m))
    if ms.endswith(".0") is False and "." not in ms:
        ms += ".0"
    return f"{ms}E{exp}"


def _tok_value(t: str) -> Optional[float]:
    """Single numeral / unit / tens token → value (no multipliers)."""
    sm = re.fullmatch(r"([+-]?(?:\d+(?:,\d{3})*(?:\.\d+)?|\.\d+))"
                      r"([mkb])?", t)
    if sm:
        v = float(sm.group(1).replace(",", ""))
        if sm.group(2):
            v *= _MULTS[sm.group(2)]
        return v
    if t in _UNITS:
        return float(_UNITS[t])
    if t in _TENS:
        return float(_TENS[t])
    return None


def _parse_num_tokens(toks: list) -> Optional[float]:
    """Mirror of QuantifiableEntityNormalizer.wordToNumberRecurse: split
    on the HIGHEST multiplier, recurse left (default 1) and right
    (default 0), so descending-multiplier phrases compose correctly
    ('one thousand two hundred' → 1*1000 + 200, not (1000+2)*100)."""
    if not toks:
        return 0.0
    best_i, best_v = -1, 0.0
    for i, t in enumerate(toks):
        if t in _MULTS and float(_MULTS[t]) > best_v:
            best_i, best_v = i, float(_MULTS[t])
    if best_i >= 0:
        left = _parse_num_tokens(toks[:best_i]) if best_i > 0 else 1.0
        right = _parse_num_tokens(toks[best_i + 1:])
        if left is None or right is None:
            return None
        return left * best_v + right
    total = 0.0
    for t in toks:
        v = _tok_value(t)
        if v is None:
            return None
        total += v
    return total


def _word_number(text: str) -> Optional[float]:
    """Word-number parser: twenty-five, 1.3 million, 10 thousand million."""
    toks = re.split(r"\s+|(?<=[a-z])-(?=[a-z])", text.strip().lower())
    toks = [t for t in toks if t and t != "and"]
    if not toks:
        return None
    return _parse_num_tokens(toks)


def normalized_number_string(s: str) -> str:
    if not s.strip():
        return s
    t = s.strip()
    m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*-\s*(\d+(?:\.\d+)?)", t)
    if m:  # score/range "117-111" → "117.0 - 111.0"
        return jdouble(float(m.group(1))) + " - " + jdouble(float(m.group(2)))
    v = _word_number(t)
    return jdouble(v) if v is not None else s


def normalized_percent_string(s: str) -> str:
    t = s.strip().lower().replace("percent", " ").replace("%", " ")
    v = _word_number(t)
    return "%" + jdouble(v) if v is not None else s


_CURRENCY = [
    (re.compile(r"[$]|dollars?\b|bucks?\b", re.I), "$", 1),
    (re.compile(r"£|#|pounds?\b|quid\b", re.I), "£", 1),
    (re.compile(r"¢|cents?\b", re.I), "$", 0.01),
    (re.compile(r"₩|won\b", re.I), "₩", 1),
    (re.compile(r"¥|yen\b", re.I), "¥", 1),
    (re.compile(r"€|euros?\b", re.I), "€", 1),
    (re.compile(r"元|yuan\b", re.I), "元", 1),
]


def normalized_money_string(s: str) -> str:
    t = s.strip()
    symbol, mult = "$", 1.0
    for rx, sym, m in _CURRENCY:
        if rx.search(t):
            symbol, mult = sym, m
            t = rx.sub(" ", t)
            break
    # European decimal comma at the tail: "$42,33" → 42.33
    t = re.sub(r"(\d),(\d\d)(?!\d)", r"\1.\2", t)
    # spaced decimal point: "57 . 60" → 57.60
    t = re.sub(r"(\d)\s*\.\s*(\d)", r"\1.\2", t)
    v = _word_number(t)
    if v is None:
        return s
    return symbol + jdouble(v * mult)


def normalized_ordinal_string(s: str) -> str:
    t = s.strip().lower()
    m = re.fullmatch(r"(\d+(?:,\d{3})*)(?:st|nd|rd|th)", t)
    if m:
        return jdouble(float(m.group(1).replace(",", "")))
    toks = [tok for tok in re.split(r"[\s-]+", t) if tok]
    if not toks or toks[-1] not in _ORD_UNITS:
        return s
    # ordinal phrase = cardinal prefix + final ordinal token; rewrite the
    # ordinal as its cardinal and reuse the multiplier-aware parser, so
    # 'one hundredth' → 'one hundred' → 100 (not 1+100)
    card = toks[:-1] + [_ORD_TO_CARD[toks[-1]]]
    v = _parse_num_tokens(card)
    return jdouble(v) if v is not None else s


def _year4(y: str) -> str:
    y = y.lstrip("'")
    if len(y) == 2:
        return ("19" + y) if int(y) >= 30 else ("20" + y)
    return y


def normalized_date_string(s: str) -> str:
    t = s.strip().rstrip(".")
    m = re.fullmatch(r"(\d{4})-(\d{2})-(\d{2})", t)
    if m:
        return m.group(1) + m.group(2) + m.group(3)
    # Month D(, Y)
    m = re.fullmatch(
        r"([A-Za-z]+)\.?\s+(\d{1,2})(?:\s*,\s*('?\d{2}|\d{4}))?", t)
    if m and m.group(1).lower() in _MONTHS:
        mo = _MONTHS[m.group(1).lower()]
        day = int(m.group(2))
        yy = _year4(m.group(3)) if m.group(3) else "****"
        return f"{yy}{mo:02d}{day:02d}"
    # D Month Y
    m = re.fullmatch(r"(\d{1,2})\s+([A-Za-z]+)\.?\s*('?\d{2}|\d{4})?", t)
    if m and m.group(2).lower() in _MONTHS:
        mo = _MONTHS[m.group(2).lower()]
        day = int(m.group(1))
        yy = _year4(m.group(3)) if m.group(3) else "****"
        return f"{yy}{mo:02d}{day:02d}"
    return s


def normalized_time_string(s: str) -> str:
    t = s.strip().lower()
    if t == "midnight":
        return "00:00am"
    if t == "noon" or t == "midday":
        return "12:00pm"
    m = re.fullmatch(r"(\d{1,2})(?::(\d{2})(?::(\d{2}))?)?"
                     r"\s*(?:([ap])\.?\s*m\.?)?", t)
    if not m:
        return s
    h, mi, sec, ap = m.group(1), m.group(2), m.group(3), m.group(4)
    if sec:
        return f"{h}:{mi}:{sec}"
    if ap:
        return f"{h}:{mi or '00'}{ap}m"
    if mi:
        return f"{h}:{mi}"
    return s
