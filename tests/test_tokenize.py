"""Tokenizer + ssplit golden fixtures (FIXTURES F2): PTB conventions,
invertibility, abbreviation periods, clitics, URLs, sentence boundaries."""
import pyarrow as pa

from corenlp_ray.sources.pages import synth_pages_table
from corenlp_ray.stages.tokenize import ssplit, tokenize, tokenize_ssplit_batch


def words(text):
    return [t[0] for t in tokenize(text)]


def test_simple_sentence():
    assert words("The cat sat.") == ["The", "cat", "sat", "."]


def test_clitics():
    assert words("I don't think John's dog can't won't.") == [
        "I", "do", "n't", "think", "John", "'s", "dog", "ca", "n't", "wo", "n't", "."]


def test_curly_clitics_normalized():
    toks = tokenize("He didn’t go.")
    assert [t[0] for t in toks] == ["He", "did", "n't", "go", "."]
    # invertibility: orig preserves the curly character
    assert toks[2][1] == "n’t"


def test_abbreviations_keep_period():
    assert words("Mr. Smith met Dr. Jones at Acme Corp. yesterday.") == [
        "Mr.", "Smith", "met", "Dr.", "Jones", "at", "Acme", "Corp.",
        "yesterday", "."]


def test_acronyms():
    assert words("The U.S. economy, i.e. GDP.") == [
        "The", "U.S.", "economy", ",", "i.e.", "GDP", "."]


def test_numbers():
    assert words("It cost $1,234.56 or 3.5% of 10,000.") == [
        "It", "cost", "$", "1,234.56", "or", "3.5", "%", "of", "10,000", "."]


def test_urls_and_email():
    assert words("See https://example.org/a?b=1, or mail bob@example.com.") == [
        "See", "https://example.org/a?b=1", ",", "or", "mail",
        "bob@example.com", "."]


def test_hyphenated_kept():
    assert words("A state-of-the-art low-cost design.") == [
        "A", "state-of-the-art", "low-cost", "design", "."]


def test_possessive_plural():
    assert words("The dogs' bones.") == ["The", "dogs", "'", "bones", "."]


def test_dashes_ellipsis_quotes():
    toks = tokenize("Wait… “really” — yes.")
    assert [t[0] for t in toks] == ["Wait", "...", "``", "really", "''", "--", "yes", "."]
    assert [t[1] for t in toks] == ["Wait", "…", "“", "really", "”", "—", "yes", "."]


def test_invertibility():
    text = "Mr. O'Brien said: “It's state-of-the-art — really!” (See p. 5.)"
    toks = tokenize(text)
    for w, orig, b, e in toks:
        assert text[b:e] == orig
    # gaps are whitespace only
    prev = 0
    for _, _, b, e in toks:
        assert text[prev:b].strip() == ""
        prev = e
    assert text[prev:].strip() == ""


def test_ssplit_basic():
    ws = words("One sentence. Another one! A third? Yes.")
    spans = ssplit(ws)
    assert len(spans) == 4
    assert spans[0] == (0, 3)


def test_ssplit_followers():
    ws = words('He said "stop." Then he left.')
    spans = ssplit(ws)
    # the closing quote after the period belongs to the first sentence
    assert len(spans) == 2
    assert ws[spans[0][1] - 1] == "''"


def test_ssplit_abbrev_no_split():
    ws = words("Mr. Smith went to Washington. He stayed.")
    spans = ssplit(ws)
    assert len(spans) == 2


def test_ssplit_paragraph_break():
    text = "Title line\n\nFirst sentence here. Second one."
    toks = tokenize(text)
    breaks = set()
    for k in range(1, len(toks)):
        if "\n\n" in text[toks[k - 1][3]:toks[k][2]]:
            breaks.add(k)
    spans = ssplit([t[0] for t in toks], breaks)
    assert len(spans) == 3  # title | first | second


def test_batch_transform():
    tbl = synth_pages_table(n=8, seed=3)
    out = tokenize_ssplit_batch(tbl)
    assert out.num_rows == 8
    texts = out.column("text").to_pylist()
    for i in range(out.num_rows):
        origs = out.column("tok_orig")[i].as_py()
        begins = out.column("tok_begin")[i].as_py()
        ends = out.column("tok_end")[i].as_py()
        sb = out.column("sent_begin")[i].as_py()
        se = out.column("sent_end")[i].as_py()
        tok_sent = out.column("tok_sent")[i].as_py()
        text = texts[i]
        for o, b, e in zip(origs, begins, ends):
            assert text[b:e] == o
        # sentence spans partition the token range
        assert len(sb) == len(se)
        if sb:
            assert sb[0] == 0 and se[-1] == len(origs)
            for j in range(1, len(sb)):
                assert sb[j] == se[j - 1]
        for k, s in enumerate(tok_sent):
            assert sb[s] <= k < se[s]


def test_newline_policies():
    import pyarrow as pa
    from corenlp_ray.sources.pages import PAGES_SCHEMA
    text = "One line\nTwo line\n\nNew para."
    tbl = pa.Table.from_pylist([{
        "url": "u", "warc_ts": 0, "html": b"", "text": text, "lang": "en",
    }], schema=PAGES_SCHEMA)
    n_never = len(tokenize_ssplit_batch(tbl, newline_policy="never")
                  .column("sent_begin")[0].as_py())
    n_two = len(tokenize_ssplit_batch(tbl, newline_policy="two")
                .column("sent_begin")[0].as_py())
    n_always = len(tokenize_ssplit_batch(tbl, newline_policy="always")
                   .column("sent_begin")[0].as_py())
    assert n_never == 1      # no terminal punct until the end
    assert n_two == 2        # blank line splits
    assert n_always == 3     # every newline splits
