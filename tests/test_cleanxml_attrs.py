"""CleanXml doc-attribute extraction parity
(CleanXmlAnnotator.java:64-100 defaults, :512-608 innermost-tag
collection, :920-935 docid/docdate/doctype population; the forum-post
shape from CleanXmlAnnotatorTest.java:325-360)."""
import pyarrow as pa

from corenlp_ray.stages.extract import (extract_doc_attrs,
                                        extract_doc_attrs_batch,
                                        normalize_docdate)


def test_default_tag_content():
    doc = ("<doc><docid>AFP_ENG_0001</docid>"
           "<date>2009-09-09</date><doctype>newswire</doctype>"
           "<text>Body here.</text></doc>")
    a = extract_doc_attrs(doc)
    assert a["docid"] == "AFP_ENG_0001"
    assert a["docdate"] == "2009-09-09"
    assert a["doctype"] == "newswire"


def test_datetime_tag_and_case_insensitivity():
    a = extract_doc_attrs("<DOC><DATE_TIME>x</DATE_TIME>"
                          "<DATETIME>2021-03-05T10:00:00</DATETIME></DOC>")
    # default dateTags = datetime|date (full match, case-insensitive):
    # DATE_TIME does NOT match, DATETIME does
    assert a["docdate"] == "2021-03-05T10:00:00"


def test_innermost_tag_rule():
    # tokens count only when the INNERMOST enclosing tag matches
    a = extract_doc_attrs(
        "<date><b>2020-01-02</b>ignored-outer</date>")
    assert a["docdate"] == "ignored-outer"


def test_doc_attribute_patterns():
    # DEFAULT_DOC_ANNOTATIONS_PATTERNS docID=doc[id]; tag content wins
    # over the attribute when both exist
    a = extract_doc_attrs(
        '<doc id="SPA_DF_000389_20090909_G00A09SM4" type="forum">'
        "<headline>hi</headline></doc>")
    assert a["docid"] == "SPA_DF_000389_20090909_G00A09SM4"
    assert a["doctype"] == "forum"
    b = extract_doc_attrs(
        '<doc id="ATTR1"><docid>TAG1</docid></doc>')
    assert b["docid"] == "TAG1"


def test_speaker_turns():
    a = extract_doc_attrs(
        "<turn><speaker>mysecondskin</speaker>hola</turn>"
        "<turn><speaker>pajenri</speaker>por lo que</turn>")
    assert a["speakers"] == ["mysecondskin", "pajenri"]


def test_flawed_xml_tolerated():
    # DEFAULT_ALLOW_FLAWS: missing close tags must not crash or leak
    a = extract_doc_attrs("<doc><date>2020-05-05<p>text</doc>")
    assert a["docdate"].startswith("2020-05-05")


def test_normalize_docdate():
    assert normalize_docdate("2009-09-09") == "2009-09-09"
    assert normalize_docdate("2009-09-09T00:00:00") == "2009-09-09"
    assert normalize_docdate("20090909") == "2009-09-09"
    assert normalize_docdate("next tuesday") == ""
    assert normalize_docdate(None) == ""


def test_batch_stage_columns():
    b = pa.table({"html": [
        b"<doc id='A1'><date>2020-01-01</date>"
        b"<turn><speaker>s1</speaker>t</turn></doc>", None]})
    out = extract_doc_attrs_batch(b)
    assert out.column("xml_docdate").to_pylist() == ["2020-01-01", ""]
    assert out.column("xml_docid").to_pylist() == ["A1", ""]
    assert out.column("xml_speakers").to_pylist() == [["s1"], []]


def test_xml_docdate_outranks_warc_ts():
    import datetime as dt

    from corenlp_ray.stages.ner import NerTagger
    from corenlp_ray.stages.tokenize import tokenize_ssplit_batch
    from corenlp_ray.stages.pos import pos_batch

    b = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": ["The meeting happened yesterday."],
        "warc_ts": pa.array([dt.datetime(1999, 1, 1)],
                            pa.timestamp("us")),
        "xml_docdate": ["2003-04-20"]})
    b = pos_batch(tokenize_ssplit_batch(b))
    out = NerTagger()(b)
    norms = [v for vals in out.column("men_norm").to_pylist()
             for v in vals if v]
    assert "2003-04-19" in norms          # resolved vs XML date, not 1998-12-31
