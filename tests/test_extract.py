"""HTML→text extraction: CleanXml-semantics spec + byte-identical invariant."""
import pyarrow as pa

from corenlp_ray.stages.extract import canonicalize_text, extract_text, extract_text_batch
from corenlp_ray.sources.pages import make_page, synth_pages_table


def test_basic_tags_removed():
    assert extract_text(b"<html><body><p>Hello world.</p></body></html>") == "Hello world."


def test_script_style_head_dropped():
    h = (b"<html><head><title>T</title><script>var a = 1 < 2;</script></head>"
         b"<body><style>p { color: red }</style><p>Keep me.</p></body></html>")
    # title is inside <head>, which is dropped entirely
    assert extract_text(h) == "Keep me."


def test_block_tags_make_paragraphs_inline_tags_dont():
    h = b"<div>One <b>bold</b> line</div><p>Two</p><p>Three <a href='x'>link</a></p>"
    assert extract_text(h) == "One bold line\n\nTwo\n\nThree link"


def test_entities_decoded():
    assert extract_text(b"<p>a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;</p>") == 'a & b <c> "d" \'e\''


def test_comments_dropped_whitespace_collapsed():
    h = b"<p>a\t \tb</p><!-- secret --><p>  c  </p>"
    assert extract_text(h) == "a b\n\nc"


def test_empty_and_tag_only():
    assert extract_text(b"") == ""
    assert extract_text(b"<html><body></body></html>") == ""
    assert extract_text(None) == ""


def test_canonicalize_idempotent():
    t = "A  b\n\n\n c \nd"
    c = canonicalize_text(t)
    assert canonicalize_text(c) == c
    assert c == "A b\n\nc\n\nd"


def test_pages_byte_identical_invariant():
    """extract_text(html) == text for every generated page (the per-row
    invariant from BASELINE.json)."""
    tbl = synth_pages_table(n=30, seed=7)
    out = extract_text_batch(tbl)
    for want, got in zip(out.column("text").to_pylist(),
                         out.column("text_extracted").to_pylist()):
        assert got == want


def test_make_page_deterministic():
    a, b = make_page(42), make_page(42)
    assert a["html"] == b["html"] and a["text"] == b["text"] and a["url"] == b["url"]


def test_batch_transform_schema():
    tbl = synth_pages_table(n=5)
    out = extract_text_batch(tbl)
    assert out.schema.field("text_extracted").type == pa.string()
    assert out.num_rows == 5
