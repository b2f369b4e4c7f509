"""Property-based hardening (hypothesis): the invariants that must hold
for ARBITRARY input text, not just fixtures — the tokenizer invertibility
contract, sentence-partition well-formedness, and every kernel being a
total function (no crashes on adversarial unicode)."""
import hypothesis.strategies as st
from hypothesis import given, settings

from corenlp_ray.stages.depparse import parse_sentence
from corenlp_ray.stages.extract import canonicalize_text, extract_text
from corenlp_ray.stages.lemma import lemma_of
from corenlp_ray.stages.ner import ner_sentence
from corenlp_ray.stages.openie import extract_sentence_triples
from corenlp_ray.stages.pos import tag_sentence
from corenlp_ray.stages.tokenize import ssplit, tokenize

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_tokenize_invertible_on_arbitrary_text(text):
    toks = tokenize(text)
    prev = 0
    for w, orig, b, e in toks:
        assert text[b:e] == orig
        assert b >= prev
        prev = e
    assert prev <= len(text)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_pipeline_total_function(text):
    """The whole per-sentence chain must never raise on any input."""
    toks = tokenize(text)
    words = [t[0] for t in toks]
    spans = ssplit(words)
    # sentence spans partition [0, n)
    if words:
        assert spans[0][0] == 0 and spans[-1][1] == len(words)
        for i in range(1, len(spans)):
            assert spans[i][0] == spans[i - 1][1]
    for b, e in spans:
        sw = words[b:e]
        tags = tag_sentence(sw)
        assert len(tags) == len(sw)
        lemmas = [lemma_of(w, t) for w, t in zip(sw, tags)]
        types, mentions = ner_sentence(sw, tags)
        assert len(types) == len(sw)
        for mb, me, _, _ in mentions:
            assert 0 <= mb < me <= len(sw)
        heads, labels = parse_sentence(sw, tags)
        assert len(heads) == len(sw)
        for k, h in enumerate(heads):
            assert h == -1 or (0 <= h < len(sw) and h != k)
        extract_sentence_triples(sw, tags, lemmas, heads, labels,
                                 [(mb, me, ty) for mb, me, ty, _ in mentions])


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=600))
def test_extract_total_on_arbitrary_bytes(data):
    out = extract_text(data)
    assert isinstance(out, str)
    assert canonicalize_text(out) == out  # canonical form is a fixpoint


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_extract_canonical_fixpoint(text):
    c = canonicalize_text(text)
    assert canonicalize_text(c) == c
