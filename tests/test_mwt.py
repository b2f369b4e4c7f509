"""MWT segmentation tests (MWTAnnotator analogue — stages/mwt.py),
golden-checked against the reference's own Spanish CoNLL-U example
(data/edu/stanford/nlp/pipeline/es-example.conllu MWT ranges)."""
import pytest

from corenlp_ray.stages.mwt import (
    mwt_tokenize_batch, split_mwt, tokenize_generic)

_ES_CONLLU = ("/root/reference/data/edu/stanford/nlp/pipeline/"
              "es-example.conllu")


def _gold_mwts(path):
    """CoNLL-U MWT ranges → (surface, [parts])."""
    out = []
    rows = {}
    pend = None
    for line in open(path):
        line = line.rstrip("\n")
        if not line or line.startswith("#"):
            continue
        cols = line.split("\t")
        tid = cols[0]
        if "-" in tid:
            a, b = tid.split("-")
            pend = (cols[1], int(a), int(b))
            continue
        if "." in tid:
            continue
        rows[int(tid)] = cols[1]
        if pend and int(tid) == pend[2]:
            surface, a, b = pend
            out.append((surface, [rows[i] for i in range(a, b + 1)]))
            pend = None
    return out


def test_reference_es_example_mwts():
    golds = _gold_mwts(_ES_CONLLU)
    assert golds, "es-example must contain MWT ranges"
    for surface, parts in golds:
        got = split_mwt(surface, "es")
        assert got == parts, (surface, got, parts)


@pytest.mark.parametrize("word,lang,want", [
    ("del", "es", ["de", "el"]),
    ("al", "es", ["a", "el"]),
    ("Del", "es", ["De", "el"]),
    ("deberse", "es", ["deber", "se"]),
    ("darle", "es", ["dar", "le"]),
    ("dárselo", "es", ["dár", "se", "lo"]),
    ("comprarlos", "es", ["comprar", "los"]),
    ("diciéndome", "es", ["diciéndo", "me"]),
    ("du", "fr", ["de", "le"]),
    ("des", "fr", ["de", "les"]),
    ("au", "fr", ["à", "le"]),
    ("aux", "fr", ["à", "les"]),
    ("casa", "es", None),          # not an MWT
    ("hablar", "es", None),        # bare infinitive, no clitic
    ("del", "fr", None),           # not a French contraction
    ("du", "en", None),            # lang-gated
])
def test_split_cases(word, lang, want):
    assert split_mwt(word, lang) == want


def test_generic_tokenizer_expands_mwt():
    assert tokenize_generic("La existencia del niño.", "es") == \
        ["La", "existencia", "de", "el", "niño", "."]
    assert tokenize_generic("Je parle du projet.", "fr") == \
        ["Je", "parle", "de", "le", "projet", "."]


def test_batch_stage(ray_session):
    import ray.data as rd

    ds = rd.from_items([
        {"doc_id": 1, "text": "De allí las rebajas.", "lang": "es"},
        {"doc_id": 2, "text": "Au revoir.", "lang": "fr"},
        {"doc_id": 3, "text": "Plain English text.", "lang": "en"},
    ])
    rows = {r["doc_id"]: r for r in ds.map_batches(
        mwt_tokenize_batch, batch_format="pyarrow").take_all()}
    assert list(rows[1]["tok_word"]) == \
        ["De", "allí", "las", "rebajas", "."]
    assert list(rows[2]["tok_word"]) == ["À", "le", "revoir", "."]
    assert rows[3]["n_tokens"] == 4
