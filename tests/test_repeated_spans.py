"""Unit tests for ops/dedup.repeated_ngram_spans — span-merge edge
cases beyond the repeated_spans_planted catalog oracle."""
import pyarrow as pa

from corenlp_ray.ops.dedup import repeated_ngram_spans


def _run(texts, ray_unused, **kw):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    df = repeated_ngram_spans(rd.from_arrow(tbl), **kw).to_pandas()
    return sorted(map(tuple, df.itertuples(index=False)))


def test_cross_doc_repeat_and_merge(ray_session):
    # docs 0 and 1 share "a b c d e" -> shingles at positions 0 and 1
    # merge into one maximal span [0, 5)
    spans = _run(["a b c d e x y z", "q a b c d e"], None, k=4)
    assert spans == [(0, 0, 5), (1, 1, 6)]


def test_same_doc_repeat_counts(ray_session):
    # the shingle "a b c" appears twice INSIDE one doc -> still ≥2
    spans = _run(["a b c z z z a b c"], None, k=3)
    assert spans == [(0, 0, 3), (0, 6, 9)]


def test_disjoint_islands_not_merged(ray_session):
    # shared prefix and shared suffix with unique middles
    spans = _run(["p q r 1 1 s t u", "p q r 2 2 s t u"], None, k=3)
    assert spans == [(0, 0, 3), (0, 5, 8), (1, 0, 3), (1, 5, 8)]


def test_min_count_threshold(ray_session):
    texts = ["m n o p", "m n o p", "m n o p"]
    assert _run(texts, None, k=4, min_count=4) == []
    assert _run(texts, None, k=4, min_count=3) == [
        (0, 0, 4), (1, 0, 4), (2, 0, 4)]


def test_short_and_empty_docs_skipped(ray_session):
    spans = _run(["", "one two", "x y z w x y z w"], None, k=4)
    # only the self-repeat in doc 2: shingles 0..4, dup at 0 and 4
    assert spans == [(2, 0, 4), (2, 4, 8)]


def test_hash_path_matches_exact(ray_session):
    """exact=False (64-bit-hash shuffle key, the 100-TB layout) must
    agree with the exact string-key path on a collision-free corpus."""
    import ray.data as rd

    texts = [f"w{i} " * 3 + "common boiler plate text here " + f"t{i}"
             for i in range(40)] + ["common boiler plate text here solo"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    a = repeated_ngram_spans(rd.from_arrow(tbl), k=4,
                             exact=True).to_pandas()
    b = repeated_ngram_spans(rd.from_arrow(tbl), k=4,
                             exact=False).to_pandas()
    key = ["doc_id", "tok_start", "tok_end"]
    assert sorted(map(tuple, a[key].itertuples(index=False))) == \
        sorted(map(tuple, b[key].itertuples(index=False)))
    assert len(a) > 0
