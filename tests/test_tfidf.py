"""TF-IDF top-terms (ops/tfidf.py). The catalog oracle
(tfidf_planted) pins the full pipeline against DuckDB; here we pin the
math by hand, tie-breaks, k-truncation, and layout invariance.
"""
import math

import numpy as np
import pyarrow as pa
import pytest

from corenlp_ray.ops.tfidf import doc_frequencies, tfidf_top_terms

SF = "/root/testdata/sf0.001"


def _ds(rows, parallelism=2):
    import ray.data as rd
    t = pa.table({"doc_id": pa.array(range(len(rows)), pa.int64()),
                  "text": pa.array(rows, pa.string())})
    return rd.from_arrow(t).repartition(parallelism)


def test_doc_frequencies(ray_session):
    df = {r["token"]: r["df"] for r in
          doc_frequencies(_ds(["a a b", "b c", ""])).take_all()}
    assert df == {"a": 1, "b": 2, "c": 1}


def test_hand_scores_and_tie_break(ray_session):
    out = tfidf_top_terms(_ds(["a a b", "b c"]), k=2).take_all()
    n = 2.0
    sc = {(0, "a"): 2 * math.log2((n + 1) / 2),
          (0, "b"): 1 * math.log2((n + 1) / 3),
          (1, "b"): 1 * math.log2((n + 1) / 3),
          (1, "c"): 1 * math.log2((n + 1) / 2)}
    got = {(r["doc_id"], r["term"]): (r["score"], r["rank"])
           for r in out}
    assert set(got) == set(sc)
    for key, want in sc.items():
        assert got[key][0] == pytest.approx(round(want, 6), abs=1e-9)
    assert got[(0, "a")][1] == 1 and got[(0, "b")][1] == 2
    assert got[(1, "c")][1] == 1 and got[(1, "b")][1] == 2


def test_equal_scores_break_lexicographically(ray_session):
    # both tokens appear once in the one doc → identical scores
    out = tfidf_top_terms(_ds(["zed apple"]), k=2).take_all()
    ranks = {r["term"]: r["rank"] for r in out}
    assert ranks == {"apple": 1, "zed": 2}


def test_k_truncation_and_empty_docs(ray_session):
    out = tfidf_top_terms(_ds(["a b c d e f", "  "]), k=3).take_all()
    assert len(out) == 3
    assert all(r["doc_id"] == 0 for r in out)


def test_layout_invariance_on_real_docs(ray_session):
    import ray.data as rd
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    a = sorted((r["doc_id"], r["rank"], r["term"], r["score"]) for r in
               tfidf_top_terms(docs, k=3).take_all())
    b = sorted((r["doc_id"], r["rank"], r["term"], r["score"]) for r in
               tfidf_top_terms(docs.repartition(9), k=3).take_all())
    assert a == b and len(a) > 1000
