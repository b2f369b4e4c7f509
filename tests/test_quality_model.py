"""Hashed-linear quality classifier (ops/quality_model.py): unit
semantics, broadcast scoring, and DuckDB parity of the full
vocab-build → score pipeline."""
import numpy as np
import pyarrow as pa
import pytest

from corenlp_ray.ops.quality_model import (OOV_UNITS, build_vocab_weights,
                                           classify_quality,
                                           hash_weight_units,
                                           score_quality)


def test_hash_weight_units_range_and_determinism():
    r = np.arange(1, 2001)
    w = hash_weight_units(r, seed=7)
    assert w.min() >= -1000 and w.max() <= 1000
    assert (w == hash_weight_units(r, seed=7)).all()
    assert (w != hash_weight_units(r, seed=8)).any()
    # the stand-in model must not be degenerate
    assert (w > 0).any() and (w < 0).any()


def test_score_quality_exact_integer_sums(ray_session):
    import ray.data as rd

    docs = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["aa bb aa", "aa zz", "", "123 456"],
    })
    weights = {"aa": 300, "bb": -100}
    out = (score_quality(rd.from_arrow(docs), weights)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    # doc0: 300+(-100)+300 = 500 units over 3 tokens
    assert out["quality_units"].tolist() == [500, 300 + OOV_UNITS, 0, 0]
    assert out["n_tokens"].tolist() == [3, 2, 0, 0]
    assert out["n_oov"].tolist() == [0, 1, 0, 0]
    assert out["quality_score"].tolist() == [
        500 / 3000.0, (300 + OOV_UNITS) / 2000.0, 0.0, 0.0]
    assert out["keep"].tolist() == [True, True, False, False]


def test_vocab_rank_tiebreak_and_k(ray_session):
    import ray.data as rd

    docs = pa.table({"doc_id": [0, 1],
                     "text": ["b a c a", "c b d"]})
    w = build_vocab_weights(rd.from_arrow(docs), k=3, seed=7)
    # counts: a=2,b=2,c=2,d=1 → rank by (count desc, token asc):
    # a,b,c — d falls outside k=3
    assert set(w) == {"a", "b", "c"}
    expect = hash_weight_units(np.arange(1, 4), seed=7)
    assert [w["a"], w["b"], w["c"]] == expect.tolist()


def test_classify_quality_duckdb_parity(ray_session):
    import duckdb

    from corenlp_ray.pipelines.planted import (q_quality_classifier_planted,
                                               quality_classifier_planted_sql)

    sf = "/root/testdata/sf0.001"
    mine = (q_quality_classifier_planted(sf).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = (con.execute(quality_classifier_planted_sql()).fetchdf()
            .sort_values("doc_id", ignore_index=True))
    import pandas as pd

    pd.testing.assert_frame_equal(mine, want, check_dtype=False,
                                  check_exact=True)
    assert mine["keep"].sum() > 0  # some docs clear the threshold
    assert (mine["n_oov"] > 0).any()  # vocab cap actually bites
