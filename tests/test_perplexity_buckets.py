"""CCNet head/middle/tail perplexity buckets (ops/lm.perplexity_buckets):
exact ntile semantics, layout invariance, DuckDB parity of the full
score→bucket pipeline."""
import pyarrow as pa
import pytest


def _bucketize(rows, ray_session):
    import ray.data as rd

    from corenlp_ray.ops.lm import perplexity_buckets

    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_tokens": pa.array([3] * len(rows), pa.int64()),
        "lm_bits": pa.array([r[1] for r in rows], pa.float64()),
    })
    out = perplexity_buckets(rd.from_arrow(tbl).repartition(3)).take_all()
    return {r["doc_id"]: r["bucket"] for r in out}


def test_ntile_semantics_with_remainder(ray_session):
    # 7 rows / 3 buckets → sizes 3,2,2 by (lm_bits, doc_id) rank
    rows = [(i, float(10 - i)) for i in range(7)]  # doc 6 has lowest bits
    got = _bucketize(rows, ray_session)
    assert [got[i] for i in [6, 5, 4]] == ["head"] * 3
    assert [got[i] for i in [3, 2]] == ["middle"] * 2
    assert [got[i] for i in [1, 0]] == ["tail"] * 2


def test_ties_break_by_doc_id(ray_session):
    rows = [(i, 1.0) for i in range(6)]  # all-equal scores → id order
    got = _bucketize(rows, ray_session)
    assert [got[i] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail"]


def test_tiny_corpus_fills_head_first(ray_session):
    got = _bucketize([(0, 2.0)], ray_session)
    assert got == {0: "head"}


def test_buckets_duckdb_parity(ray_session):
    import duckdb
    import pandas as pd

    from corenlp_ray.pipelines.planted import (
        perplexity_buckets_planted_sql, q_perplexity_buckets_planted)

    sf = "/root/testdata/sf0.001"
    mine = (q_perplexity_buckets_planted(sf).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = (con.execute(perplexity_buckets_planted_sql()).fetchdf()
            .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    sizes = mine["bucket"].value_counts()
    assert abs(sizes.max() - sizes.min()) <= 1  # ntile balance
