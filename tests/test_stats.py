"""Exact distributed quantiles + fixed-width histograms
(ops/stats.py): boundary-row selection, combiner shape, integer bin
parity, clipping."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from corenlp_ray.ops.stats import (exact_quantiles, exact_quantiles_sql,
                                   histogram, histogram_sql)


def test_exact_quantiles_small(ray_session):
    import ray.data as rd

    vals = [float(v) for v in [5, 1, 9, 3, 7]]   # sorted: 1 3 5 7 9
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    out = exact_quantiles(ds, "x", (0.0, 0.5, 1.0)).to_pandas()
    assert out["value"].tolist() == [1.0, 5.0, 9.0]
    # q=0.3 → floor(0.3*4)=1 → second smallest
    out2 = exact_quantiles(ds, "x", (0.3,)).to_pandas()
    assert out2["value"].tolist() == [3.0]
    with pytest.raises(ValueError):
        exact_quantiles(ds.filter(expr="x > 100"), "x", (0.5,))


def test_exact_quantiles_matches_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    vals = rng.uniform(0, 1000, size=777)
    tbl = pa.table({"x": pa.array(vals, pa.float64())})
    qs = (0.01, 0.1, 0.5, 0.9, 0.999)
    mine = exact_quantiles(rd.from_arrow(tbl).repartition(9),
                           "x", qs).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(exact_quantiles_sql("t", "x", qs)).fetchdf()
    pd.testing.assert_frame_equal(
        mine.sort_values("q", ignore_index=True),
        want.sort_values("q", ignore_index=True), check_dtype=False)


def test_histogram_clips_and_conserves(ray_session):
    import ray.data as rd

    # values outside [10, 50) clip into the edge bins; total conserved
    vals = [-5, 10, 19, 20, 49, 50, 999]
    tbl = pa.table({"x": pa.array(vals, pa.int64())})
    out = (histogram(rd.from_arrow(tbl).repartition(3), "x",
                     lo=10, hi=50, nbins=4).to_pandas()
           .sort_values("bin", ignore_index=True))
    assert int(out["n"].sum()) == len(vals)
    got = dict(zip(out["bin"], out["n"]))
    assert got[0] == 3      # -5 (clip), 10, 19
    assert got[1] == 1      # 20
    assert got[3] == 3      # 49, 50 (clip), 999 (clip)
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(histogram_sql("t", "x", 10, 50, 4)).fetchdf()
    pd.testing.assert_frame_equal(
        out, want.sort_values("bin", ignore_index=True),
        check_dtype=False)


# --------------------------------------------------------- winnowing ----

def test_winnow_swa_guarantee_and_density(ray_session):
    """Schleimer-Wilkerson-Aiken: two documents sharing a substring of
    ≥ w+k-1 tokens MUST share at least one fingerprint; expected
    density ≈ 2/(w+1)."""
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.textstats import winnow_fingerprints

    k, w = 4, 5
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 = w+k-1
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [f"one two three {shared} four five six",
                 f"nine eight {shared} seven"]}))
    out = winnow_fingerprints(docs, k=k, w=w).to_pandas()
    fps1 = set(out[out.doc_id == 1]["fp"])
    fps2 = set(out[out.doc_id == 2]["fp"])
    assert fps1 & fps2, "shared >= w+k-1-token substring must collide"
    # density: a long random-ish doc selects ~2/(w+1) of its grams
    import numpy as np

    rng = np.random.RandomState(11)
    words = [f"w{v}" for v in rng.randint(0, 10_000, size=3000)]
    big = rd.from_arrow(pa.table({
        "doc_id": pa.array([9], pa.int64()),
        "text": [" ".join(words)]}))
    sel = winnow_fingerprints(big, k=k, w=w).to_pandas()
    n_grams = 3000 - k + 1
    density = len(sel) / n_grams
    assert 0.5 * 2 / (w + 1) < density < 1.5 * 2 / (w + 1)


def test_winnow_short_and_empty_docs(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.textstats import winnow_fingerprints

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["", "a b", "a b c d"]}))  # <k, <k, exactly k tokens
    out = winnow_fingerprints(docs, k=4, w=5).to_pandas()
    assert out["doc_id"].tolist() == [3]   # one gram → one fingerprint
    assert out["pos"].tolist() == [0]
