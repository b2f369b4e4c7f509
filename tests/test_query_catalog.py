"""Mirror of the driver's correctness gate: every ORACLE_SQL-paired
entry in the query catalog runs side-by-side with its DuckDB oracle at
sf0.001 and must match on row count, column names, and values (columns
sorted by name, rows canonicalized — the driver's compare shape)."""
import duckdb
import pandas as pd
import pytest

from corenlp_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, ray_session, duck):
    mine = _canon(_to_pandas(QUERIES[name](SF)))
    want = _canon(duck.execute(ORACLE_SQL[name]).fetchdf())
    assert list(mine.columns) == list(want.columns)
    assert len(mine) == len(want)
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_every_oracle_has_a_query():
    assert set(ORACLE_SQL) <= set(QUERIES)


def test_window_holds_all_unverified_oracles():
    """Union-maximizing window rotation: every oracle that has never
    been driver-verified (green in no committed CORRECTNESS_r*.json)
    must sit inside the driver's 50-slot correctness window."""
    import glob
    import json
    import os

    from corenlp_ray.pipelines.queries import ORACLE_SQL, QUERIES

    verified = set()
    root = os.path.join(os.path.dirname(__file__), "..")
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        for k, v in json.load(open(p)).items():
            if v.get("hash_match"):
                verified.add(k)
    window = set(list(QUERIES)[:50])
    never = {k for k in ORACLE_SQL if k not in verified}
    assert never <= window, sorted(never - window)
