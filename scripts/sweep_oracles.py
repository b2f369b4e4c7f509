"""Side-by-side engine-vs-DuckDB sweep of catalog oracles at any SF.

Mirrors the driver's correctness compare (columns sorted by name, rows
canonicalized, dtype-sensitive check reported separately) at an
arbitrary scale factor. Run in CHUNKS of fresh processes — Ray 2.49 can
crash after many sequential dataset executions in one process.

Usage:
  PYTHONPATH=/root/repo python scripts/sweep_oracles.py SF_DIR name1 name2 ...
  PYTHONPATH=/root/repo python scripts/sweep_oracles.py SF_DIR --window-slice 0 10

Prints one line per query: MATCH / DTYPE-ONLY / MISMATCH(reason).
Exit code 0 iff all MATCH.
"""
import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()


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


def main():
    sf = sys.argv[1]
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    from corenlp_ray.pipelines.queries import ORACLE_SQL, QUERIES

    if sys.argv[2] == "--window-slice":
        lo, hi = int(sys.argv[3]), int(sys.argv[4])
        names = [n for n in QUERIES if n in ORACLE_SQL][lo:hi]
    else:
        names = sys.argv[2:]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    bad = 0
    for name in names:
        try:
            mine = _canon(_to_pandas(QUERIES[name](sf)))
            want = _canon(con.execute(ORACLE_SQL[name]).fetchdf())
            if list(mine.columns) != list(want.columns):
                print(f"{name}: MISMATCH(columns {list(mine.columns)} "
                      f"vs {list(want.columns)})")
                bad += 1
                continue
            if len(mine) != len(want):
                print(f"{name}: MISMATCH(rows {len(mine)} vs {len(want)})")
                bad += 1
                continue
            try:
                pd.testing.assert_frame_equal(mine, want, check_dtype=True)
                print(f"{name}: MATCH rows={len(mine)}")
            except AssertionError:
                try:
                    pd.testing.assert_frame_equal(mine, want,
                                                  check_dtype=False)
                    dt = {c: (str(mine[c].dtype), str(want[c].dtype))
                          for c in mine.columns
                          if str(mine[c].dtype) != str(want[c].dtype)}
                    print(f"{name}: DTYPE-ONLY {dt}")
                    bad += 1
                except AssertionError as e2:
                    print(f"{name}: MISMATCH(values) "
                          f"{str(e2).splitlines()[-1][:160]}")
                    bad += 1
        except Exception as e:  # noqa: BLE001 — sweep must not abort
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:160]}")
            bad += 1
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
