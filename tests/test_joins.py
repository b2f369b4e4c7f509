"""Join operators vs DuckDB oracles on the TPC-H-ish tables."""
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from corenlp_ray.ops.joins import asof_join, broadcast_join, bucketed_hash_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ["orders", "customer", "lineitem", "events"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def norm(df, cols):
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_broadcast_join_orders_customer(ray_session, duck):
    import ray.data as rd

    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_name"])
    cust = cust.rename_columns(["o_custkey", "c_name"])
    got = broadcast_join(orders, cust, on="o_custkey").to_pandas()
    want = duck.execute(
        "SELECT o_orderkey, o_custkey, o_totalprice, c_name FROM orders "
        "JOIN customer ON o_custkey = c_custkey").fetchdf()
    cols = ["o_orderkey", "o_custkey", "o_totalprice", "c_name"]
    pd.testing.assert_frame_equal(norm(got, cols), norm(want, cols),
                                  check_dtype=False)


def test_bucketed_hash_join_lineitem_orders(ray_session, duck):
    import ray.data as rd

    li = rd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"]) \
        .map_batches(lambda b: b.rename_columns(["l_orderkey",
                                                 "o_orderstatus"]),
                     batch_format="pyarrow")
    got = bucketed_hash_join(li, orders, on="l_orderkey").to_pandas()
    want = duck.execute(
        "SELECT l_orderkey, l_quantity, o_orderstatus FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey").fetchdf()
    cols = ["l_orderkey", "l_quantity", "o_orderstatus"]
    pd.testing.assert_frame_equal(norm(got, cols), norm(want, cols),
                                  check_dtype=False)


def test_asof_join_events(ray_session, duck):
    import ray.data as rd

    # as-of: for each event, the latest PRIOR (or same-ts) 'click' event
    # value for the same user
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    clicks = rd.read_parquet(f"{SF}/events.parquet",
                             columns=["user_id", "ts", "value"])
    got = asof_join(ev, clicks, key="user_id", ts="ts").to_pandas()
    want = duck.execute("""
        SELECT e.user_id, e.ts, e.event_id, c.value
        FROM events e
        LEFT JOIN LATERAL (
          SELECT value FROM events c
          WHERE c.user_id = e.user_id AND c.ts <= e.ts
          ORDER BY c.ts DESC LIMIT 1) c ON true
    """).fetchdf()
    cols = ["user_id", "ts", "event_id", "value"]
    pd.testing.assert_frame_equal(norm(got, cols), norm(want, cols),
                                  check_dtype=False)


def test_asof_join_unmatched_left_kept(ray_session):
    import pandas as pd
    import ray.data as rd

    left = rd.from_items([
        {"k": 1, "ts": pd.Timestamp("2020-01-01 10:00"), "ev": "a"},
        {"k": 2, "ts": pd.Timestamp("2020-01-01 11:00"), "ev": "b"},
    ])
    right = rd.from_items([
        {"k": 1, "ts": pd.Timestamp("2020-01-01 09:00"), "v": 7.0},
    ])
    got = asof_join(left, right, key="k", ts="ts").to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert len(got) == 2                       # left-join: k=2 kept
    assert got.loc[0, "v"] == 7.0
    assert pd.isna(got.loc[1, "v"])


def test_range_join_handcrafted(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.joins import range_join

    # ts in plain int64 "µs" (tiny bucket width forces replication)
    left = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": ["a", "a", "b", "a"],
        "ts": pa.array([5, 25, 15, 99], pa.int64())}))
    iv = rd.from_arrow(pa.table({
        "iv_id": pa.array([10, 11, 12, 13], pa.int64()),
        "k": ["a", "a", "b", "a"],
        "lo": pa.array([0, 20, 10, 50], pa.int64()),
        "hi": pa.array([30, 26, 16, 50], pa.int64())}))  # 13 is empty
    out = (range_join(left, iv, ts="ts", lo="lo", hi="hi", keys=["k"],
                      bucket_us=10)
           .to_pandas().sort_values(["event_id", "iv_id"],
                                    ignore_index=True))
    # event 1 (a,5) ∈ iv10[0,30); event 2 (a,25) ∈ iv10 AND iv11[20,26);
    # event 3 (b,15) ∈ iv12[10,16); event 4 (a,99) matches nothing;
    # iv13 is empty (hi <= lo) and must produce nothing
    assert list(zip(out["event_id"], out["iv_id"])) == [
        (1, 10), (2, 10), (2, 11), (3, 12)]
    # bucket-width invariance: the same result at any quantization
    out2 = (range_join(left, iv, ts="ts", lo="lo", hi="hi", keys=["k"],
                       bucket_us=1000)
            .to_pandas().sort_values(["event_id", "iv_id"],
                                     ignore_index=True))
    pd.testing.assert_frame_equal(out, out2, check_dtype=False)


def test_semi_and_anti_join(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.joins import anti_join, semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": ["a", "b", "c", "d"]}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([2, 2, 4, 9], pa.int64()),   # dup keys, extra key
        "other": ["x", "y", "z", "w"]}))
    semi = (semi_join(left, right, on="k").to_pandas()
            .sort_values("k", ignore_index=True))
    # no row duplication despite k=2 appearing twice on the right
    assert semi["k"].tolist() == [2, 4]
    assert list(semi.columns) == ["k", "v"]
    anti = (anti_join(left, right, on="k").to_pandas()
            .sort_values("k", ignore_index=True))
    assert anti["k"].tolist() == [1, 3]


def test_filter_join_right_only_partitions(ray_session):
    """A shuffle partition fed only by the thin right side lacks the
    left side's non-key columns — the pick kernel must null-fill from
    the left schema instead of crashing (advisor r4, high)."""
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.joins import anti_join, semi_join

    left = rd.from_arrow(pa.table({"k": pa.array([7], pa.int64()),
                                   "v": ["x"]}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(list(range(4000)), pa.int64()),
        "w": pa.array(list(range(4000)), pa.int64())}))
    semi = semi_join(left, right, on="k", npart=64).take_all()
    assert semi == [{"k": 7, "v": "x"}]
    anti = anti_join(left, right, on="k", npart=64).take_all()
    assert anti == []


def test_bucketed_join_right_only_partitions_and_suffixes(ray_session):
    """Right-heavy partitions must not crash the polars merge path, and
    overlapping non-key columns get the same _x/_y suffixes as the
    pandas path regardless of join type (advisor r4, low)."""
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.joins import bucketed_hash_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                   "v": ["a", "b"]}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(list(range(2000)), pa.int64()),
        "v": [str(i) for i in range(2000)]}))
    inner = sorted(bucketed_hash_join(left, right, "k", how="inner",
                                      npart=64).take_all(),
                   key=lambda r: r["k"])
    assert inner == [{"k": 1, "v_x": "a", "v_y": "1"},
                     {"k": 2, "v_x": "b", "v_y": "2"}]
    lj = sorted(bucketed_hash_join(left, right, "k", how="left",
                                   npart=64).take_all(),
                key=lambda r: r["k"])
    assert lj == inner
