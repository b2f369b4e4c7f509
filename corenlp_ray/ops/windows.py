"""Windowed aggregation over an ordered event log (the streaming-shaped
workload; Ray Data has no event-time windows, so windows are expressed as
key+bucket groupbys — see the engine's streaming note in SURVEY §2.7).

Two-phase as always: a vectorized per-batch partial aggregate (one row
per (user_id, window_start) per batch) → small groupby merge. Event-time
ordering within windows is irrelevant for sum/count; for order-sensitive
state use groupby(key).map_groups over ts-sorted groups
(``session_windows``).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa


def _us_window(b: pa.Table) -> pa.Table:
    """Ray's sort-aggregate downcasts aligned timestamps to [s];
    conform window_start back to the input's microsecond unit."""
    i = b.column_names.index("window_start")
    return b.set_column(i, "window_start",
                        b.column("window_start").cast(pa.timestamp("us")))


def tumbling_window(events_ds, window: str = "hour"):
    """(user_id, window_start=date_trunc(window, ts)) → n_events,
    sum_value. Oracle-SQL expressible (GROUP BY user_id,
    date_trunc(...))."""
    def partial(batch: pa.Table) -> pa.Table:
        # polars group_by over truncated ts — the pandas block path here
        # cost ~50x in block-format overhead (r4 advisor / the
        # ops/joins._filter_join finding)
        import polars as pl

        every = {"hour": "1h", "day": "1d", "minute": "1m"}[window]
        df = pl.from_arrow(batch.select(["user_id", "ts", "value"]))
        g = (df.with_columns(
                pl.col("ts").dt.truncate(every).alias("window_start"))
             .group_by(["user_id", "window_start"])
             .agg(n_events=pl.len().cast(pl.Int64),
                  sum_value=pl.col("value").sum()))
        return g.to_arrow()

    from ray.data.aggregate import Sum

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    return (partials.groupby(["user_id", "window_start"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_value", alias_name="sum_value"))
            .map_batches(_us_window, batch_format="pyarrow"))


def session_windows(events_ds, gap_minutes: int = 30):
    """Per-user session windows (gap-based), skew-safe at scale: users
    are hash-partitioned into ~4×CPU coarse partitions (ONE Ray group
    each — not one per user, the millions-of-tiny-groups trap flagged in
    round 1), then sessionized fully vectorized inside the partition:
    sort by (user_id, ts) once, a session break is a user change OR a
    gap > threshold, session ids are a cumsum, and one C-path pandas
    groupby emits all sessions of all users in the partition.
    Output: user_id, session_start, session_end, n_events."""
    from corenlp_ray.ops.dedup import partitioned_group_apply

    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(part: pd.DataFrame) -> pd.DataFrame:
        if not len(part):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64")})
        df = part.sort_values(["user_id", "ts"], kind="mergesort")
        new_user = df["user_id"].ne(df["user_id"].shift())
        gap_break = df["ts"].diff() > gap
        sid = (new_user | gap_break).cumsum()
        out = (df.groupby(sid, sort=False)
               .agg(user_id=("user_id", "first"),
                    session_start=("ts", "min"),
                    session_end=("ts", "max"),
                    n_events=("ts", "size")))
        return out.reset_index(drop=True)

    # key partitioning only co-locates a user's rows; the vectorized
    # kernel handles every user in the partition in one pass
    return partitioned_group_apply(
        events_ds.select_columns(["user_id", "ts"]), ("user_id",),
        sessions, inner_is_partition=True)


def hopping_window(events_ds, size_minutes: int = 60,
                   hop_minutes: int = 30):
    """Hopping (sliding) windows: each event lands in size/hop
    overlapping windows; per (user_id, window_start) counts and sums.
    Same two-phase shape as ``tumbling_window`` — the per-batch partial
    explodes each event into its windows BEFORE the (small) groupby, so
    the shuffle moves pre-aggregated rows, not raw events."""
    import numpy as np

    if size_minutes % hop_minutes != 0:
        # e.g. size=45/hop=30 would silently collapse to k=1 (one
        # 30-min-aligned window): neither 45-minute coverage nor an error
        raise ValueError(
            f"hopping_window requires size_minutes ({size_minutes}) to be "
            f"a multiple of hop_minutes ({hop_minutes})")
    k = size_minutes // hop_minutes

    def partial(batch: pa.Table) -> pa.Table:
        # polars: truncate once, replicate the frame k times with a
        # shifted window_start, one group_by (pandas blocks cost ~50x)
        import polars as pl

        df = pl.from_arrow(batch.select(["user_id", "ts", "value"]))
        base = df.with_columns(
            pl.col("ts").dt.truncate(f"{hop_minutes}m")
            .alias("window_start")).drop("ts")
        exploded = pl.concat([
            base.with_columns(
                pl.col("window_start")
                - pl.duration(minutes=hop_minutes * i))
            for i in range(k)])
        g = (exploded.group_by(["user_id", "window_start"])
             .agg(n_events=pl.len().cast(pl.Int64),
                  sum_value=pl.col("value").sum()))
        return g.to_arrow()

    from ray.data.aggregate import Sum

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    return (partials.groupby(["user_id", "window_start"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_value", alias_name="sum_value"))
            .map_batches(_us_window, batch_format="pyarrow"))
