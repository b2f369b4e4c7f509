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


def tumbling_window(events_ds, window: str = "hour"):
    """(user_id, window_start=date_trunc(window, ts)) → n_events,
    sum_value. Oracle-SQL expressible (GROUP BY user_id,
    date_trunc(...))."""
    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["user_id", "ts", "value"]).to_pandas()
        df["window_start"] = df["ts"].dt.floor(
            {"hour": "h", "day": "D", "minute": "min"}[window])
        g = (df.groupby(["user_id", "window_start"], as_index=False)
             .agg(n_events=("value", "size"), sum_value=("value", "sum")))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    partials = events_ds.map_batches(partial, batch_format="pyarrow")
    return (partials.groupby(["user_id", "window_start"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_value", alias_name="sum_value")))


def session_windows(events_ds, gap_minutes: int = 30):
    """Per-user session windows (gap-based): groupby(user) → ts-sorted
    sessionization with pandas (order-sensitive state stays inside the
    group). Output: user_id, session_start, session_end, n_events."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = (g["ts"].diff() > gap).cumsum()
        out = g.groupby(new_session).agg(
            session_start=("ts", "min"), session_end=("ts", "max"),
            n_events=("ts", "size"))
        out["user_id"] = g["user_id"].iloc[0]
        return out.reset_index(drop=True)

    return events_ds.groupby("user_id").map_groups(
        sessions, batch_format="pandas")
