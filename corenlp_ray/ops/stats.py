"""Distributed numeric statistics: exact quantiles and fixed-width
histograms — the threshold-finding primitives of the published web
pipelines (CCNet cuts the corpus at perplexity PERCENTILES, Gopher and
C4 pick their gate constants by looking at score DISTRIBUTIONS).

Both ops keep the corpus where it is:

- ``exact_quantiles``: sort ONLY the thin value column (one all-to-all
  of 8-byte rows), then read each boundary row with ``split_at_indices``
  + ``limit(1)`` — q single rows reach the driver, nothing else. The
  quantile convention is discrete lower-rank (value at zero-based index
  ``floor(q * (n-1))`` of the ascending sort) so the DuckDB mirror is a
  plain row_number() selection with no interpolation arithmetic to
  drift: the answer is a VALUE FROM THE DATA, bit-identical on both
  sides.
- ``histogram``: pure two-phase — per-batch ``np.bincount`` partials
  (the combiner: ≤ nbins rows leave each map task), one nbins-row
  groupby-sum. Bin edges are computed in INTEGER arithmetic
  (``(x - lo) * nbins // (hi - lo)``, clipped) so an int column bins
  identically in SQL with no float-boundary hazard.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa


def exact_quantiles(ds, col: str, qs: Sequence[float]):
    """Exact discrete quantiles of a numeric column. Returns a (small,
    driver-side) pyarrow Table (q: float64, value: float64) — quantile
    results are thresholds consumed by the next stage, not a corpus.

    Scale shape: ONE sort of the single-column projection; boundary
    rows via split_at_indices + limit(1). No full materialization, no
    driver-side sort."""
    thin = ds.select_columns([col])
    n = thin.count()
    if n == 0:
        raise ValueError("exact_quantiles of an empty dataset")
    srt = thin.sort(col).materialize()
    idxs = sorted({int(np.floor(q * (n - 1))) for q in qs})
    vals = {}
    for i, part in zip(idxs, srt.split_at_indices(idxs)[1:]):
        rows = part.limit(1).take_all()
        vals[i] = float(rows[0][col])
    return pa.table({
        "q": pa.array([float(q) for q in qs], pa.float64()),
        "value": pa.array([vals[int(np.floor(q * (n - 1)))] for q in qs],
                          pa.float64())})


def exact_quantiles_sql(table: str, col: str,
                        qs: Sequence[float]) -> str:
    """DuckDB mirror of :func:`exact_quantiles` — the same zero-based
    ``floor(q*(n-1))`` row selection over the same ascending sort."""
    q_rows = ", ".join(f"({float(q)})" for q in qs)
    return (
        f"WITH qs(q) AS (VALUES {q_rows}), "
        f"n AS (SELECT count(*) AS n FROM {table}), "
        f"r AS (SELECT {col} AS value, row_number() OVER "
        f"(ORDER BY {col}) - 1 AS rn FROM {table}) "
        "SELECT qs.q, CAST(r.value AS DOUBLE) AS value "
        "FROM qs, n, r WHERE r.rn = CAST(floor(qs.q * (n.n - 1)) "
        "AS BIGINT)")


def histogram(ds, col: str, lo: int, hi: int, nbins: int = 20):
    """Fixed-width histogram of an INTEGER column over [lo, hi): out-of-
    range values clip into the edge bins (every row is counted — no
    silent drop). Output (bin: int64, n: int64) for non-empty bins;
    bin i covers [lo + i*(hi-lo)/nbins, lo + (i+1)*(hi-lo)/nbins).

    Two-phase: per-batch bincount partials → nbins-row groupby-sum."""
    from ray.data.aggregate import Sum

    if hi <= lo or nbins <= 0:
        raise ValueError("need hi > lo and nbins > 0")
    span = hi - lo

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        b = np.clip((x - lo) * nbins // span, 0, nbins - 1)
        counts = np.bincount(b, minlength=nbins)
        used = np.nonzero(counts)[0]
        return pa.table({"bin": pa.array(used.astype(np.int64),
                                         pa.int64()),
                         "n": pa.array(counts[used], pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("bin").aggregate(Sum("n", alias_name="n")))


def histogram_sql(table: str, col: str, lo: int, hi: int,
                  nbins: int = 20) -> str:
    """DuckDB mirror of :func:`histogram` — identical integer bin
    arithmetic (// is floor division on BIGINT both sides)."""
    span = hi - lo
    return (
        f"SELECT LEAST(GREATEST((CAST({col} AS BIGINT) - {lo}) "
        f"* {nbins} // {span}, 0), {nbins - 1}) AS bin, "
        f"CAST(count(*) AS BIGINT) AS n FROM {table} GROUP BY bin")
