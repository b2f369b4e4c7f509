"""Probabilistic sketches over string columns — HyperLogLog cardinality
registers and Bloom-filter membership — with BIT-EXACT DuckDB oracles.

At 100 TB "how many distinct X" and "is X in set S" cannot be answered
with exact state (the distinct-token set alone is terabytes); sketches
answer them in kilobytes. Both ops here are deterministic functions of
an md5-derived 64-bit value hash, chosen over the faster polars/xxhash
kernels for ONE reason: md5 is available verbatim in DuckDB, so the
driver's SQL oracle re-derives every register and every probe bit —
false positives included — exactly. (Production swap: the same code
shape over polars ``hash`` at ~20× the speed, losing only the SQL
oracle; the per-row hashlib loop below is the documented parity cost,
same tradeoff as ``textstats.fingerprint_batch``.)

Scale shapes:
- ``hll_registers``: the registers ARE a combiner — each batch reduces
  to ≤ 2^p (bucket, rho) partials via one ``np.maximum.at``; the only
  all-to-all is a ≤ 2^p-row groupby-max. Register merge = elementwise
  max, so shards/snapshots union for free.
- ``bloom_build``: per-batch distinct bit positions → one distinct
  aggregate over ≤ m integer rows. ``bloom_probe`` broadcasts the m-bit
  array (2^16 bits = 8 KB) once via the closure and tests k positions
  per row vectorized — no shuffle at all on the probe side.
"""
from __future__ import annotations

import hashlib
from typing import List

import numpy as np
import pyarrow as pa

_U64 = np.uint64


def md5_u64(values: List[str]) -> np.ndarray:
    """First 8 bytes of md5(value) as uint64 — the shared value hash
    (big-endian hex prefix, exactly ``int(md5hex[:16], 16)``)."""
    return np.array(
        [int(hashlib.md5((v or "").encode("utf-8")).hexdigest()[:16], 16)
         for v in values], dtype=_U64)


def md5_u64_sql(col: str) -> str:
    """The identical uint64 in DuckDB HUGEINT arithmetic: a 16-term
    nibble sum over the md5 hex prefix. COALESCE mirrors the Python
    side's ``(v or "")`` — ``md5(NULL)`` would be NULL and the row
    would silently fall out of the sketch."""
    expr = f"md5(COALESCE({col}, ''))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (15 - i)} AS HUGEINT)" for i in range(16))
    return f"({terms})"


# ------------------------------------------------------- HyperLogLog ----

def hll_partial_batch(batch: pa.Table, col: str = "text",
                      p: int = 8) -> pa.Table:
    """One batch → its ≤ 2^p partial registers (bucket, rho-max)."""
    h = md5_u64(batch.column(col).to_pylist())
    width = 64 - p
    bucket = (h >> _U64(width)).astype(np.int64)
    low = h & _U64((1 << width) - 1)
    # rho: 1-based position of the first 1 bit in the width-bit field;
    # an all-zero field maps to width + 1 (the standard HLL convention).
    # Exact int bit_length — float log2 misrounds above 2^53, and this
    # loop rides the same per-row pass the md5 parity hash already pays.
    nbits = np.array([int(v).bit_length() for v in low], dtype=np.int64)
    rho = np.where(low != 0, width - nbits + 1, width + 1).astype(np.int64)
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    used = np.nonzero(regs)[0]
    return pa.table({"bucket": pa.array(used, pa.int64()),
                     "max_rho": pa.array(regs[used], pa.int64())})


def hll_registers(ds, col: str = "text", p: int = 8):
    """Distributed HLL registers of a string column: one combiner pass
    per batch, one ≤ 2^p-row groupby-max. Output (bucket, max_rho)."""
    from ray.data.aggregate import Max

    partial = ds.map_batches(
        lambda b: hll_partial_batch(b, col=col, p=p),
        batch_format="pyarrow")
    return partial.groupby("bucket").aggregate(
        Max("max_rho", alias_name="max_rho"))


def hll_registers_sql(table: str, col: str, p: int = 8) -> str:
    """DuckDB mirror of :func:`hll_registers` — bit-identical buckets
    and rho values via the shared md5-derived u64."""
    width = 64 - p
    h = md5_u64_sql(col)
    return (
        f"WITH h AS (SELECT {h} AS h64 FROM {table}), "
        f"br AS (SELECT CAST(h64 // CAST({1 << width} AS HUGEINT) "
        "AS BIGINT) AS bucket, "
        f"CAST(h64 % CAST({1 << width} AS HUGEINT) AS BIGINT) AS low "
        "FROM h), "
        "r AS (SELECT bucket, CASE WHEN low = 0 THEN "
        f"{width + 1} ELSE strpos(lpad(bin(low), {width}, '0'), '1') "
        "END AS rho FROM br) "
        "SELECT bucket, CAST(max(rho) AS BIGINT) AS max_rho "
        "FROM r GROUP BY bucket")


def hll_estimate(registers, p: int = 8) -> float:
    """Driver-side estimate from a (bucket, max_rho) frame — the
    standard bias-corrected harmonic mean (Flajolet et al. 2007),
    small-range linear counting when registers are sparse."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    regs[np.asarray(registers["bucket"])] = np.asarray(
        registers["max_rho"])
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(est)


# ------------------------------------------------------ Bloom filter ----

def _positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    pos_i = (h_lo + i * h_hi) mod m over the split u64."""
    lo = (h & _U64(0xFFFFFFFF)).astype(np.int64)
    hi = (h >> _U64(32)).astype(np.int64)
    i = np.arange(k, dtype=np.int64)
    return (lo[:, None] + i[None, :] * hi[:, None]) % m


def bloom_build(ds, col: str = "text", m: int = 1 << 16, k: int = 3):
    """Build a Bloom filter of a string column as a Dataset of the
    DISTINCT set bit positions (≤ m int64 rows — the sparse form that
    unions across shards with a plain distinct)."""
    def to_pos(batch: pa.Table) -> pa.Table:
        h = md5_u64(batch.column(col).to_pylist())
        pos = np.unique(_positions(h, m, k))
        return pa.table({"pos": pa.array(pos, pa.int64())})

    from ray.data.aggregate import Count

    return (ds.map_batches(to_pos, batch_format="pyarrow")
            .groupby("pos").aggregate(Count())
            .select_columns(["pos"]))


def bloom_probe(ds, positions, col: str = "text", id_col: str = "doc_id",
                m: int = 1 << 16, k: int = 3):
    """Probe every row of ``ds`` against a built filter. ``positions``
    is the Dataset (or materialized list/array) from
    :func:`bloom_build`; the m-bit array (m/8 bytes — 8 KB at the
    default) broadcasts once inside the closure. Output
    (id_col, bloom_hit: int64) with exact Bloom semantics — false
    positives from position collisions included, which is what the SQL
    oracle reproduces bit-for-bit."""
    if hasattr(positions, "to_pandas"):
        positions = positions.to_pandas()["pos"].to_numpy()
    bits = np.zeros(m, dtype=bool)
    bits[np.asarray(positions, dtype=np.int64)] = True

    def probe(batch: pa.Table) -> pa.Table:
        h = md5_u64(batch.column(col).to_pylist())
        hit = bits[_positions(h, m, k)].all(axis=1).astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "bloom_hit": pa.array(hit, pa.int64())})

    return ds.map_batches(probe, batch_format="pyarrow")


def bloom_probe_sql(corpus_where: str, m: int = 1 << 16,
                    k: int = 3) -> str:
    """DuckDB mirror of build-over-``documents WHERE corpus_where`` then
    probe-every-document: identical u64, identical double hashing."""
    h = md5_u64_sql("text")
    return (
        f"WITH ch AS (SELECT {h} AS h64 FROM documents "
        f"WHERE {corpus_where}), "
        "pos AS (SELECT DISTINCT CAST((h64 % 4294967296 + "
        f"i * (h64 // 4294967296)) % {m} AS BIGINT) AS p "
        f"FROM ch, range({k}) t(i)), "
        f"ph AS (SELECT doc_id, {h} AS h64 FROM documents), "
        "probes AS (SELECT doc_id, CAST((h64 % 4294967296 + "
        f"i * (h64 // 4294967296)) % {m} AS BIGINT) AS p "
        f"FROM ph, range({k}) t(i)) "
        "SELECT doc_id, CAST(bool_and(p IN (SELECT p FROM pos)) "
        "AS BIGINT) AS bloom_hit FROM probes GROUP BY doc_id")


# -------------------------------------------------- count-min sketch ----

def cms_partial_batch(batch: pa.Table, col: str = "text",
                      d: int = 4, w: int = 256) -> pa.Table:
    """One batch → its non-zero count-min cells (row, cell, n): d
    independent rows of w counters, row i incremented at
    ``(h_lo + (i+1) * h_hi) mod w`` per value occurrence (the same
    double-hashed family as the Bloom filter, offset by one so the two
    sketches' position streams differ)."""
    h = md5_u64(batch.column(col).to_pylist())
    lo = (h & _U64(0xFFFFFFFF)).astype(np.int64)
    hi = (h >> _U64(32)).astype(np.int64)
    counts = np.zeros((d, w), dtype=np.int64)
    for i in range(d):
        np.add.at(counts[i], (lo + (i + 1) * hi) % w, 1)
    rows, cells = np.nonzero(counts)
    return pa.table({"row": pa.array(rows.astype(np.int64), pa.int64()),
                     "cell": pa.array(cells.astype(np.int64), pa.int64()),
                     "n": pa.array(counts[rows, cells], pa.int64())})


def count_min(ds, col: str = "text", d: int = 4, w: int = 256):
    """Distributed count-min sketch of a string column: per-batch
    partial grids (the combiner — at most d·w rows per batch leave the
    map side regardless of batch size), one d·w-row groupby-sum.
    Output (row, cell, n) for every non-zero cell; sketches of shards
    merge by cell-wise ADD, so snapshots accumulate for free.

    Point estimate for a value v: ``min_i grid[i][pos_i(v)]`` — an
    overestimate by at most εN with ε = e/w at the standard depth
    (Cormode-Muthukrishnan 2005). The DuckDB oracle re-derives every
    cell exactly (no approximation in the COMPARISON — the sketch's
    estimation error is a property of reads, not of the grid)."""
    from ray.data.aggregate import Sum

    partial = ds.map_batches(
        lambda b: cms_partial_batch(b, col=col, d=d, w=w),
        batch_format="pyarrow")
    return (partial.groupby(["row", "cell"])
            .aggregate(Sum("n", alias_name="n")))


def count_min_sql(table: str, col: str, d: int = 4, w: int = 256) -> str:
    """DuckDB mirror of :func:`count_min` — identical md5-u64 and
    double-hashed cell positions, one row per non-zero cell."""
    h = md5_u64_sql(col)
    return (
        f"WITH h AS (SELECT {h} AS h64 FROM {table}), "
        "pos AS (SELECT i AS row, CAST((h64 % 4294967296 + "
        f"(i + 1) * (h64 // 4294967296)) % {w} AS BIGINT) AS cell "
        f"FROM h, range({d}) t(i)) "
        "SELECT CAST(row AS BIGINT) AS row, cell, "
        "CAST(count(*) AS BIGINT) AS n FROM pos GROUP BY row, cell")


def cms_estimate(grid, values: List[str], d: int = 4, w: int = 256):
    """Driver-side point estimates from a (row, cell, n) frame."""
    g = np.zeros((d, w), dtype=np.int64)
    g[np.asarray(grid["row"]), np.asarray(grid["cell"])] = \
        np.asarray(grid["n"])
    h = md5_u64(values)
    lo = (h & _U64(0xFFFFFFFF)).astype(np.int64)
    hi = (h >> _U64(32)).astype(np.int64)
    est = np.full(len(values), np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(d):
        est = np.minimum(est, g[i, (lo + (i + 1) * hi) % w])
    return est


# ------------------------------------------------------ grouped HLL ----

def hll_registers_by(ds, key: str, col: str = "text", p: int = 8):
    """Per-key HLL registers — "distinct COL per KEY" at sketch cost
    (distinct urls per domain, distinct tokens per language, distinct
    users per day): output (key, bucket, max_rho), one register set per
    key, mergeable across shards by (key, bucket) max exactly like the
    global sketch.

    Scale shape: the per-batch pandas groupby collapses each batch to
    ≤ (keys-in-batch × 2^p) partial rows before the single
    groupby(key, bucket)-max all-to-all — the combiner discipline
    survives the group dimension. Estimate per key via
    :func:`hll_estimate` over that key's rows."""
    import pandas as pd

    from ray.data.aggregate import Max

    width = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        h = md5_u64(batch.column(col).to_pylist())
        bucket = (h >> _U64(width)).astype(np.int64)
        low = h & _U64((1 << width) - 1)
        nbits = np.array([int(v).bit_length() for v in low],
                         dtype=np.int64)
        rho = np.where(low != 0, width - nbits + 1,
                       width + 1).astype(np.int64)
        df = pd.DataFrame({key: batch.column(key).to_pylist(),
                           "bucket": bucket, "max_rho": rho})
        # dropna=False: a null key must stay its own group, matching
        # the SQL mirror's GROUP BY (which keeps the NULL group)
        out = (df.groupby([key, "bucket"], sort=False, dropna=False)
               ["max_rho"].max().reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby([key, "bucket"])
            .aggregate(Max("max_rho", alias_name="max_rho")))


def hll_registers_by_sql(table: str, key: str, col: str,
                         p: int = 8) -> str:
    """DuckDB mirror of :func:`hll_registers_by`."""
    width = 64 - p
    h = md5_u64_sql(col)
    return (
        f"WITH h AS (SELECT {key}, {h} AS h64 FROM {table}), "
        f"br AS (SELECT {key}, CAST(h64 // CAST({1 << width} AS HUGEINT) "
        "AS BIGINT) AS bucket, "
        f"CAST(h64 % CAST({1 << width} AS HUGEINT) AS BIGINT) AS low "
        "FROM h), "
        f"r AS (SELECT {key}, bucket, CASE WHEN low = 0 THEN "
        f"{width + 1} ELSE strpos(lpad(bin(low), {width}, '0'), '1') "
        "END AS rho FROM br) "
        f"SELECT {key}, bucket, CAST(max(rho) AS BIGINT) AS max_rho "
        f"FROM r GROUP BY {key}, bucket")
