"""Deterministic corpus sampling for crawl-mix control.

Not a reference operator family — this is the LLM-training-data
extension surface: a 100-TB corpus is never trained on as-is; it is
DOWNSAMPLED to a target mix (cap the hot domain, up-weight books,
Bernoulli-thin the tail). The sampling must be a pure function of the
row key so that (a) re-runs and resumed partitions make identical
decisions with zero coordination, (b) two clusters of different sizes
produce byte-identical samples, and (c) a DuckDB oracle can re-derive
the exact accept set.

The shared decision hash is a 32-bit multiplicative mix (Knuth constant
+ two xor-shift-multiply finalizer rounds) evaluated in numpy uint64
wraparound arithmetic on the Ray side and HUGEINT arithmetic on the
SQL side — ``(x mod 2^64) mod 2^32 == x mod 2^32`` makes the two
exactly equal for any int64 key. No Python per-row work anywhere.

Scale notes: both ops are embarrassingly parallel map_batches stages —
no shuffle, no state, no driver participation. ``domain_quota_sample``
broadcasts the quota table via ``ray.put`` once (it is a crawl-mix
config, thousands of rows at most); the per-batch join is a pandas
``map`` over the domain column.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

# decision space: hash is uniform on [0, 2^32); accept iff h < rate*2^32
_SPACE = np.uint64(1) << np.uint64(32)
_KNUTH = np.uint64(2654435761)
_MIX = np.uint64(273837989)
_SHIFT = np.uint64(16)


def mix32(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized 32-bit mix of int64 keys; uniform on [0, 2^32).

    Exactly reproducible in SQL (see :func:`mix32_sql`). Keys are
    masked to the non-negative int64 domain first: numpy would wrap a
    negative key mod 2^64 while DuckDB HUGEINT keeps the sign (and %
    returns a negative remainder), so the two sides would diverge."""
    x = (np.asarray(keys, dtype=np.int64)
         & np.int64(0x7FFFFFFFFFFFFFFF)).astype(np.uint64)
    with np.errstate(over="ignore"):
        h = ((x + np.uint64(seed)) * _KNUTH) % _SPACE
        h = ((h >> _SHIFT) ^ h) * _MIX % _SPACE
    return (h >> _SHIFT) ^ h


def mix32_sql(col: str, seed: int = 0) -> str:
    """The identical hash in DuckDB SQL (HUGEINT avoids BIGINT overflow
    for keys up to 2^63; congruent with numpy's mod-2^64 wraparound
    because 2^32 divides 2^64)."""
    h1 = (f"((CAST({col} AS HUGEINT) & 9223372036854775807) + {seed})"
          " * 2654435761 % 4294967296")
    h2 = f"(xor(({h1}) >> 16, {h1}) * 273837989) % 4294967296"
    return f"CAST(xor(({h2}) >> 16, {h2}) AS BIGINT)"


def accept_mask(keys: np.ndarray, rate: float, seed: int = 0) -> np.ndarray:
    """Deterministic Bernoulli(rate) accept mask on int64 keys."""
    threshold = np.uint64(int(rate * float(_SPACE)))
    return mix32(keys, seed=seed) < threshold


def hash_sample_batch(batch: pa.Table, rate: float, key_col: str = "doc_id",
                      seed: int = 0) -> pa.Table:
    """Filter a batch to the deterministic rate-sample of ``key_col``."""
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    return batch.filter(pa.array(accept_mask(keys, rate, seed=seed)))


def hash_sample(ds, rate: float, key_col: str = "doc_id", seed: int = 0):
    """Deterministic Bernoulli sample of a Dataset — keep each row iff
    ``mix32(key, seed) < rate * 2^32``. Stateless, shuffle-free, and
    cluster-size invariant (the accept set depends only on keys)."""
    return ds.map_batches(
        lambda b: hash_sample_batch(b, rate, key_col=key_col, seed=seed),
        batch_format="pyarrow")


def domain_quota_sample(ds, quotas: Dict[str, float],
                        default_rate: float = 1.0,
                        domain_col: str = "domain",
                        key_col: str = "doc_id", seed: int = 0):
    """Per-domain deterministic downsampling (crawl-mix enforcement).

    ``quotas`` maps domain → keep rate (the hot domain gets e.g. 0.1,
    boilerplate mirrors 0.0); unlisted domains keep ``default_rate``.
    The quota table is a small broadcast — shipped once inside the
    closure, evaluated per batch with one vectorized ``np.take`` over
    a factorized domain column. No shuffle; the decision for a row
    never depends on any other row, so partial re-runs of a failed
    partition reproduce the global sample exactly.
    """
    import pyarrow.compute as pc

    items = sorted(quotas.items())
    q_doms = pa.array([d for d, _ in items], type=pa.string())
    # integer thresholds so the accept decision is exact (and identical
    # to the SQL oracle's literal) even at rate*2^32 boundaries
    q_thr = np.array([int(r * float(_SPACE)) for _, r in items]
                     + [int(default_rate * float(_SPACE))], dtype=np.uint64)

    def _fn(batch: pa.Table) -> pa.Table:
        idx = pc.fill_null(
            pc.index_in(batch.column(domain_col), value_set=q_doms),
            len(q_doms)).to_numpy(zero_copy_only=False)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(mix32(keys, seed=seed) < q_thr[idx]))

    return ds.map_batches(_fn, batch_format="pyarrow")


def split_thresholds(fractions) -> list:
    """[(name, int threshold)] with cumulative integer thresholds on
    [0, 2^32]; the LAST split absorbs rounding remainder (threshold
    forced to 2^32), so every row lands in exactly one split."""
    items = list(fractions.items())
    if not items:
        raise ValueError("fractions must be non-empty")
    total = 0.0
    out = []
    for name, frac in items:
        total += float(frac)
        out.append((name, int(total * float(_SPACE))))
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out[-1] = (out[-1][0], int(_SPACE))
    return out


def hash_split_batch(batch: pa.Table, thresholds: list,
                     key_col: str = "doc_id", seed: int = 0) -> pa.Table:
    """+ split: deterministic train/valid/test assignment by mix32
    range — searchsorted over the cumulative integer thresholds."""
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    h = mix32(keys, seed=seed)
    bounds = np.asarray([t for _, t in thresholds], dtype=np.uint64)
    idx = np.searchsorted(bounds, h, side="right")
    names = np.asarray([n for n, _ in thresholds], dtype=object)
    return batch.append_column("split",
                               pa.array(names[idx], pa.string()))


def hash_split(ds, fractions, key_col: str = "doc_id", seed: int = 0):
    """Deterministic corpus split (train/valid/test and friends): each
    row's split is a pure function of its key, so resumed partitions,
    re-sharded runs and different cluster sizes produce the identical
    split — and a DuckDB oracle can re-derive it with the same integer
    thresholds (``mix32_sql``). Stateless, shuffle-free."""
    thresholds = split_thresholds(fractions)
    return ds.map_batches(
        lambda b: hash_split_batch(b, thresholds, key_col=key_col,
                                   seed=seed),
        batch_format="pyarrow")


def mixture_thresholds(counts: Dict[str, int],
                       weights: Dict[str, int]) -> Dict[str, int]:
    """Exact integer accept thresholds that rebalance a corpus to a
    target domain mixture (the data-mixing step of every published LLM
    recipe — The Pile's per-source epochs, Gopher/MassiveText's
    sampling proportions, DoReMi's domain weights): given observed
    per-domain row counts and INTEGER target weights (domain d should
    contribute w_d / Σw of the sampled corpus), keep domain d at rate
    ``r_d = w_d · min_e(count_e / w_e) / count_d`` — the largest sample
    that hits the target mixture exactly without upsampling any domain
    (the binding domain keeps rate 1).

    Everything is exact integer arithmetic so a DuckDB oracle re-derives
    the identical accept set: the binding domain minimizes the FLOOR
    key ``count_d · 2^20 // w_d`` (ties → lexicographically smallest
    domain), and the returned thresholds are
    ``min(2^32, 2^32 · w_d · count_b // (w_b · count_d))`` on the mix32
    decision space. Domains absent from ``weights`` (or with weight 0)
    get threshold 0 — dropped, matching a mixture that excludes them."""
    live = sorted((d, int(counts[d]), int(w)) for d, w in weights.items()
                  if int(w) > 0 and int(counts.get(d, 0)) > 0)
    if not live:
        raise ValueError("no domain has both weight > 0 and rows > 0")
    SCALE = 1 << 20
    _, cb, wb = min(live, key=lambda t: (t[1] * SCALE // t[2], t[0]))
    space = 1 << 32
    return {d: min(space, space * w * cb // (wb * c)) for d, c, w in live}


def mixture_sample(ds, weights: Dict[str, int],
                   domain_col: str = "lang", key_col: str = "doc_id",
                   seed: int = 0):
    """Deterministic mixture rebalancing: downsample each domain so the
    surviving corpus matches the target integer-weight mixture, keeping
    the binding (scarcest-relative-to-target) domain whole.

    Scale shape: ONE cheap pre-pass — a native groupby-count over just
    the domain column (per-batch combiner inside Ray's aggregate; the
    result is one row per domain, thousands at most) — then the same
    stateless hash-filter as ``hash_sample``: no shuffle of the corpus,
    no state, decisions are pure functions of (domain, key) so resumed
    partitions and different cluster sizes reproduce the sample
    byte-identically."""
    cnt_rows = ds.select_columns([domain_col]).groupby(
        domain_col).count().take_all()
    counts = {r[domain_col]: r["count()"] for r in cnt_rows}
    thr = mixture_thresholds(counts, weights)
    items = sorted(thr.items())
    q_doms = pa.array([d for d, _ in items], type=pa.string())
    q_thr = np.array([t for _, t in items] + [0], dtype=np.uint64)

    def _fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.fill_null(
            pc.index_in(batch.column(domain_col), value_set=q_doms),
            len(items)).to_numpy(zero_copy_only=False)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(mix32(keys, seed=seed) < q_thr[idx]))

    return ds.map_batches(_fn, batch_format="pyarrow")


def exemplar_sample(ds, key_col: str = "lang", n: int = 3,
                    id_col: str = "doc_id", seed: int = 0):
    """Deterministic per-key exemplars: for every ``key_col`` value keep
    the ``n`` rows with the SMALLEST ``mix32(id)`` (ties by id) — a
    coordination-free stratified sample. This is the corpus-inspection
    primitive (pull k representative pages per language / per domain for
    human QA or prompt-mix audits) with the same re-run / resume /
    cluster-size-independence guarantees as :func:`hash_sample`: the
    exemplar set is a pure function of the row keys.

    Output: (key, id, h, rn) with rn = 1..n in hash order.

    Scale shape: a per-batch LOCAL ascending top-n per key (the shuffle
    carries at most n rows per (key, batch), never the corpus) followed
    by one groupby merge — the ``grouped_top_k`` layout from
    ops.textstats. The SQL oracle re-derives h with :func:`mix32_sql`
    and row_number() over the same ordering."""
    import pandas as pd

    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            key_col: batch.column(key_col).to_pylist(),
            id_col: ids,
            "h": mix32(ids, seed=seed).astype(np.int64)})
        df = df.sort_values(["h", id_col]).groupby(
            key_col, sort=False).head(n)
        return pa.Table.from_pandas(df, preserve_index=False)

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["h", id_col]).head(n).copy()
        g["rn"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (ds.select_columns([key_col, id_col])
            .map_batches(local, batch_format="pyarrow")
            .groupby(key_col).map_groups(merge, batch_format="pandas"))


def exemplar_sample_sql(table: str = "documents", key_col: str = "lang",
                        n: int = 3, id_col: str = "doc_id",
                        seed: int = 0) -> str:
    """DuckDB oracle for :func:`exemplar_sample`."""
    return (
        f"WITH h AS (SELECT {key_col}, {id_col}, "
        f"{mix32_sql(id_col, seed=seed)} AS h FROM {table}), "
        "r AS (SELECT *, CAST(row_number() OVER ("
        f"PARTITION BY {key_col} ORDER BY h, {id_col}) AS BIGINT) AS rn "
        "FROM h) "
        f"SELECT {key_col}, {id_col}, h, rn FROM r WHERE rn <= {n}")
