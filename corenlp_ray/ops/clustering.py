"""Distributed k-means over an embedding column — the corpus-clustering
primitive behind SemDeDup-style semantic dedup (Abbas et al. 2023),
cluster-balanced sampling, and IVF index building (the seeded variant in
``ops/similarity.ivf_topk`` shares the assignment kernel shape).

Distributed shape (classic mini-batch-free Lloyd's, one Ray Data pass
per iteration):

- **Init is deterministic**: the centroids are the vectors of the ``k``
  smallest ids — a per-block local k-smallest ``map_batches`` followed
  by one tiny driver reduce over ``k × blocks`` candidate rows. No RNG,
  so two clusters of different sizes (or a resumed run) produce the
  identical model.
- **Each iteration** broadcasts the ``k × d`` centroid matrix via
  ``ray.put`` (fetched once per worker) and streams one shuffle-free
  ``map_batches`` pass emitting per-block partials — ``(cluster,
  count, vector-sum)``, at most ``k`` rows per block; the partials
  collapse through one ``groupby(cluster).map_groups`` reduce (k rows
  out) and the driver recomputes means. Driver state is exactly one
  ``k × d`` float64 matrix per round — never the corpus.
- **Assignment** is vectorized: ``argmin(|x|² − 2·X·Cᵀ + |c|²)`` over a
  numpy matmul per batch, zero Python per-row work.
- Empty clusters keep their previous centroid (the standard guard).

At 10^12 rows the only all-to-all is the k-row partial reduce per
iteration; everything else is embarrassingly parallel. Hot clusters
cost one partial row per block, not a shuffled row per member.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mat(batch: pa.Table, emb_col: str) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column (uniform d)."""
    col = batch.column(emb_col).combine_chunks()
    vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return vals.reshape(n, -1) if n else vals.reshape(0, 0)


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row (squared L2; ties → lowest id)."""
    d2 = (np.einsum("ij,ij->i", x, x)[:, None]
          - 2.0 * (x @ cents.T)
          + np.einsum("ij,ij->i", cents, cents)[None, :])
    return np.argmin(d2, axis=1).astype(np.int64)


def _init_centroids(embeds_ds, k: int, id_col: str,
                    emb_col: str) -> np.ndarray:
    """Vectors of the k smallest ids: local k-smallest per block, one
    k×blocks-row driver reduce."""
    def local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, emb_col]).take(pa.array(keep))

    cand = (embeds_ds.select_columns([id_col, emb_col])
            .map_batches(local, batch_format="pyarrow").take_all())
    cand.sort(key=lambda r: r[id_col])
    return np.asarray([list(r[emb_col]) for r in cand[:k]],
                      dtype=np.float64)


def kmeans(embeds_ds, k: int, iterations: int = 3,
           id_col: str = "vec_id", emb_col: str = "embedding"):
    """Lloyd's k-means; returns (assignments Dataset with schema
    (id_col, cluster: int64), centroids ndarray (k, d)).

    Deterministic end-to-end: min-id init, fixed iteration count,
    lowest-index tie-breaks — cluster-size and block-layout invariant."""
    import ray

    cents = _init_centroids(embeds_ds, k, id_col, emb_col)
    k_eff, d = cents.shape
    src = embeds_ds.select_columns([id_col, emb_col])

    for _ in range(iterations):
        cref = ray.put(cents)
        cache: dict = {}

        def partials(batch: pa.Table, _cref=cref, _cache=cache) -> pa.Table:
            if "c" not in _cache:
                _cache["c"] = ray.get(_cref)
            c = _cache["c"]
            x = _mat(batch, emb_col)
            a = _assign(x, c)
            used = np.unique(a)
            sums = np.zeros((len(used), d), dtype=np.float64)
            np.add.at(sums, np.searchsorted(used, a), x)
            cnts = np.bincount(np.searchsorted(used, a),
                               minlength=len(used)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(used, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
                "vsum": pa.array(sums.tolist(),
                                 pa.list_(pa.float64()))})

        def reduce_group(g: pa.Table) -> pa.Table:
            s = _mat(g, "vsum").sum(axis=0)
            return pa.table({
                "cluster": g.column("cluster").slice(0, 1),
                "cnt": pa.array(
                    [int(g.column("cnt").to_numpy().sum())], pa.int64()),
                "vsum": pa.array([s.tolist()], pa.list_(pa.float64()))})

        rows = (src.map_batches(partials, batch_format="pyarrow")
                .groupby("cluster")
                .map_groups(reduce_group, batch_format="pyarrow")
                .take_all())
        new = cents.copy()  # empty clusters keep their centroid
        for r in rows:
            if r["cnt"]:
                new[int(r["cluster"])] = (
                    np.asarray(r["vsum"], dtype=np.float64) / r["cnt"])
        cents = new

    cref = ray.put(cents)
    cache2: dict = {}

    def assign_batch(batch: pa.Table) -> pa.Table:
        if "c" not in cache2:
            cache2["c"] = ray.get(cref)
        a = _assign(_mat(batch, emb_col), cache2["c"])
        return pa.table({id_col: batch.column(id_col),
                         "cluster": pa.array(a, pa.int64())})

    return (src.map_batches(assign_batch, batch_format="pyarrow"),
            cents)


def kmeans_assignments(embeds_ds, k: int, iterations: int = 3,
                       id_col: str = "vec_id",
                       emb_col: str = "embedding"):
    """Assignments-only convenience wrapper (the catalog surface)."""
    ds, _ = kmeans(embeds_ds, k, iterations=iterations,
                   id_col=id_col, emb_col=emb_col)
    return ds
