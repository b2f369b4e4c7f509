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


# within-cluster pairwise compare cap: above this, a cluster is chunked
# (id-sorted) and compared within chunks only — recall loss is LOGGED
# per the no-silent-caps rule; at scale, raise k instead so clusters
# stay under the cap
MAX_PAIRWISE = 4096

DROPPED_PAIRS: dict = {}  # per-process counter of skipped comparisons


def _cluster_dup_labels(group: pa.Table, threshold: float,
                        id_col: str, emb_col: str) -> pa.Table:
    """(id, dup_group) for one cluster: exact connected components of
    the in-cluster cosine-threshold graph, computed locally by
    vectorized min-label propagation on the boolean similarity matrix
    (iterations = component diameter; near-dup groups are shallow).
    Candidate edges are cluster-local BY CONSTRUCTION (the k-means
    fence), so these local components ARE the global dup groups — no
    edge materialization, no global CC round."""
    import logging

    ids = group.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    x = _mat(group, emb_col)[order]
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0.0, 1.0, norms)
    n = len(ids)
    if n > MAX_PAIRWISE:
        n_chunks = -(-n // MAX_PAIRWISE)
        skipped = n * (n - 1) // 2
        for s in range(0, n, MAX_PAIRWISE):
            m = min(MAX_PAIRWISE, n - s)
            skipped -= m * (m - 1) // 2
        DROPPED_PAIRS["semantic_dedup"] = (
            DROPPED_PAIRS.get("semantic_dedup", 0) + skipped)
        logging.getLogger(__name__).warning(
            "semantic_dedup: cluster of %d > MAX_PAIRWISE=%d split into "
            "%d chunks; %d cross-chunk comparisons skipped "
            "(process total skipped=%d)", n, MAX_PAIRWISE, n_chunks,
            skipped, DROPPED_PAIRS["semantic_dedup"])
    out = np.empty(n, dtype=np.int64)
    for s in range(0, n, MAX_PAIRWISE):
        xi = x[s:s + MAX_PAIRWISE]
        ii = ids[s:s + MAX_PAIRWISE]
        adj = (xi @ xi.T) >= threshold
        np.fill_diagonal(adj, True)
        labels = ii.copy()
        while True:
            # label(i) <- min label over i's neighborhood (incl. self)
            spread = np.where(adj, labels[None, :], np.iinfo(np.int64).max)
            new = spread.min(axis=1)
            if np.array_equal(new, labels):
                break
            labels = new
        out[s:s + len(ii)] = labels
    return pa.table({id_col: pa.array(ids, pa.int64()),
                     "dup_group": pa.array(out, pa.int64())})


def semantic_dedup(embeds_ds, k: int, threshold: float = 0.95,
                   iterations: int = 2, id_col: str = "vec_id",
                   emb_col: str = "embedding"):
    """SemDeDup (Abbas et al. 2023): k-means partition → exact cosine
    dup groups WITHIN each cluster → (id_col, dup_group = min id of the
    near-dup group; singletons map to themselves).

    The k-means fence bounds the pairwise compare to |cluster|² — the
    same bucketize-then-verify shape as the MinHash and embedding-LSH
    dedup paths, with the cluster structure doing the candidate
    generation. Because every candidate edge is cluster-local, the dup
    groups are computed EXACTLY inside each ``map_groups`` call and the
    op's only all-to-all is the one cluster groupby; n label rows come
    out where an edge-materializing design would shuffle up to n² edges
    into a global connected-components loop (dup cliques are the common
    case — boilerplate pages, mirrored sites). Nothing materializes on
    the driver except the k×d centroid matrix."""
    import ray

    _, cents = kmeans(embeds_ds, k, iterations=iterations,
                      id_col=id_col, emb_col=emb_col)
    cref = ray.put(cents)
    cache: dict = {}

    def tag(batch: pa.Table) -> pa.Table:
        if "c" not in cache:
            cache["c"] = ray.get(cref)
        a = _assign(_mat(batch, emb_col), cache["c"])
        return batch.append_column("cluster", pa.array(a, pa.int64()))

    tagged = (embeds_ds.select_columns([id_col, emb_col])
              .map_batches(tag, batch_format="pyarrow"))
    return (tagged.groupby("cluster")
            .map_groups(lambda g: _cluster_dup_labels(
                g, threshold, id_col, emb_col),
                batch_format="pyarrow"))
