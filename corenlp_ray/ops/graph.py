"""Graph analytics over the materialized knowledge graph.

The reference stops at triple extraction; a KG-construction engine at
100 TB also has to ANALYZE the graph it materializes (the north rule's
"graph materialize" step): entity importance for ranking/linking
priors, degree for hot-key detection. ``kg_degree`` lives in the query
catalog already; this module adds PageRank as an iterative Ray Data
computation.

Distributed shape (the standard edge-partitioned formulation):

- the DISTINCT edge list, joined once with out-degrees, is materialized
  and co-partitioned by ``src`` (``ops/joins.bucketed_hash_join`` —
  the vectorized polars row-hash partitioner);
- each iteration is exactly two shuffles: rank ⋈ edges on ``src``
  (bucketed, co-partitioned) and a native hash aggregate of the edge
  contributions on ``dst`` (map-combined partials);
- ranks materialize per round (the iteration barrier — same pattern as
  the min-label-propagation connected components in ``ops/dedup.py``).

Dangling vertices (no out-edges) leak their mass, the common simple
variant — the SAME formula the fixed-iteration SQL oracle
(``pagerank_planted``) evaluates, so the semantics are pinned
end-to-end. Hot vertices (a celebrity entity with millions of
in-edges) cost one combiner row per block in the dst-aggregate, not a
shuffled row per edge.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_RANK_SCHEMA = pa.schema([("node", pa.string()), ("rank", pa.float64())])


def _rename(batch: pa.Table, mapping: dict) -> pa.Table:
    return batch.rename_columns(
        [mapping.get(c, c) for c in batch.column_names])


def pagerank(edges_ds, iterations: int = 3, damping: float = 0.85,
             src_col: str = "subj", dst_col: str = "obj"):
    """PageRank over the directed graph given by ``edges_ds``.

    Returns a Dataset of (node: string, rank: float64) for every vertex
    that appears as a source or destination. Parallel edges collapse to
    one (DISTINCT semantics)."""
    from ray.data.aggregate import Count, Sum

    from corenlp_ray.ops.joins import bucketed_hash_join

    # distinct edge list, normalized column names
    edges = (edges_ds
             .select_columns([src_col, dst_col])
             .map_batches(lambda b: _rename(b, {src_col: "src",
                                                dst_col: "dst"}),
                          batch_format="pyarrow")
             .groupby(["src", "dst"]).aggregate(Count())
             .select_columns(["src", "dst"]))

    deg = edges.groupby("src").aggregate(Count(alias_name="outdeg"))
    edges_deg = bucketed_hash_join(edges, deg, on="src").materialize()

    def _verts(b: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([
            c.cast(pa.string()) for col in ("src", "dst")
            for c in b.column(col).chunks]) if b.num_rows else \
            pa.array([], pa.string())
        return pa.table({"node": vals})

    verts = (edges.map_batches(_verts, batch_format="pyarrow")
             .groupby("node").aggregate(Count())
             .select_columns(["node"]).materialize())
    n = verts.count()
    if n == 0:
        import ray.data as rd
        return rd.from_arrow(_RANK_SCHEMA.empty_table())
    base = (1.0 - damping) / n
    init = 1.0 / n

    def _init(b: pa.Table) -> pa.Table:
        return b.append_column(
            "rank", pa.array(np.full(b.num_rows, init), pa.float64()))

    rank = verts.map_batches(_init, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        # contributions: rank(src)/outdeg(src) summed per dst
        r_src = rank.map_batches(
            lambda b: _rename(b, {"node": "src"}), batch_format="pyarrow")
        contrib = (bucketed_hash_join(edges_deg, r_src, on="src")
                   .map_batches(
                       lambda b: pa.table({
                           "dst": b.column("dst"),
                           "w": pa.array(
                               b.column("rank").to_numpy(zero_copy_only=False)
                               / b.column("outdeg").to_numpy(
                                   zero_copy_only=False),
                               pa.float64())}),
                       batch_format="pyarrow")
                   .groupby("dst").aggregate(Sum("w", alias_name="w_in")))
        joined = bucketed_hash_join(
            verts, contrib.map_batches(
                lambda b: _rename(b, {"dst": "node"}),
                batch_format="pyarrow"),
            on="node", how="left")

        def _update(b: pa.Table) -> pa.Table:
            w = b.column("w_in").to_numpy(zero_copy_only=False)
            w = np.where(np.isnan(w.astype(np.float64)), 0.0,
                         w.astype(np.float64))
            return pa.Table.from_pydict(
                {"node": b.column("node"),
                 "rank": base + damping * w}, schema=_RANK_SCHEMA)

        rank = joined.map_batches(_update,
                                  batch_format="pyarrow").materialize()

    return rank
