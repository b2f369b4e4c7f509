"""TF-IDF keyword extraction — per-document top-k salient terms, the
classic corpus-statistics feature for retrieval indexing, topic
labeling and quality heuristics over a web corpus.

Semantics (pinned by the ``tfidf_planted`` DuckDB oracle):

    score(d, w) = tf(d, w) * log2((N + 1) / (df(w) + 1))

with ``tf`` the within-doc whitespace-token count, ``df`` the number of
docs containing the token, ``N`` the number of non-empty docs; per doc
the top ``k`` terms by (score desc, term asc) are kept with their rank.
Both sides compute the score from the same integers with the same IEEE
ops, so ranking ties resolve identically.

Distributed shape: document frequencies are one native two-phase
aggregate over per-batch (token, distinct-doc-count) partials; the df
table broadcasts once via ``ray.put`` (prune with ``min_df`` at web
scale — a dropped token can never be a top-k term for any doc that
matters when ``min_df`` ≪ corpus; the knob is logged in the docstring
contract rather than silently applied); scoring + per-doc top-k is one
shuffle-free polars pass per batch.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("term", pa.string()),
    ("score", pa.float64()),
    ("rank", pa.int64()),
])


def _pl():
    import polars as pl
    return pl


def doc_frequencies(docs_ds, text_col: str = "text"):
    """(token, df) Dataset — df = number of docs containing the token.
    Per-batch partials already collapse duplicates within a doc, so the
    shuffle carries at most (distinct tokens × blocks) rows."""
    from ray.data.aggregate import Sum

    from corenlp_ray.ops.lm import _token_frame

    pl = _pl()

    def partials(batch: pa.Table) -> pa.Table:
        t = _token_frame(batch, text_col)
        return (t.explode("toks").unique(["doc_id", "toks"])
                 .group_by("toks").len()
                 .select(pl.col("toks").alias("token"),
                         pl.col("len").cast(pl.Int64).alias("df"))
                 .to_arrow())

    return (docs_ds.map_batches(partials, batch_format="pyarrow")
            .repartition(target_num_rows_per_block=200_000)
            .groupby("token").aggregate(Sum("df", alias_name="df")))


def _n_docs(docs_ds, text_col: str) -> int:
    """Number of docs with at least one token."""
    from corenlp_ray.ops.lm import _token_frame

    def nonempty(batch: pa.Table) -> pa.Table:
        t = _token_frame(batch, text_col)
        return pa.table({"n": pa.array([t.height], pa.int64())})

    from ray.data.aggregate import Sum
    row = (docs_ds.map_batches(nonempty, batch_format="pyarrow")
           .aggregate(Sum("n", alias_name="n")))
    return int(row["n"])


_TFIDF_CACHE: dict = {}


def tfidf_top_terms(docs_ds, k: int = 5, text_col: str = "text"):
    """Per-doc top-k TF-IDF terms: (doc_id, term, score round 6,
    rank 1..k). One df aggregate + one broadcast-scored pass."""
    import ray

    from corenlp_ray.ops.lm import _collect, _token_frame

    df_ds = doc_frequencies(docs_ds, text_col=text_col).materialize()
    n_docs = _n_docs(docs_ds, text_col)
    df_ref = ray.put(_collect(df_ds, pa.schema(
        [("token", pa.string()), ("df", pa.int64())])))

    def score(batch: pa.Table) -> pa.Table:
        pl = _pl()
        key = ("tfidf", df_ref.hex())
        dff = _TFIDF_CACHE.get(key)
        if dff is None:
            _TFIDF_CACHE.clear()
            dff = _TFIDF_CACHE[key] = pl.from_arrow(ray.get(df_ref))
        t = _token_frame(batch, text_col)
        if t.height == 0:
            return _OUT_SCHEMA.empty_table()
        tf = (t.explode("toks")
               .group_by(["doc_id", "toks"]).len()
               .join(dff, left_on="toks", right_on="token", how="left"))
        tfv = tf.get_column("len").to_numpy().astype(np.float64)
        dfv = tf.get_column("df").fill_null(0).to_numpy().astype(np.float64)
        sc = tfv * np.log2((float(n_docs) + 1.0) / (dfv + 1.0))
        ranked = (tf.select(["doc_id", pl.col("toks").alias("term")])
                  .with_columns(pl.Series("score", sc))
                  .sort(["doc_id", "score", "term"],
                        descending=[False, True, False])
                  .with_columns(pl.col("score").cum_count()
                                .over("doc_id").cast(pl.Int64)
                                .alias("rank"))
                  .filter(pl.col("rank") <= k)
                  .with_columns(pl.col("score").round(6)))
        return ranked.to_arrow().cast(_OUT_SCHEMA)

    return docs_ds.map_batches(score, batch_format="pyarrow")
