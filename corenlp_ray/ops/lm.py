"""N-gram language-model perplexity scoring — the CCNet-style quality
filter (Wenzek et al. 2020: score every page with a small LM trained on
a trusted corpus; keep the low-perplexity head).

Not a reference operator — this is the LLM-training-data extension
surface. The model is a bigram LM with add-one smoothing over the
engine's whitespace tokens (``ops/textstats.token_count_batch``
convention), chosen so a DuckDB oracle can re-derive every score
exactly: for a document ``w_1..w_n``,

    nll_1 = log2(N + V)            - log2(c1(w_1) + 1)
    nll_i = log2(c1(w_{i-1}) + V)  - log2(c2(w_{i-1}, w_i) + 1)   i > 1
    lm_bits = mean(nll_i)          # bits per token; ppl = 2**lm_bits

where ``c1``/``c2`` are corpus unigram/bigram counts, ``N`` total
tokens, ``V`` distinct unigrams. Unseen grams fall through the +1 / +V
smoothing, so the model scores held-out text without special cases.

Distributed shape:

- **Training** is one shuffle: per-batch partial gram counts (polars
  ``group_by`` on the exploded token frame — no Python per-row work)
  collapse through the native map-combined hash aggregate into one
  (w1, w2, count) table; unigrams ride the same aggregate as rows with
  ``w2 = ''`` (tokens are ``\\S+`` so the sentinel cannot collide).
- **Scoring** has two regimes, same split as the MinHash verify stage:
  below ``broadcast_limit`` distinct grams the count table is
  ``ray.put`` ONCE and every scoring task joins against it in-process
  (polars hash joins per batch, numpy ``log2`` for the arithmetic);
  above it, the exploded (doc_id, pos, w, prev) token table is bucketed
  on the gram key and joined distributed
  (``ops/joins.bucketed_hash_join``) — three key-partitioned joins plus
  one doc_id aggregate, no driver state. Both regimes are pinned
  row-identical by ``tests/test_lm.py``.
- ``min_count`` prunes the tail of the count table (at web scale the
  distinct-gram count is ~10^9; pruned grams score as unseen, which is
  exactly the smoothing semantics) — the knob that keeps the broadcast
  regime viable on 100 TB.

The full pipeline (train on corpus → score corpus) is the oracled
catalog query ``lm_perplexity`` — the DuckDB oracle recomputes counts
and scores from the raw documents table, so the driver pins tokenizer,
smoothing, and mean to 6 decimals.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa


def _polars():
    import polars as pl
    return pl


def _token_frame(batch: pa.Table, text_col: str):
    """(doc_id, toks list) polars frame for non-empty docs; ``\\S+``
    extraction ≡ whitespace-split of trimmed text (the oracle's
    ``regexp_split_to_array(trim(text), '\\s+')``)."""
    pl = _polars()
    df = pl.from_arrow(batch.select(["doc_id", text_col]))
    return (df.with_columns(
                pl.col(text_col).str.extract_all(r"\S+").alias("toks"))
              .filter(pl.col("toks").list.len() > 0)
              .select(["doc_id", "toks"]))


def _gram_partials(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch partial gram counts: unigram rows carry ``w2=''``."""
    pl = _polars()
    t = _token_frame(batch, text_col)
    e = (t.explode("toks")
          .with_columns(pl.col("toks").shift(1).over("doc_id")
                        .alias("prev")))
    uni = (e.group_by("toks").len()
            .select(pl.col("toks").alias("w1"),
                    pl.lit("").alias("w2"),
                    pl.col("len").cast(pl.Int64).alias("c")))
    bi = (e.filter(pl.col("prev").is_not_null())
           .group_by(["prev", "toks"]).len()
           .select(pl.col("prev").alias("w1"),
                   pl.col("toks").alias("w2"),
                   pl.col("len").cast(pl.Int64).alias("c")))
    return pl.concat([uni, bi]).to_arrow()


def train_bigram_counts(docs_ds, text_col: str = "text",
                        min_count: int = 1):
    """Corpus gram counts as a Dataset of (w1, w2, c) — ``w2=''`` rows
    are unigrams. One native two-phase aggregate; ``min_count`` prunes
    the tail AFTER the aggregate (so N and V still reflect the full
    corpus — they are returned by :func:`lm_stats`)."""
    from ray.data.aggregate import Sum

    partials = docs_ds.map_batches(lambda b: _gram_partials(b, text_col),
                                   batch_format="pyarrow")
    # coalesce the per-block partials before the aggregate: each block
    # emits at most its distinct-gram count, so hundreds of tiny blocks
    # pay more in per-task overhead than in data. target_num_rows is
    # adaptive (minimal-movement coalesce, NOT a shuffle): small inputs
    # collapse to a handful of blocks, 100-TB inputs keep their width
    counts = (partials
              .repartition(target_num_rows_per_block=200_000)
              .groupby(["w1", "w2"]).aggregate(Sum("c", alias_name="c")))
    if min_count > 1:
        import pyarrow.compute as pc
        mc = int(min_count)

        def prune(b: pa.Table) -> pa.Table:
            keep = pc.or_(pc.greater_equal(b.column("c"), mc),
                          pc.equal(b.column("w2"), ""))
            return b.filter(keep)

        counts = counts.map_batches(prune, batch_format="pyarrow")
    return counts


def _collect(counts_ds, schema: pa.Schema) -> pa.Table:
    """Driver-side concat of a (small) counts Dataset; skips the
    zero-row zero-schema blocks a repartition can leave behind."""
    import ray
    parts = [p for p in ray.get(counts_ds.to_arrow_refs()) if p.num_rows]
    return (pa.concat_tables(parts) if parts
            else schema.empty_table())


def lm_stats(counts_ds) -> tuple[int, int]:
    """(N total tokens, V distinct unigrams) from a counts Dataset —
    one tiny aggregate over the unigram rows."""
    from ray.data.aggregate import Count, Sum

    uni = counts_ds.filter(expr="w2 == ''")
    row = uni.aggregate(Sum("c", alias_name="n"), Count())
    return int(row["n"]), int(row["count()"])


# per-worker-process cache of prepared scorers, keyed by broadcast-ref
# hex: scoring runs in the ordinary TASK pool (no actor-pool startup
# cost; Ray reuses worker processes, so the polars count frames are
# built once per worker either way). At most one entry is kept — a new
# LM evicts the old.
_SCORER_CACHE: dict = {}


def _cached_scorer(key, build):
    scorer = _SCORER_CACHE.get(key)
    if scorer is None:
        _SCORER_CACHE.clear()
        scorer = _SCORER_CACHE[key] = build()
    return scorer


class _BroadcastScorer:
    """Scoring kernel: fetches the broadcast count frames once per
    worker process, scores each batch with polars joins + numpy log2."""

    def __init__(self, counts_ref, n_tokens: int, vocab: int,
                 text_col: str):
        import ray
        pl = _polars()
        tbl = ray.get(counts_ref)
        df = pl.from_arrow(tbl)
        self._uc = (df.filter(pl.col("w2") == "")
                      .select(pl.col("w1").alias("w"),
                              pl.col("c").alias("cu")))
        self._bc = df.filter(pl.col("w2") != "").select(["w1", "w2", "c"])
        self._n, self._v = float(n_tokens), float(vocab)
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = _polars()
        t = _token_frame(batch, self._text_col)
        if t.height == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "lm_bits": pa.array([], pa.float64())})
        e = (t.explode("toks")
              .with_columns(pl.col("toks").shift(1).over("doc_id")
                            .alias("prev"))
              .join(self._uc, left_on="toks", right_on="w", how="left")
              .join(self._uc.rename({"w": "prev", "cu": "cu_prev"}),
                    on="prev", how="left")
              .join(self._bc.rename({"w1": "prev", "w2": "toks",
                                     "c": "cb"}),
                    on=["prev", "toks"], how="left"))
        doc = e.get_column("doc_id").to_numpy()
        first = e.get_column("prev").is_null().to_numpy()
        cu = e.get_column("cu").fill_null(0).to_numpy().astype(np.float64)
        cup = (e.get_column("cu_prev").fill_null(0).to_numpy()
               .astype(np.float64))
        cb = e.get_column("cb").fill_null(0).to_numpy().astype(np.float64)
        nll = np.where(
            first,
            np.log2(self._n + self._v) - np.log2(cu + 1.0),
            np.log2(cup + self._v) - np.log2(cb + 1.0))
        out = (pl.DataFrame({"doc_id": doc, "nll": nll})
               .group_by("doc_id")
               .agg(pl.len().cast(pl.Int64).alias("n_tokens"),
                    pl.col("nll").mean().round(6).alias("lm_bits")))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("lm_bits", pa.float64())]))


# above this many count rows the broadcast table stops being "small
# side" (~100 MB of grams) and scoring switches to the bucketed joins
BROADCAST_LIMIT = 2_000_000


def score_perplexity(docs_ds, counts_ds, text_col: str = "text",
                     broadcast_limit: Optional[int] = None):
    """Score every non-empty doc: (doc_id, n_tokens, lm_bits) with
    ``lm_bits`` = mean bits/token (round 6); perplexity = 2**lm_bits.

    Picks the broadcast regime under ``broadcast_limit`` distinct grams
    and the distributed-join regime above it (see module docstring)."""
    limit = BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    n_tokens, vocab = lm_stats(counts_ds)
    n_grams = counts_ds.count()
    if n_grams <= limit:
        import ray
        counts_ref = ray.put(_collect(counts_ds, pa.schema(
            [("w1", pa.string()), ("w2", pa.string()),
             ("c", pa.int64())])))

        def score(batch: pa.Table) -> pa.Table:
            scorer = _cached_scorer(
                ("lm", counts_ref.hex(), text_col),
                lambda: _BroadcastScorer(counts_ref, n_tokens, vocab,
                                         text_col))
            return scorer(batch)

        return docs_ds.map_batches(score, batch_format="pyarrow")
    return _score_joined(docs_ds, counts_ds, n_tokens, vocab, text_col)


def _exploded_tokens(docs_ds, text_col: str):
    """(doc_id, pos, tok, prev) token table — the join-regime's big
    side; one shuffle-free pass."""
    pl = _polars()

    def explode(batch: pa.Table) -> pa.Table:
        t = _token_frame(batch, text_col)
        e = (t.explode("toks")
              .with_columns(
                  (pl.col("toks").cum_count().over("doc_id"))
                  .cast(pl.Int64).alias("pos"),
                  pl.col("toks").shift(1).over("doc_id").alias("prev"))
              .select(["doc_id", "pos",
                       pl.col("toks").alias("tok"), "prev"]))
        return e.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("pos", pa.int64()),
            ("tok", pa.string()), ("prev", pa.string())]))

    return docs_ds.map_batches(explode, batch_format="pyarrow")


def _score_joined(docs_ds, counts_ds, n_tokens: int, vocab: int,
                  text_col: str):
    """Distributed-join scoring regime: bucket the exploded token table
    on the gram keys, join counts, aggregate per doc. Three bucketed
    joins (unigram-of-token, unigram-of-prev, bigram) — every shuffle
    is key-partitioned; no broadcast state."""
    from ray.data.aggregate import Count, Mean

    from corenlp_ray.ops.joins import bucketed_hash_join

    pl = _polars()
    uni = (counts_ds.filter(expr="w2 == ''")
           .map_batches(lambda b: pl.from_arrow(b)
                        .select(pl.col("w1").alias("tok"),
                                pl.col("c").alias("cu")).to_arrow(),
                        batch_format="pyarrow"))
    uni_prev = uni.map_batches(
        lambda b: b.rename_columns(["prev", "cu_prev"]),
        batch_format="pyarrow")
    bi = (counts_ds.filter(expr="w2 != ''")
          .map_batches(lambda b: pl.from_arrow(b)
                       .select(pl.col("w1").alias("prev"),
                               pl.col("w2").alias("tok"),
                               pl.col("c").alias("cb")).to_arrow(),
                       batch_format="pyarrow"))

    toks = _exploded_tokens(docs_ds, text_col)
    # first tokens have prev NULL — route them through the unigram join
    # only; bucketed joins key on strings, so give NULL a sentinel that
    # no \S+ token can equal (empty string)
    toks = toks.map_batches(
        lambda b: b.set_column(b.column_names.index("prev"), "prev",
                               b.column("prev").fill_null("")),
        batch_format="pyarrow")
    j = bucketed_hash_join(toks, uni, on="tok", how="left")
    j = bucketed_hash_join(j, uni_prev, on="prev", how="left")
    j = bucketed_hash_join(j, bi, on=["prev", "tok"], how="left")

    n, v = float(n_tokens), float(vocab)

    def nll(batch: pa.Table) -> pa.Table:
        d = pl.from_arrow(batch)
        first = d.get_column("prev").to_numpy() == ""
        cu = d.get_column("cu").fill_null(0).to_numpy().astype(np.float64)
        cup = (d.get_column("cu_prev").fill_null(0).to_numpy()
               .astype(np.float64))
        cb = d.get_column("cb").fill_null(0).to_numpy().astype(np.float64)
        vals = np.where(first,
                        np.log2(n + v) - np.log2(cu + 1.0),
                        np.log2(cup + v) - np.log2(cb + 1.0))
        return pa.table({"doc_id": batch.column("doc_id"), "nll": vals})

    scored = j.map_batches(nll, batch_format="pyarrow")
    out = (scored.groupby("doc_id")
           .aggregate(Count(), Mean("nll", alias_name="lm_bits")))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": batch.column("count()").cast(pa.int64()),
            "lm_bits": pc.round(batch.column("lm_bits"), 6)})

    return out.map_batches(finish, batch_format="pyarrow")


def lm_perplexity(docs_ds, text_col: str = "text", min_count: int = 1,
                  broadcast_limit: Optional[int] = None):
    """Train-on-corpus → score-corpus in one call (the CCNet self-score
    shape; pass a different trusted corpus to ``train_bigram_counts``
    for the two-corpus filter)."""
    counts = train_bigram_counts(docs_ds, text_col=text_col,
                                 min_count=min_count).materialize()
    return score_perplexity(docs_ds, counts, text_col=text_col,
                            broadcast_limit=broadcast_limit)


# ---------------------------------------------------------------- DSIR ----

def train_unigram_counts(docs_ds, text_col: str = "text"):
    """Corpus unigram counts as a Dataset of (w, c) — one native
    two-phase aggregate (the unigram half of the bigram trainer)."""
    from ray.data.aggregate import Sum

    pl = _polars()

    def partials(batch: pa.Table) -> pa.Table:
        t = _token_frame(batch, text_col)
        return (t.explode("toks").group_by("toks").len()
                 .select(pl.col("toks").alias("w"),
                         pl.col("len").cast(pl.Int64).alias("c"))
                 .to_arrow())

    return (docs_ds.map_batches(partials, batch_format="pyarrow")
            .repartition(target_num_rows_per_block=200_000)
            .groupby("w").aggregate(Sum("c", alias_name="c")))


def unigram_stats(counts_ds) -> tuple[int, int]:
    """(N total tokens, V distinct words) of a unigram counts Dataset."""
    from ray.data.aggregate import Count, Sum

    row = counts_ds.aggregate(Sum("c", alias_name="n"), Count())
    return int(row["n"]), int(row["count()"])


class _DsirScorer:
    """Per-batch DSIR scoring against two broadcast unigram tables
    (task-pool kernel, cached per worker process like the LM scorer)."""

    def __init__(self, tref, rref, nt, vt, nr, vr, text_col):
        import ray
        pl = _polars()
        self._t = (pl.from_arrow(ray.get(tref))
                   .rename({"c": "ct"}))
        self._r = (pl.from_arrow(ray.get(rref))
                   .rename({"c": "cr"}))
        self._nt, self._vt = float(nt), float(vt)
        self._nr, self._vr = float(nr), float(vr)
        self._text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pl = _polars()
        t = _token_frame(batch, self._text_col)
        if t.height == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "dsir_bits": pa.array([], pa.float64())})
        e = (t.explode("toks")
              .join(self._t, left_on="toks", right_on="w", how="left")
              .join(self._r, left_on="toks", right_on="w", how="left"))
        ct = e.get_column("ct").fill_null(0).to_numpy().astype(np.float64)
        cr = e.get_column("cr").fill_null(0).to_numpy().astype(np.float64)
        bits = ((np.log2(ct + 1.0) - np.log2(self._nt + self._vt))
                - (np.log2(cr + 1.0) - np.log2(self._nr + self._vr)))
        out = (pl.DataFrame({"doc_id": e.get_column("doc_id").to_numpy(),
                             "bits": bits})
               .group_by("doc_id")
               .agg(pl.len().cast(pl.Int64).alias("n_tokens"),
                    pl.col("bits").mean().round(6).alias("dsir_bits")))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
            ("dsir_bits", pa.float64())]))


def dsir_logratio(raw_ds, target_ds, text_col: str = "text"):
    """DSIR importance weights (Xie et al. 2023, reduced to the unigram
    feature space so a DuckDB oracle can re-derive every weight): score
    each raw doc by the mean per-token log-likelihood ratio between an
    add-one-smoothed target-corpus unigram LM and the raw-corpus LM —

        dsir_bits = mean_i [ log2 p_target(w_i) − log2 p_raw(w_i) ]

    Positive = target-like (keep under importance resampling). Two
    two-phase count aggregates + one broadcast-scored map_batches pass;
    at web scale prune both count tables with a min-count before the
    broadcast (pruned grams fall through the +1 smoothing), the same
    regime knob as :func:`score_perplexity`."""
    import ray

    tc = train_unigram_counts(target_ds, text_col=text_col).materialize()
    rc = train_unigram_counts(raw_ds, text_col=text_col).materialize()
    nt, vt = unigram_stats(tc)
    nr, vr = unigram_stats(rc)
    uni_schema = pa.schema([("w", pa.string()), ("c", pa.int64())])
    tref = ray.put(_collect(tc, uni_schema))
    rref = ray.put(_collect(rc, uni_schema))

    def score(batch: pa.Table) -> pa.Table:
        scorer = _cached_scorer(
            ("dsir", tref.hex(), rref.hex(), text_col),
            lambda: _DsirScorer(tref, rref, nt, vt, nr, vr, text_col))
        return scorer(batch)

    return raw_ds.map_batches(score, batch_format="pyarrow")


def perplexity_buckets(scored_ds, n_buckets: int = 3,
                       labels=("head", "middle", "tail")):
    """+ bucket: CCNet's final step (Wenzek et al. 2020 §4.4) — split
    the corpus into head/middle/tail by LM-score rank with EXACT SQL
    ``ntile(n)`` semantics: rows ranked by (lm_bits, doc_id); earlier
    buckets absorb the remainder, sizes differ by at most 1.

    Distributed shape: ``scored_ds`` (one thin row per doc) is
    materialized once; the rank boundaries come from ONE all-to-all
    sort of the 2-column projection plus ``split_at_indices`` +
    ``limit(1)`` per boundary (only n_buckets-1 single rows ever reach
    the driver); assignment is then a broadcast lexicographic compare
    per batch — the corpus itself never shuffles."""
    import numpy as np

    if len(labels) != n_buckets:
        raise ValueError("labels must have n_buckets entries")
    scored = scored_ds.materialize()
    n = scored.count()
    q, r = divmod(n, n_buckets)
    sizes = [q + (1 if i < r else 0) for i in range(n_buckets)]
    idxs = list(np.cumsum(sizes)[:-1].astype(int))
    srt = (scored.select_columns(["doc_id", "lm_bits"])
           .sort(["lm_bits", "doc_id"]))
    cuts = []  # first (lm_bits, doc_id) of bucket i+1; None = empty
    for part in srt.split_at_indices(idxs)[1:]:
        rows = part.limit(1).take_all()
        cuts.append((float(rows[0]["lm_bits"]), int(rows[0]["doc_id"]))
                    if rows else None)

    def assign(batch: pa.Table) -> pa.Table:
        bits = batch.column("lm_bits").to_numpy(zero_copy_only=False)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        idx = np.zeros(batch.num_rows, dtype=np.int64)
        for cut in cuts:
            if cut is None:
                continue
            cb, ci = cut
            # row is at/after this boundary → bucket index + 1
            idx += ((bits > cb) | ((bits == cb) & (ids >= ci)))
        lab = np.asarray(labels, dtype=object)
        return batch.append_column("bucket",
                                   pa.array(lab[idx], pa.string()))

    return scored.map_batches(assign, batch_format="pyarrow")


# unigram vocabularies at or below this size attach to bigrams via one
# ray.put broadcast + per-batch Arrow hash join; above it, two bucketed
# hash joins (the 100-TB path). ~2M rows x ~30 B is a <100 MB object.
_PMI_BROADCAST_VOCAB_MAX = 2_000_000


def pmi_collocations(docs_ds, text_col: str = "text",
                     min_count: int = 5):
    """Pointwise-mutual-information collocation scoring (Church & Hanks
    1990) — the classic association-mining / KG-edge-weighting
    primitive: for every adjacent token bigram with corpus count ≥
    ``min_count``, PMI = ln(P(w1w2) / (P(w1)·P(w2))) with bigram
    probability over the total bigram count Nb and unigram
    probabilities over the total token count N.

    Output: (w1, w2, c12, c1, c2, pmi) — counts exact, pmi rounded to
    6 dp with the identical left-associated double expression the SQL
    oracle evaluates, ``ln((c12·N·N) / (Nb·c1·c2))``.

    Scale shape: reuses :func:`train_bigram_counts` (per-batch polars
    partial gram counts → one native two-phase aggregate), so the only
    corpus-wide shuffle carries (w1, w2, c) rows, never text. The
    counts Dataset is materialized ONCE (it is vocab²-bounded and
    min_count-pruned ≪ corpus). Unigram counts attach to each bigram
    side by the two-regime rule every small-side lookup here follows
    (stages/canonicalize.py sets the pattern): vocabularies up to
    ``_PMI_BROADCAST_VOCAB_MAX`` are collected once, ``ray.put``, and
    joined per batch inside Arrow's hash join (zero all-to-alls);
    larger vocabularies switch to two bucketed hash joins (no driver
    materialization). N and Nb are two scalar aggregates."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    from corenlp_ray.ops.joins import bucketed_hash_join

    counts = train_bigram_counts(docs_ds, text_col=text_col).materialize()
    n_tokens, vocab = lm_stats(counts)
    bi_all = counts.filter(expr="w2 != ''")
    nb = int(bi_all.aggregate(Sum("c", alias_name="nb"))["nb"] or 0)
    mc = int(min_count)
    bi = bi_all.map_batches(
        lambda b: (b.filter(pc.greater_equal(b.column("c"), mc))
                   .rename_columns(["w1", "w2", "c12"])),
        batch_format="pyarrow")

    def uni_as(key: str, cname: str):
        return counts.filter(expr="w2 == ''").map_batches(
            lambda b: b.select(["w1", "c"]).rename_columns([key, cname]),
            batch_format="pyarrow")

    if vocab <= _PMI_BROADCAST_VOCAB_MAX:
        import ray

        uni = _collect(counts.filter(expr="w2 == ''"),
                       pa.schema([("w1", pa.string()),
                                  ("w2", pa.string()),
                                  ("c", pa.int64())])).select(["w1", "c"])
        ref = ray.put(uni)

        def attach(b: pa.Table) -> pa.Table:
            u = ray.get(ref)  # zero-copy plasma read per task
            b = b.join(u.rename_columns(["w1", "c1"]), keys="w1")
            return b.join(u.rename_columns(["w2", "c2"]), keys="w2")

        j = bi.map_batches(attach, batch_format="pyarrow")
    else:
        j = bucketed_hash_join(bi, uni_as("w1", "c1"), on="w1")
        j = bucketed_hash_join(j, uni_as("w2", "c2"), on="w2")
    n_f, nb_f = float(n_tokens), float(nb)

    def score(b: pa.Table) -> pa.Table:
        c12 = b.column("c12").to_numpy(zero_copy_only=False).astype(
            np.float64)
        c1 = b.column("c1").to_numpy(zero_copy_only=False).astype(
            np.float64)
        c2 = b.column("c2").to_numpy(zero_copy_only=False).astype(
            np.float64)
        # left-associated exactly as the SQL text evaluates it
        pmi = np.round(np.log((c12 * n_f * n_f) / (nb_f * c1 * c2)), 6)
        return b.select(["w1", "w2", "c12", "c1", "c2"]).append_column(
            "pmi", pa.array(pmi, type=pa.float64()))

    return j.map_batches(score, batch_format="pyarrow")


def pmi_collocations_sql(table: str = "documents",
                         text_col: str = "text",
                         min_count: int = 5) -> str:
    """DuckDB oracle for :func:`pmi_collocations` — same \\S+ token
    convention as the LM oracles, same left-associated double PMI
    expression."""
    return (
        "WITH t AS (SELECT doc_id, "
        f"regexp_split_to_array(trim({text_col}), '\\s+') AS toks "
        f"FROM {table} WHERE trim({text_col}) <> ''), "
        "e AS (SELECT doc_id, unnest(generate_series(1, len(toks))) "
        "AS pos, toks FROM t), "
        "w AS (SELECT doc_id, pos, toks[pos] AS tok, "
        "CASE WHEN pos > 1 THEN toks[pos - 1] END AS prev FROM e), "
        "uc AS (SELECT tok AS w, COUNT(*) AS c FROM w GROUP BY tok), "
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM w), "
        "bc AS (SELECT prev AS w1, tok AS w2, COUNT(*) AS c FROM w "
        "WHERE prev IS NOT NULL GROUP BY prev, tok), "
        "nb AS (SELECT CAST(SUM(c) AS DOUBLE) AS nb FROM bc) "
        "SELECT b.w1, b.w2, b.c AS c12, u1.c AS c1, u2.c AS c2, "
        "round(ln((CAST(b.c AS DOUBLE) * nn.n * nn.n) / "
        "(nb.nb * u1.c * u2.c)), 6) AS pmi "
        "FROM bc b CROSS JOIN nn CROSS JOIN nb "
        "JOIN uc u1 ON u1.w = b.w1 JOIN uc u2 ON u2.w = b.w2 "
        f"WHERE b.c >= {int(min_count)}")
