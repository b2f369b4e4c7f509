"""Classifier-based document quality scoring — the "quality classifier"
slot of web-corpus pipelines (GPT-3 appendix A quality filter, CCNet's
target-domain classifier, DataComp-LM's fasttext filter). CoreNLP has no
analogue; this is a first-class training-data op alongside the LM
perplexity (ops/lm.py) and DSIR (ops/dsir.py) scorers.

No trained weights ship (the same licensed-data stance as models/): the
default model is a DETERMINISTIC hashed-linear stand-in — vocabulary =
top-k corpus tokens ranked (count DESC, token ASC) by the existing
two-phase ``top_tokens`` count, weight(rank) = mix32(rank) mapped to
integer thousandths in [-1, 1] — so the full pipeline (distributed vocab
build → one ``ray.put`` broadcast → vectorized per-batch scoring) is
real and a DuckDB oracle re-derives every score bit-for-bit. Swap
``weights`` for a real trained linear model without touching the
plumbing.

Numeric design for oracle-exactness: per-token weights are INTEGERS
(thousandths), so each document's ``quality_units`` is an exact int64
sum regardless of accumulation order; ``quality_score`` is ONE float
division units / (1000 * n_tokens) (bit-identical in IEEE 754 on both
sides); ``keep`` is an integer comparison (units > 0), never a float
threshold.

Scale: the vocab table is k rows (the broadcast side, shipped once via
``ray.put`` and cached per worker); each batch scores through one polars
explode + join — the corpus itself never shuffles.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa

from corenlp_ray.ops.sampling import mix32
from corenlp_ray.ops.textstats import top_tokens

_UNITS = 1000       # weights are integer thousandths: exact int sums
OOV_UNITS = -250    # out-of-vocabulary token weight (-0.25)
VOCAB_K = 512
WEIGHT_SEED = 7


def hash_weight_units(ranks: np.ndarray, seed: int = WEIGHT_SEED
                      ) -> np.ndarray:
    """1-based vocab rank → integer weight units in [-1000, 1000]:
    mix32(rank, seed) % 2001 - 1000. Deterministic stand-in for trained
    classifier weights; reproducible in DuckDB via ``mix32_sql``."""
    span = np.uint64(2 * _UNITS + 1)
    return (mix32(np.asarray(ranks, dtype=np.int64), seed=seed)
            % span).astype(np.int64) - _UNITS


def build_vocab_weights(docs_ds, k: int = VOCAB_K,
                        seed: int = WEIGHT_SEED) -> Dict[str, int]:
    """Top-k corpus vocabulary → {token: weight_units}.

    Distributed two-phase count (``top_tokens``: per-batch combiner →
    one small groupby → sort on the k-row result); only the k-row vocab
    ever reaches the driver. In production the dict comes from a trained
    model file instead."""
    rows = top_tokens(docs_ds, k=k).take_all()
    units = hash_weight_units(np.arange(1, len(rows) + 1), seed=seed)
    return {r["token"]: int(u) for r, u in zip(rows, units)}


def score_quality(docs_ds, weights: Dict[str, int],
                  oov_units: int = OOV_UNITS):
    """+ n_tokens, n_oov, quality_units (int64), quality_score
    (float64; 0.0 for empty docs), keep (bool: quality_units > 0).

    Tokenization matches the corpus-count side exactly (lowercase,
    split on ``[^a-z]+``, drop empties). Broadcast-probe regime: the
    weight dict rides the object store once and is cached per worker;
    scoring is one polars explode + left join per batch."""
    import ray

    ref = ray.put(weights)

    def _score(batch: pa.Table) -> pa.Table:
        import polars as pl

        if "w" not in _score_cache:
            w = ray.get(ref)
            _score_cache["w"] = pl.DataFrame(
                {"tok": list(w.keys()),
                 "w": np.fromiter(w.values(), dtype=np.int64,
                                  count=len(w))})
        wdf = _score_cache["w"]

        n = batch.num_rows
        df = (pl.DataFrame(
            {"_row": np.arange(n, dtype=np.int64),
             "text": batch.column("text").to_pylist()})
            .with_columns(pl.col("text").str.to_lowercase()
                          .str.replace_all(r"[^a-z]+", " ")
                          .str.split(" ")
                          .list.filter(pl.element() != "")
                          .alias("tok"))
            .select("_row", "tok").explode("tok"))
        agg = (df.join(wdf, on="tok", how="left")
               .group_by("_row")
               .agg(pl.col("tok").is_not_null().sum()
                    .cast(pl.Int64).alias("n_tokens"),
                    (pl.col("tok").is_not_null()
                     & pl.col("w").is_null()).sum()
                    .cast(pl.Int64).alias("n_oov"),
                    pl.when(pl.col("tok").is_not_null())
                    .then(pl.col("w").fill_null(oov_units))
                    .otherwise(0)
                    .sum().cast(pl.Int64).alias("quality_units")))
        # empty docs survive the explode as a single null-token row, so
        # every _row is present; sort back to batch order
        agg = agg.sort("_row")
        units = agg["quality_units"].to_numpy()
        ntok = agg["n_tokens"].to_numpy()
        score = np.where(ntok > 0,
                         units / (float(_UNITS) * np.maximum(ntok, 1)),
                         0.0)
        return (batch
                .append_column("n_tokens",
                               pa.array(ntok, type=pa.int64()))
                .append_column("n_oov",
                               pa.array(agg["n_oov"].to_numpy(),
                                        type=pa.int64()))
                .append_column("quality_units",
                               pa.array(units, type=pa.int64()))
                .append_column("quality_score",
                               pa.array(score, type=pa.float64()))
                .append_column("keep", pa.array(units > 0)))

    _score_cache: dict = {}  # per-worker deserialized-weights cache
    return docs_ds.map_batches(_score, batch_format="pyarrow")


def classify_quality(docs_ds, k: int = VOCAB_K, seed: int = WEIGHT_SEED,
                     oov_units: int = OOV_UNITS):
    """Vocab build + scoring in one call (the ``queries()`` surface)."""
    return score_quality(docs_ds, build_vocab_weights(docs_ds, k=k,
                                                      seed=seed),
                         oov_units=oov_units)
