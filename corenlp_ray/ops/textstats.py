"""Text-analysis operators over a document table: token counting, quality
scoring, language ID, document fingerprinting.

Every operator here is a vectorizable ``map_batches`` transform (or a
two-phase aggregate) over ``documents(doc_id, text, lang, source,
n_chars)``-shaped tables. The SQL-oracle contract (driver correctness
gate): each function's docstring pins the exact semantics so the DuckDB
oracle in ``__ray_entry__.oracle_sql`` computes the identical values —
identical splitting regexes, identical tie-breaks, integer arithmetic
where possible.
"""
from __future__ import annotations

import hashlib
import re
from typing import Dict

import numpy as np
import pyarrow as pa

from corenlp_ray.functions.lexicon import EN_STOPWORDS

_WS_RE = re.compile(r"\s+")
_NON_ALPHA_RE = re.compile(r"[^a-z]+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_DIGIT_RE = re.compile(r"[0-9]")

# small per-language stopword sets for the n-gram/stopword language-ID
# heuristic (deterministic; no model download)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "des", "une", "dans"},
    "es": {"el", "la", "los", "las", "es", "y", "en", "por", "para", "una"},
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """+ n_tokens: whitespace token count; 0 for blank/empty text.

    Oracle: CASE WHEN trim(text)='' THEN 0 ELSE
    len(regexp_split_to_array(trim(text), '\\s+')) END."""
    out = []
    for t in batch.column("text").to_pylist():
        t = (t or "").strip()
        out.append(0 if not t else len(_WS_RE.split(t)))
    return batch.append_column("n_tokens", pa.array(out, type=pa.int64()))


# GPT-2-style pre-tokenization pattern (the public BPE split regex shape:
# contractions | letter runs | number runs | punct runs | whitespace).
# Deliberately lookahead-free so the identical pattern runs under both
# Python `re` and DuckDB's RE2 — the DuckDB oracle counts matches with
# regexp_extract_all(text, BPE_PATTERN) and must agree exactly.
BPE_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d"
               r"| ?[A-Za-zÀ-ɏ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ɏ0-9]+|\s+")
_BPE_RE = re.compile(BPE_PATTERN)


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """+ n_bpe_tokens: BPE-pre-tokenizer piece count — the standard
    LLM-training-cost estimator (each regex piece splits further into
    subwords in a real BPE, so this is a stable lower bound; ~1.3× is
    the usual byte-level calibration).

    Oracle: len(regexp_extract_all(text, BPE_PATTERN))."""
    out = [len(_BPE_RE.findall(t or ""))
           for t in batch.column("text").to_pylist()]
    return batch.append_column("n_bpe_tokens",
                               pa.array(out, type=pa.int64()))


def quality_batch(batch: pa.Table) -> pa.Table:
    """+ quality columns (all derivable in SQL with the same regexes):
      n_alpha  — count of [A-Za-z] chars
      n_digit  — count of [0-9] chars
      alpha_ratio = n_alpha / max(n_chars_actual, 1)  (float64)
      mean_token_len = n_chars_of_tokens / n_tokens   (float64, 0 if none)
    """
    n_alpha, n_digit, alpha_ratio, mean_tok = [], [], [], []
    for t in batch.column("text").to_pylist():
        t = t or ""
        a = len(_ALPHA_RE.findall(t))
        d = len(_DIGIT_RE.findall(t))
        n_alpha.append(a)
        n_digit.append(d)
        alpha_ratio.append(a / max(len(t), 1))
        st = t.strip()
        toks = _WS_RE.split(st) if st else []
        mean_tok.append(sum(len(x) for x in toks) / len(toks) if toks else 0.0)
    return (batch
            .append_column("n_alpha", pa.array(n_alpha, type=pa.int64()))
            .append_column("n_digit", pa.array(n_digit, type=pa.int64()))
            .append_column("alpha_ratio", pa.array(alpha_ratio, type=pa.float64()))
            .append_column("mean_token_len", pa.array(mean_tok, type=pa.float64())))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """+ text_hash: md5 hex of the exact text (the exact-dedup key).
    Oracle: md5(text)."""
    out = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
           for t in batch.column(text_col).to_pylist()]
    return batch.append_column("text_hash", pa.array(out, type=pa.string()))


def langid_batch(batch: pa.Table) -> pa.Table:
    """+ lang_pred: stopword-marker language ID (en/de/fr/es/unk).

    Deterministic scoring: count marker hits per language over lowercase
    [^a-z]+-split tokens; best count wins, ties broken by language code
    order; <2 hits → 'unk'. (Rows-only oracle: heuristic, not SQL.)"""
    out = []
    for t in batch.column("text").to_pylist():
        toks = [x for x in _NON_ALPHA_RE.split((t or "").lower()) if x]
        best_lang, best_n = "unk", 1
        for lang in sorted(_LANG_MARKERS):
            n = sum(1 for x in toks if x in _LANG_MARKERS[lang])
            if n > best_n:
                best_lang, best_n = lang, n
        out.append(best_lang)
    return batch.append_column("lang_pred", pa.array(out, type=pa.string()))


def rolling_fingerprints_batch(batch: pa.Table, window: int = 8,
                               base: int = 257, mod: int = (1 << 61) - 1) -> pa.Table:
    """+ fp_min/fp_max: min/max of rolling polynomial hashes over byte
    windows — the winnowing-style document fingerprint. Deterministic
    integer arithmetic (rows-only oracle)."""
    mins, maxs = [], []
    for t in batch.column("text").to_pylist():
        bs = (t or "").encode("utf-8")
        if len(bs) < window:
            h = 0
            for c in bs:
                h = (h * base + c) % mod
            mins.append(h)
            maxs.append(h)
            continue
        h = 0
        pw = pow(base, window - 1, mod)
        lo = hi = None
        for i, c in enumerate(bs):
            h = (h * base + c) % mod
            if i >= window:
                h = (h - bs[i - window] * pw * base) % mod
            if i >= window - 1:
                lo = h if lo is None else min(lo, h)
                hi = h if hi is None else max(hi, h)
        mins.append(lo)
        maxs.append(hi)
    return (batch
            .append_column("fp_min", pa.array(mins, type=pa.int64()))
            .append_column("fp_max", pa.array(maxs, type=pa.int64())))


def _token_partial_counts(batch: pa.Table) -> pa.Table:
    """Phase-1 combiner for corpus token frequencies: batch → ≤1 row per
    token (lowercase, [^a-z]+ split, non-empty)."""
    counts: Dict[str, int] = {}
    for t in batch.column("text").to_pylist():
        for tok in _NON_ALPHA_RE.split((t or "").lower()):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    return pa.Table.from_pydict(
        {"token": list(counts.keys()),
         "n": list(counts.values())},
        schema=pa.schema([("token", pa.string()), ("n", pa.int64())]))


def top_tokens(docs_ds, k: int = 100):
    """Corpus top-k token frequencies: two-phase count (per-batch combiner
    → groupby sum) → sort (n desc, token asc) → limit k.

    Oracle: unnest + GROUP BY + ORDER BY count DESC, token ASC LIMIT k."""
    from ray.data.aggregate import Sum

    partial = docs_ds.map_batches(_token_partial_counts,
                                  batch_format="pyarrow")
    totals = partial.groupby("token").aggregate(Sum("n", alias_name="cnt"))
    return totals.sort(["cnt", "token"], descending=[True, False]).limit(k)


def stopword_ratio_batch(batch: pa.Table) -> pa.Table:
    """+ stop_ratio: EN-stopword fraction of lowercase alpha tokens
    (float64; 0.0 when no tokens)."""
    out = []
    for t in batch.column("text").to_pylist():
        toks = [x for x in _NON_ALPHA_RE.split((t or "").lower()) if x]
        out.append(sum(1 for x in toks if x in EN_STOPWORDS) / len(toks)
                   if toks else 0.0)
    return batch.append_column("stop_ratio",
                               pa.array(out, type=pa.float64()))


def grouped_top_k(ds, key: str, order_col: str, k: int = 3):
    """Per-key top-k (largest ``order_col`` per ``key``, ties broken by
    the smallest doc_id) — the scale shape is a per-batch LOCAL top-k
    (bounded heap per key) before one groupby, so the shuffle carries at
    most k rows per (key, batch), never the full table."""
    import pandas as pd

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.sort_values([order_col, "doc_id"],
                                  ascending=[False, True])
                .groupby(key, sort=False).head(k))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return (group.sort_values([order_col, "doc_id"],
                                  ascending=[False, True]).head(k))

    partial = ds.map_batches(local_topk, batch_format="pandas")
    return partial.groupby(key).map_groups(merge, batch_format="pandas")


def inverted_index(docs_ds, min_df: int = 2, max_postings: int = 32):
    """Distributed inverted-index construction — the web-corpus search /
    retrieval primitive: token → (exact document frequency, the first
    ``max_postings`` doc_ids ascending as a comma-joined postings
    string). Token convention matches ``top_tokens``: non-empty runs of
    [a-z] in the lowercased text, DISTINCT per document.

    Scale shape: the per-batch kernel reduces each batch to thin
    DISTINCT (token, doc_id) pairs in one vectorized polars pass, so
    the single all-to-all (groupby token) never carries text. The
    postings cap is part of the CONTRACT, not a silent drop — ``df``
    stays exact for every term, and min-doc_id-first truncation is
    deterministic (at 10^12 docs a stopword's full postings list is
    petabyte-shaped; exact df + bounded postings is the classic
    index-shard layout). ``min_df`` prunes hapax noise after the
    aggregate.

    Oracle: unnest(regexp_split_to_array(lower(text), '[^a-z]+')) pairs
    → count(*) + array_to_string(list(doc_id ORDER BY doc_id)[1:N])."""
    import polars as pl

    def pairs(batch: pa.Table) -> pa.Table:
        df = pl.DataFrame({
            "doc_id": batch.column("doc_id").to_numpy(
                zero_copy_only=False),
            "text": batch.column("text").to_pylist()})
        out = (df.with_columns(
                   pl.col("text").str.to_lowercase()
                   .str.extract_all(r"[a-z]+").alias("token"))
               .drop("text").explode("token")
               .drop_nulls("token").unique(["token", "doc_id"]))
        return out.select(["token", "doc_id"]).to_arrow()

    thin = docs_ds.map_batches(pairs, batch_format="pyarrow")

    def build(part) -> "pd.DataFrame":
        import pandas as pd

        part = part.sort_values(["token", "doc_id"])
        g = part.groupby("token", sort=False)["doc_id"]
        out = pd.DataFrame({
            "token": g.size().index,
            "df": g.size().astype("int64").values,
            "postings": g.agg(lambda s: ",".join(
                map(str, s.iloc[:max_postings]))).values,
        })
        return out[out["df"] >= min_df].reset_index(drop=True)

    from corenlp_ray.ops.dedup import partitioned_group_apply

    return partitioned_group_apply(thin, ["token"], build,
                                   inner_is_partition=True)


def winnow_fingerprints(docs_ds, k: int = 4, w: int = 5):
    """Robust winnowing (Schleimer-Wilkerson-Aiken 2003, the MOSS
    local fingerprinting scheme) — upgrade of the min/max rolling
    fingerprint to the real selection rule: hash every k-token gram,
    slide a w-hash window, keep each window's MINIMUM hash (rightmost
    position on ties — "robust" winnowing), emit the DISTINCT selected
    (doc_id, pos, fp) rows. Guarantees: any shared substring of
    ≥ w+k-1 tokens yields a shared fingerprint (no false negatives for
    long matches), expected density 2/(w+1).

    Scale shape: embarrassingly parallel per batch — numpy sliding-
    window minimum over a composite (hash << 20 | reversed-pos) key
    (docs are bounded at 2^20 = 1M grams; split longer upstream), no
    shuffle at all; downstream joins on fp reuse the bucketed-join
    family. The gram hash is the md5-derived u64's high 32 bits so the
    DuckDB oracle re-derives every selected fingerprint exactly
    (ops/sketches.md5_u64_sql — the documented SQL-parity hash)."""
    from numpy.lib.stride_tricks import sliding_window_view

    from corenlp_ray.ops.sketches import md5_u64

    POS_BITS = 20

    def per_batch(batch: pa.Table) -> pa.Table:
        d_out, p_out, f_out = [], [], []
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        for doc_id, t in zip(ids, batch.column("text").to_pylist()):
            toks = [x for x in _WS_RE.split((t or "").lower()) if x]
            ng = len(toks) - k + 1
            if ng <= 0:
                continue
            grams = [" ".join(toks[i:i + k]) for i in range(ng)]
            h32 = (md5_u64(grams) >> np.uint64(32)).astype(np.int64)
            if ng > (1 << POS_BITS):
                raise ValueError(
                    f"doc {doc_id}: {ng} grams exceeds the 2^{POS_BITS}"
                    " winnowing bound — split the document upstream")
            pos = np.arange(ng, dtype=np.int64)
            key = (h32 << POS_BITS) | ((1 << POS_BITS) - 1 - pos)
            if ng <= w:
                sel = np.array([key.min()])
            else:
                sel = sliding_window_view(key, w).min(axis=1)
            sel = np.unique(sel)
            f = sel >> POS_BITS
            p = (1 << POS_BITS) - 1 - (sel & ((1 << POS_BITS) - 1))
            d_out.append(np.full(len(sel), doc_id, dtype=np.int64))
            p_out.append(p)
            f_out.append(f)
        if not d_out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(d_out), pa.int64()),
            "pos": pa.array(np.concatenate(p_out), pa.int64()),
            "fp": pa.array(np.concatenate(f_out), pa.int64())})

    return docs_ds.map_batches(per_batch, batch_format="pyarrow")


def winnow_fingerprints_sql(table: str, k: int = 4, w: int = 5) -> str:
    """DuckDB mirror of :func:`winnow_fingerprints`: same grams, same
    md5-u64-high-32 hash, same min-with-rightmost-tie window rule."""
    from corenlp_ray.ops.sketches import md5_u64_sql

    h = md5_u64_sql("g")
    return (
        "WITH toks AS (SELECT doc_id, list_filter("
        r"regexp_split_to_array(lower(text), '\s+'), x -> x != '') AS t "
        f"FROM {table}), "
        "grams AS (SELECT doc_id, i - 1 AS pos, "
        f"array_to_string(t[i:i+{k - 1}], ' ') AS g, "
        f"len(t) - {k} + 1 AS ng "
        "FROM (SELECT doc_id, t, unnest(generate_series(1, "
        f"len(t) - {k} + 1)) AS i FROM toks WHERE len(t) >= {k})), "
        f"h AS (SELECT doc_id, pos, ng, CAST({h} // 4294967296 "
        "AS BIGINT) AS h32 FROM grams), "
        "wins AS (SELECT doc_id, unnest(generate_series(0, "
        f"GREATEST(ng - {w}, 0))) AS win FROM "
        "(SELECT DISTINCT doc_id, ng FROM h)), "
        "sel AS (SELECT h.doc_id, h.pos, h.h32, row_number() OVER ("
        "PARTITION BY h.doc_id, wins.win "
        "ORDER BY h.h32 ASC, h.pos DESC) AS rn "
        "FROM wins JOIN h ON h.doc_id = wins.doc_id "
        f"AND h.pos BETWEEN wins.win AND wins.win + {w} - 1) "
        "SELECT DISTINCT doc_id, pos, h32 AS fp FROM sel WHERE rn = 1")
