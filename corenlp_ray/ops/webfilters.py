"""Web-corpus hygiene operators: PII detection/redaction, Gopher-style
repetition statistics, and benchmark decontamination.

These are the training-data-pipeline stages a 100-TB webtext run needs in
front of model training (public recipes: C4 cleaning — Raffel et al. 2020
§2.2; repetition rules — Rae et al. 2021 Gopher §A1.1; n-gram
decontamination — Brown et al. 2020 GPT-3 appendix C). None has a CoreNLP
analogue; they extend the engine's ``ops`` family the same way dedup/ANN
do.

Scale notes (100 TB):
  * The PII kernels run entirely inside Arrow's RE2 engine
    (``count_substring_regex`` / ``replace_substring_regex``) — zero
    Python per-row work, and the DuckDB oracle (also RE2) checks the
    same declared pattern on independently-synthesized text.
  * Repetition stats are polars list/group kernels per batch — no
    shuffle; each doc is scored locally.
  * Decontamination is the broadcast-small-side pattern: the benchmark
    n-gram set is built distributed, collected once (it is ~1/97th of
    the corpus by construction and a fixed benchmark in production),
    ``ray.put`` once, and probed per batch with a vectorized
    ``np.isin`` over hashed shingles. Above ``_BENCH_BROADCAST_MAX``
    entries the probe must switch to a bucketed semi-join on shingle
    hash (same layout as ``ops.dedup.ngram_jaccard_pairs``); the
    broadcast regime covers every published benchmark suite (~1e6
    n-grams ≪ the 50M cap).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns (no lookahead/backrefs) so the identical string runs
# under Arrow, DuckDB and Python `re`. Kept deliberately conservative —
# the point is deterministic, oracle-checkable semantics, not maximal
# recall; swap the table for a jurisdiction-specific bank in production.
PII_PATTERNS = [
    # (name, pattern, replacement)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_batch(batch: pa.Table, text_col: str = "text",
              redact: bool = True) -> pa.Table:
    """+ n_emails, n_phones, n_ips (int64) and, with ``redact``,
    ``text_redacted`` + ``redacted_len``.

    Counts first, then replaces in PII_PATTERNS order (emails before
    phones before IPs, so an address inside an email's domain is counted
    once as an email — RE2 leftmost-longest within each pass). Oracle:
    len(regexp_extract_all(text, pat)) and
    length(regexp_replace(..., 'g')) chained in the same order.
    """
    text = batch.column(text_col)
    out = batch
    for name, pat, _ in PII_PATTERNS:
        out = out.append_column(
            f"n_{name}s", pc.count_substring_regex(text, pat).cast(
                pa.int64()))
    if redact:
        red = text
        for _, pat, repl in PII_PATTERNS:
            red = pc.replace_substring_regex(red, pat, repl)
        out = out.append_column("text_redacted", red)
        out = out.append_column(
            "redacted_len", pc.utf8_length(red).cast(pa.int64()))
    return out


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """+ n_lines, dup_line_frac, dup_para_frac, top_bigram_frac
    (Gopher §A1.1 repetition signals).

    * lines = split on '\\n'; paragraphs = split on '\\n\\n' (no
      trimming — the oracle uses the same raw split).
    * dup_X_frac = 1 - distinct/total over the split (0.0 when total
      is 0 or 1 — a single line is never "duplicated").
    * top_bigram_frac = occurrences of the modal whitespace-token
      bigram / total bigram count (0.0 when < 2 tokens). Ties break to
      the same value either way (fraction of the max count).

    All columns are float64 except n_lines (int64). Vectorized in
    polars: one explode + group_by over the batch for the bigram stat,
    list kernels for the line/paragraph stats — no per-row Python.
    """
    import polars as pl

    df = pl.from_arrow(batch.select([text_col])).with_row_index("_row")

    def _dup_frac(expr: pl.Expr) -> pl.Expr:
        n = expr.list.len()
        return (pl.when(n > 1)
                .then(1.0 - expr.list.n_unique() / n)
                .otherwise(0.0))

    lines = pl.col(text_col).str.split("\n")
    paras = pl.col(text_col).str.split("\n\n")
    stats = df.select(
        pl.col("_row"),
        lines.list.len().cast(pl.Int64).alias("n_lines"),
        _dup_frac(lines).alias("dup_line_frac"),
        _dup_frac(paras).alias("dup_para_frac"),
    )

    toks = (df.select(pl.col("_row"),
                      pl.col(text_col).str.strip_chars()
                      .str.replace_all(r"\s+", " ")
                      .str.split(" ").alias("t"))
            .explode("t")
            .filter(pl.col("t") != ""))
    big = (toks.with_columns(
        (pl.col("t") + " " + pl.col("t").shift(-1).over("_row"))
        .alias("bg"))
        .drop_nulls("bg")
        .group_by("_row", "bg").len()
        .group_by("_row")
        .agg((pl.col("len").max() / pl.col("len").sum())
             .alias("top_bigram_frac")))
    stats = (stats.join(big, on="_row", how="left")
             .with_columns(pl.col("top_bigram_frac").fill_null(0.0))
             .sort("_row").drop("_row"))
    out = batch
    for name in ("n_lines", "dup_line_frac", "dup_para_frac",
                 "top_bigram_frac"):
        out = out.append_column(name, pa.array(stats[name].to_list()))
    return out


# Above this many benchmark n-grams the broadcast probe must become a
# bucketed semi-join on shingle hash (ops/dedup.py's ngram layout); all
# real benchmark suites are far below it.
_BENCH_BROADCAST_MAX = 50_000_000

DECONTAM_NGRAM = 8  # GPT-3 appendix C uses 13-grams; 8 suits short docs


def _shingle_hashes(texts: list, n: int) -> list:
    """Per-doc list of uint64 hashes of lowercased n-token shingles."""
    import polars as pl

    df = (pl.DataFrame({"_row": np.arange(len(texts)), "text": texts})
          .with_columns(pl.col("text").str.to_lowercase()
                        .str.strip_chars()
                        .str.replace_all(r"\s+", " ").str.split(" ")
                        .list.filter(pl.element() != "").alias("t")))
    toks = df.select("_row", "t").explode("t")
    parts = [toks.select(
        pl.col("_row"),
        pl.col("t").shift(-k).over("_row").alias(f"w{k}"))
        for k in range(n)]
    sh = parts[0]
    for p in parts[1:]:
        sh = sh.with_columns(p[p.columns[-1]])
    sh = (sh.drop_nulls()
          .with_columns(pl.concat_str([pl.col(f"w{k}") for k in range(n)],
                                      separator=" ").hash(seed=0)
                        .alias("h"))
          .group_by("_row", maintain_order=True).agg(pl.col("h")))
    # docs with < n tokens drop out of the explode→group; restore empties
    have = dict(zip(sh["_row"].to_list(), sh["h"].to_list()))
    return [have.get(i, []) for i in range(len(texts))]


def benchmark_ngrams(docs_ds, every: int = 97,
                     n: int = DECONTAM_NGRAM) -> np.ndarray:
    """Distributed build of the benchmark n-gram hash set: docs with
    doc_id % every == 0 contribute the hash of their first n lowercased
    whitespace tokens. Returns the (small) sorted uint64 array — this is
    the side you'd ``ray.put`` once; in production it comes from the
    benchmark files themselves, not the corpus."""
    def first_ngram(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        hs = []
        for per_doc in _shingle_hashes(texts, n):
            if len(per_doc):
                hs.append(per_doc[0])
        return pa.Table.from_pydict(
            {"h": pa.array(hs, type=pa.uint64())})

    def keep_bench(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % every == 0))

    small = (docs_ds
             .map_batches(keep_bench, batch_format="pyarrow")
             .map_batches(first_ngram, batch_format="pyarrow"))
    hashes = np.concatenate(
        [b.column("h").to_numpy(zero_copy_only=False)
         for b in small.iter_batches(batch_format="pyarrow")] or
        [np.array([], dtype=np.uint64)])
    if hashes.size > _BENCH_BROADCAST_MAX:
        raise ValueError(
            f"benchmark set {hashes.size} exceeds broadcast cap "
            f"{_BENCH_BROADCAST_MAX}; use the bucketed semi-join path")
    return np.unique(hashes)


def decontaminate(docs_ds, bench_hashes=None, every: int = 97,
                  n: int = DECONTAM_NGRAM):
    """+ contaminated (bool): any n-token shingle of the doc appears in
    the benchmark set. Broadcast-probe regime: the bench array rides the
    object store once (``ray.put``) and each batch probes it with one
    ``np.isin`` over its exploded shingle hashes."""
    import ray

    if bench_hashes is None:
        bench_hashes = benchmark_ngrams(docs_ds, every=every, n=n)
    bench_ref = ray.put(np.asarray(bench_hashes, dtype=np.uint64))

    def probe(b: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        texts = b.column("text").to_pylist()
        per_doc = _shingle_hashes(texts, n)
        lens = np.array([len(h) for h in per_doc])
        flat = (np.concatenate([np.asarray(h, dtype=np.uint64)
                                for h in per_doc if len(h)])
                if lens.sum() else np.array([], dtype=np.uint64))
        hit = np.isin(flat, bench)
        # segment-any over the ragged layout
        seg = np.zeros(len(per_doc), dtype=bool)
        idx = np.repeat(np.arange(len(per_doc)), lens)
        np.logical_or.at(seg, idx[hit], True)
        return b.append_column("contaminated", pa.array(seg))

    return docs_ds.map_batches(probe, batch_format="pyarrow")


# C4 line-level cleaning (Raffel et al. 2020 §2.2, public recipe):
# keep lines that end in terminal punctuation AND have >= 3 words AND
# don't mention javascript; drop whole pages that contain '{' or
# 'lorem ipsum' or keep fewer than _C4_MIN_LINES cleaned lines.
_C4_TERMINAL = (".", "!", "?", '"')
_C4_MIN_WORDS = 3
_C4_MIN_LINES = 3


def c4_clean_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """+ text_clean (kept lines re-joined with '\\n'), n_lines_kept
    (int64), page_keep (bool).

    Line keep rule: after strip, ends with . ! ? or \" AND has >=
    _C4_MIN_WORDS whitespace words AND no 'javascript'
    (case-insensitive). Page keep rule: >= _C4_MIN_LINES kept lines AND
    the raw text contains neither '{' nor 'lorem ipsum'
    (case-insensitive). Vectorized: one explode + filter + group_by per
    batch in polars; no per-row Python.
    """
    import polars as pl

    df = (pl.from_arrow(batch.select([text_col]))
          .with_row_index("_row"))
    lines = (df.select("_row", pl.col(text_col).str.split("\n")
                       .alias("ln"))
             .explode("ln")
             .with_columns(pl.col("ln").str.strip_chars().alias("s")))
    kept = lines.filter(
        pl.col("s").str.contains(r"[.!?\"]$")
        & (pl.col("s").str.count_matches(r"\S+") >= _C4_MIN_WORDS)
        & ~pl.col("s").str.to_lowercase().str.contains("javascript",
                                                       literal=True))
    agg = (kept.group_by("_row")
           .agg(pl.col("s").alias("kept"),
                pl.len().cast(pl.Int64).alias("n_lines_kept")))
    out = (df.join(agg, on="_row", how="left")
           .with_columns(
               pl.col("kept").list.join("\n").fill_null("")
               .alias("text_clean"),
               pl.col("n_lines_kept").fill_null(0),
               (~pl.col(text_col).str.contains("{", literal=True)
                & ~pl.col(text_col).str.to_lowercase()
                .str.contains("lorem ipsum", literal=True))
               .alias("_page_ok"))
           .with_columns(((pl.col("n_lines_kept") >= _C4_MIN_LINES)
                          & pl.col("_page_ok")).alias("page_keep"))
           .sort("_row"))
    res = batch
    for name, typ in (("text_clean", pa.string()),
                      ("n_lines_kept", pa.int64()),
                      ("page_keep", pa.bool_())):
        res = res.append_column(name, pa.array(out[name].to_list(),
                                               type=typ))
    return res


# Gopher quality gates (Rae et al. 2021 appendix A1.1, public recipe).
# Every threshold is evaluated in INTEGER arithmetic (10*symbols <
# n_words etc.) so the SQL oracle is bit-exact — no float boundaries.
_GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_MIN_WORDS = 50
_GOPHER_MAX_WORDS = 100_000


def gopher_rules_batch(batch: pa.Table, text_col: str = "text",
                       min_words: int = _GOPHER_MIN_WORDS,
                       max_words: int = _GOPHER_MAX_WORDS) -> pa.Table:
    """+ n_words, n_lines, n_symbols (``#`` chars + non-overlapping
    ``...``), n_bullet_lines, n_ellipsis_lines, n_alpha_words,
    n_stop_hits (DISTINCT stopwords present), gopher_keep (bool AND of
    the seven published gates):

    1. min_words <= n_words <= max_words
    2. mean word length in [3, 10]   (3*n <= total_chars <= 10*n)
    3. symbol-to-word ratio < 0.1    (10*n_symbols < n_words)
    4. bullet-start lines < 90%      (10*n_bullet < 9*n_lines)
    5. ellipsis-end lines < 30%      (10*n_ellipsis < 3*n_lines)
    6. >= 80% words contain an alpha (5*n_alpha_words >= 4*n_words)
    7. >= 2 distinct Gopher stopwords present

    One polars pipeline per batch (explode + boolean sums); no per-row
    Python."""
    import polars as pl

    df = (pl.DataFrame({"text": batch.column(text_col).to_pylist()})
          .with_row_index("_row"))
    toks = (df.select("_row",
                      pl.col("text").str.strip_chars()
                      .str.replace_all(r"\s+", " ").str.split(" ")
                      .alias("t"))
            .explode("t").filter(pl.col("t") != ""))
    tstats = (toks.group_by("_row")
              .agg(pl.len().cast(pl.Int64).alias("n_words"),
                   pl.col("t").str.len_chars().sum().cast(pl.Int64)
                   .alias("total_chars"),
                   pl.col("t").str.contains("[A-Za-z]").sum()
                   .cast(pl.Int64).alias("n_alpha_words"),
                   pl.col("t").str.to_lowercase()
                   .filter(pl.col("t").str.to_lowercase()
                           .is_in(list(_GOPHER_STOPS)))
                   .n_unique().cast(pl.Int64).alias("n_stop_hits")))
    lines = (df.select("_row", pl.col("text").str.split("\n")
                       .alias("ln")).explode("ln"))
    lstats = (lines.group_by("_row")
              .agg(pl.len().cast(pl.Int64).alias("n_lines"),
                   pl.col("ln").str.contains(r"^\s*[-*•]").sum()
                   .cast(pl.Int64).alias("n_bullet_lines"),
                   pl.col("ln").str.contains(r"\.\.\.\s*$").sum()
                   .cast(pl.Int64).alias("n_ellipsis_lines")))
    sym = df.select(
        "_row",
        (pl.col("text").str.count_matches("#", literal=True)
         + pl.col("text").str.count_matches(r"\.\.\."))
        .cast(pl.Int64).alias("n_symbols"))
    out = (df.select("_row")
           .join(tstats, on="_row", how="left")
           .join(lstats, on="_row", how="left")
           .join(sym, on="_row", how="left")
           .fill_null(0).sort("_row"))
    keep = (
        (out["n_words"] >= min_words) & (out["n_words"] <= max_words)
        & (3 * out["n_words"] <= out["total_chars"])
        & (out["total_chars"] <= 10 * out["n_words"])
        & (10 * out["n_symbols"] < out["n_words"])
        & (10 * out["n_bullet_lines"] < 9 * out["n_lines"])
        & (10 * out["n_ellipsis_lines"] < 3 * out["n_lines"])
        & (5 * out["n_alpha_words"] >= 4 * out["n_words"])
        & (out["n_stop_hits"] >= 2))
    res = batch
    for name in ("n_words", "n_lines", "n_symbols", "n_bullet_lines",
                 "n_ellipsis_lines", "n_alpha_words", "n_stop_hits"):
        res = res.append_column(name, pa.array(out[name].to_list(),
                                               type=pa.int64()))
    return res.append_column("gopher_keep",
                             pa.array(keep.to_list(), type=pa.bool_()))


def unicode_clean_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """CCNet-style unicode normalization (Wenzek et al. 2020 §2: text is
    NFC-normalized before hashing/LM scoring so that visually-identical
    pages dedup together): NFC composition + whitespace collapse + trim.

    Adds ``text_clean`` (string) and ``changed`` (bool — any byte moved).

    Scale shape: embarrassingly parallel per batch, no shuffle. The
    whitespace collapse and trim run inside Arrow's RE2/utf8 kernels;
    NFC composition uses CPython's C-implemented
    ``unicodedata.normalize`` per row (pyarrow 16's ``utf8_normalize``
    is a silent no-op for composition, verified at build time —
    ``is_normalized`` short-circuits the pure-ASCII fast path so the
    per-row cost on web text is a single scan). DuckDB's
    ``nfc_normalize`` implements the same Unicode algorithm, making the
    oracle byte-exact."""
    import pyarrow.compute as pc
    from unicodedata import is_normalized, normalize

    texts = batch.column(text_col)
    nfc = pa.array(
        [t if t is None or is_normalized("NFC", t) else normalize("NFC", t)
         for t in texts.to_pylist()], type=pa.string())
    clean = pc.utf8_trim_whitespace(
        pc.replace_substring_regex(nfc, r"\s+", " "))
    return (batch.append_column("text_clean", clean)
            .append_column("changed", pc.not_equal(clean, texts)))


def unicode_clean_sql(table: str = "documents",
                      text_col: str = "text") -> str:
    """DuckDB oracle for :func:`unicode_clean_batch` (same RE2 regex
    engine, same Unicode NFC tables)."""
    clean = (f"trim(regexp_replace(nfc_normalize({text_col}), "
             "'\\s+', ' ', 'g'))")
    return (f"SELECT doc_id, {clean} AS text_clean, "
            f"{clean} != {text_col} AS changed FROM {table}")


# Demo blocklist for the C4 §2.2 word-filter gate: the op is
# LIST-DRIVEN — production runs plug in their full blocklist (e.g. the
# "List of Dirty, Naughty, Obscene..." file C4 used) as data; the repo
# ships a tiny neutral placeholder so tests and oracles stay tasteful.
DEMO_BLOCKLIST = ("damn", "hell", "crap", "sucks", "stupid", "idiot")


def blocklist_gate_batch(batch: pa.Table, lexicon=DEMO_BLOCKLIST,
                         text_col: str = "text") -> pa.Table:
    """C4-recipe blocklist gate (Raffel et al. 2020 §2.2: "removed any
    page that contained any word on the ... list"): adds
    ``n_blocked`` (count of blocklisted tokens, case-insensitive,
    token-exact — never substring, so "hello" ≠ "hell") and
    ``blocklist_keep`` (True iff zero hits).

    Scale shape: shuffle-free per-batch polars kernel — lowercase
    split on non-letters, explode-free ``list.eval`` membership sum;
    the lexicon ships inside the task closure (it is a config file of
    at most a few thousand words, not data). Oracle: unnest the same
    [^a-z]+ split in DuckDB and count list membership."""
    import polars as pl

    lex = [w.lower() for w in lexicon]
    df = pl.DataFrame({"t": [t or "" for t in
                             batch.column(text_col).to_pylist()]})
    n = df.select(pl.col("t").str.to_lowercase()
                  .str.extract_all(r"[a-z]+")
                  .list.eval(pl.element().is_in(lex))
                  .list.sum().cast(pl.Int64).alias("n"))["n"]
    n_arr = pa.array(n.to_list(), type=pa.int64())
    import pyarrow.compute as pc

    return (batch.append_column("n_blocked", n_arr)
            .append_column("blocklist_keep",
                           pc.equal(n_arr, pa.scalar(0))))


def blocklist_gate_sql(table: str = "documents",
                       lexicon=DEMO_BLOCKLIST,
                       text_col: str = "text") -> str:
    """DuckDB oracle for :func:`blocklist_gate_batch` (same [a-z]+
    token convention, same case-insensitive exact-token membership)."""
    lex = ", ".join("'" + w.lower().replace("'", "''") + "'"
                    for w in lexicon)
    return (
        "WITH toks AS (SELECT doc_id, unnest(regexp_extract_all("
        f"lower({text_col}), '[a-z]+')) AS tok FROM {table}), "
        "hits AS (SELECT doc_id, count(*) FILTER (tok IN "
        f"({lex})) AS n FROM toks GROUP BY doc_id) "
        f"SELECT d.doc_id, CAST(COALESCE(h.n, 0) AS BIGINT) AS "
        "n_blocked, COALESCE(h.n, 0) = 0 AS blocklist_keep "
        f"FROM {table} d LEFT JOIN hits h ON h.doc_id = d.doc_id")
