"""GPT-style sequence packing: map a document corpus onto fixed-length
training sequences.

Not a reference operator — this is the LLM-training-data extension
surface: after cleaning/dedup, the corpus is concatenated in a
deterministic order and cut every ``seq_len`` tokens; each document
contributes one or more (sequence, span) assignments. The output is the
*packing plan* — ``(doc_id, seq_id, tok_start, tok_end)`` with
``tok_start/tok_end`` token offsets *within the document* (end
exclusive) — which a downstream tokenizer/trainer joins back against
the text to emit tensors. Empty documents contribute nothing.

Token counts use the engine's whitespace convention
(``ops/textstats.token_count_batch``) so the DuckDB oracle
(``packing_planted``) can re-derive the plan with a window cumsum +
``generate_series``.

Distributed prefix-sum design (the only global state is ONE integer per
coarse key-group):

1. one shuffle-free pass computes per-document token counts and a
   coarse ``group = doc_id // group_size``;
2. a native hash aggregate (map-combined partials, tiny all-to-all)
   yields one ``(group, sum_tokens)`` row per group — at 10^12 docs and
   ``group_size=65536`` that is ~15M rows, still a driver-safe prefix
   sum; beyond that, apply the same two-phase trick hierarchically
   (group the groups);
3. the driver prefix-sums the group totals (one numpy cumsum) and
   broadcasts the ``group → starting offset`` table via ``ray.put``;
4. a ``groupby(group).map_groups`` pass co-locates each group, sorts it
   by ``doc_id``, cumsums locally, adds the broadcast group offset, and
   emits spans fully vectorized (``np.repeat`` / ``arange`` — no Python
   per-row loop).

Cluster-size invariance: the plan depends only on (doc_id, n_tokens),
never on block boundaries, so any parallelism level produces the
identical packing — the property that makes a resumed or re-sharded
100-TB run emit the same training set.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_PLAN_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("seq_id", pa.int64()),
    ("tok_start", pa.int64()),
    ("tok_end", pa.int64()),
])


def _spans_for(doc_ids: np.ndarray, offs: np.ndarray,
               counts: np.ndarray, seq_len: int) -> pa.Table:
    """Vectorized span emission for docs with global token offsets
    ``offs`` and token counts ``counts`` (all > 0)."""
    first = offs // seq_len
    last = (offs + counts - 1) // seq_len
    n_spans = (last - first + 1).astype(np.int64)
    doc_rep = np.repeat(doc_ids, n_spans)
    off_rep = np.repeat(offs, n_spans)
    cnt_rep = np.repeat(counts, n_spans)
    starts = np.repeat(first, n_spans)
    # seq ids: first[i], first[i]+1, ... per doc
    step = np.arange(int(n_spans.sum()), dtype=np.int64)
    step -= np.repeat(np.cumsum(n_spans) - n_spans, n_spans)
    seq = starts + step
    tok_start = np.maximum(seq * seq_len, off_rep) - off_rep
    tok_end = np.minimum((seq + 1) * seq_len, off_rep + cnt_rep) - off_rep
    return pa.Table.from_pydict(
        {"doc_id": doc_rep, "seq_id": seq,
         "tok_start": tok_start, "tok_end": tok_end},
        schema=_PLAN_SCHEMA)


def pack_sequences(docs_ds, seq_len: int, group_size: int = 4096):
    """Packing plan for ``docs_ds`` (needs doc_id + text) at ``seq_len``.

    Returns a Dataset with schema (doc_id, seq_id, tok_start, tok_end);
    see module docstring for the distributed prefix-sum shape."""
    import ray
    from ray.data.aggregate import Sum

    from corenlp_ray.ops.textstats import token_count_batch

    def _count(batch: pa.Table) -> pa.Table:
        b = token_count_batch(batch)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": ids,
            "grp": ids // np.int64(group_size),
            "n_tokens": b.column("n_tokens"),
        })

    counted = docs_ds.map_batches(_count, batch_format="pyarrow")

    # tiny all-to-all: one partial row per (block, group) into the
    # native hash aggregate, one output row per group
    totals = (counted.select_columns(["grp", "n_tokens"])
              .groupby("grp").aggregate(Sum("n_tokens", alias_name="tot"))
              .to_arrow_refs())
    parts = [p for p in ray.get(totals) if p.num_rows]
    tot_tbl = (pa.concat_tables(parts) if parts else
               pa.table({"grp": pa.array([], pa.int64()),
                         "tot": pa.array([], pa.int64())}))
    grp = tot_tbl.column("grp").to_numpy(zero_copy_only=False).astype(np.int64)
    tot = tot_tbl.column("tot").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(grp)
    grp, tot = grp[order], tot[order]
    g_off = np.cumsum(tot) - tot  # tokens before each group
    offsets_ref = ray.put(dict(zip(grp.tolist(), g_off.tolist())))

    _local = {}  # per-worker deserialized-offsets cache: ray.get of a
    # plasma dict re-deserializes per call, and map_groups calls _emit
    # once per group — fetch once per worker process instead

    def _emit(group: pa.Table) -> pa.Table:
        if "offsets" not in _local:
            _local["offsets"] = ray.get(offsets_ref)
        offsets = _local["offsets"]
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        cnt = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, cnt = ids[order], cnt[order]
        base = offsets[int(ids[0]) // group_size]
        offs = base + np.cumsum(cnt) - cnt
        nz = cnt > 0
        if not nz.any():
            return _PLAN_SCHEMA.empty_table()
        return _spans_for(ids[nz], offs[nz], cnt[nz], seq_len)

    return counted.groupby("grp").map_groups(_emit, batch_format="pyarrow")


def pack_sequences_shuffled(docs_ds, seq_len: int, seed: int = 0):
    """Packing plan over the DETERMINISTICALLY SHUFFLED corpus: docs are
    concatenated in ``(mix32(doc_id, seed), doc_id)`` order instead of
    doc_id order — the standard pre-training recipe (shuffle before
    packing) without any RNG state or a global sort of the corpus.

    Same distributed prefix-sum as :func:`pack_sequences`, but the
    coarse group is the TOP 16 BITS of the decision hash, so group
    order == concatenation order and the driver's cumsum stays one row
    per occupied hash block (≤ 65 536 rows at any corpus size). The
    plan is a pure function of (doc_id, n_tokens, seed): cluster-size,
    block-layout and resume invariant, and re-derivable in SQL via the
    identical HUGEINT hash (``ops/sampling.mix32_sql``)."""
    import ray
    from ray.data.aggregate import Sum

    from corenlp_ray.ops.sampling import mix32
    from corenlp_ray.ops.textstats import token_count_batch

    def _count(batch: pa.Table) -> pa.Table:
        b = token_count_batch(batch)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        key = mix32(ids, seed=seed).astype(np.int64)
        return pa.table({
            "doc_id": ids,
            "key": key,
            "grp": key >> np.int64(16),
            "n_tokens": b.column("n_tokens"),
        })

    counted = docs_ds.map_batches(_count, batch_format="pyarrow")
    totals = (counted.select_columns(["grp", "n_tokens"])
              .groupby("grp").aggregate(Sum("n_tokens", alias_name="tot"))
              .to_arrow_refs())
    parts = [p for p in ray.get(totals) if p.num_rows]
    tot_tbl = (pa.concat_tables(parts) if parts else
               pa.table({"grp": pa.array([], pa.int64()),
                         "tot": pa.array([], pa.int64())}))
    grp = tot_tbl.column("grp").to_numpy(zero_copy_only=False).astype(np.int64)
    tot = tot_tbl.column("tot").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(grp)
    grp, tot = grp[order], tot[order]
    g_off = np.cumsum(tot) - tot
    offsets_ref = ray.put(dict(zip(grp.tolist(), g_off.tolist())))

    _local = {}  # per-worker offsets cache (same trick as pack_sequences)

    def _emit(group: pa.Table) -> pa.Table:
        if "offsets" not in _local:
            _local["offsets"] = ray.get(offsets_ref)
        offsets = _local["offsets"]
        ids = group.column("doc_id").to_numpy(zero_copy_only=False)
        key = group.column("key").to_numpy(zero_copy_only=False)
        cnt = group.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key))   # concatenation order in-group
        ids, key, cnt = ids[order], key[order], cnt[order]
        base = offsets[int(key[0]) >> 16]
        offs = base + np.cumsum(cnt) - cnt
        nz = cnt > 0
        if not nz.any():
            return _PLAN_SCHEMA.empty_table()
        return _spans_for(ids[nz], offs[nz], cnt[nz], seq_len)

    return counted.groupby("grp").map_groups(_emit, batch_format="pyarrow")


def chunk_documents(docs_ds, max_tokens: int, overlap: int = 0,
                    text_col: str = "text"):
    """Context-window chunking — packing's complement: split every
    document into chunks of ≤ ``max_tokens`` whitespace tokens with
    ``overlap`` tokens of left context repeated between consecutive
    chunks (the long-document recipe for embedding / inference
    pipelines where a hard model window forces cutting, and stride
    overlap keeps boundary-crossing spans visible in some chunk).

    Output: (doc_id, chunk_idx, chunk, n_tokens); chunk starts sit at
    ``chunk_idx * (max_tokens - overlap)``; the last chunk may be
    short; empty documents emit nothing. The whole op is one
    shuffle-free map_batches of vectorized polars list kernels
    (split → int_ranges explode → list.slice → join); cluster-size
    and block-layout invariant because the plan depends only on each
    row's own token count."""
    if not 0 <= int(overlap) < int(max_tokens):
        raise ValueError(f"need 0 <= overlap < max_tokens, got "
                         f"{overlap} / {max_tokens}")
    mt, st = int(max_tokens), int(max_tokens) - int(overlap)

    def per_batch(batch: pa.Table):
        import polars as pl

        df = pl.from_arrow(batch.select(["doc_id", text_col]))
        df = (df.with_columns(pl.col(text_col).str.extract_all(r"\S+")
                              .alias("toks"))
              .with_columns(pl.col("toks").list.len().cast(pl.Int64)
                            .alias("n"))
              .filter(pl.col("n") > 0))
        df = df.with_columns(
            pl.when(pl.col("n") <= mt).then(pl.lit(1))
            .otherwise((pl.col("n") - mt + st - 1) // st + 1)
            .cast(pl.Int64).alias("nc"))
        df = (df.with_columns(pl.int_ranges(0, pl.col("nc"))
                              .alias("chunk_idx"))
              .explode("chunk_idx")
              .with_columns((pl.col("chunk_idx") * st).alias("s")))
        df = df.with_columns(
            pl.col("toks").list.slice(pl.col("s"), mt).list.join(" ")
            .alias("chunk"),
            pl.min_horizontal(pl.lit(mt), pl.col("n") - pl.col("s"))
            .cast(pl.Int64).alias("n_tokens"))
        return df.select(["doc_id", "chunk_idx", "chunk",
                          "n_tokens"]).to_arrow()

    return docs_ds.map_batches(per_batch, batch_format="pyarrow")


def chunk_documents_sql(table: str = "documents", max_tokens: int = 40,
                        overlap: int = 8, text_col: str = "text") -> str:
    """DuckDB oracle for :func:`chunk_documents` (same \\S+ token
    convention, same integer chunk-count arithmetic)."""
    mt, st = int(max_tokens), int(max_tokens) - int(overlap)
    return (
        "WITH t AS (SELECT doc_id, "
        f"regexp_split_to_array(trim({text_col}), '\\s+') AS toks "
        f"FROM {table} WHERE trim({text_col}) <> ''), "
        "p AS (SELECT doc_id, toks, len(toks) AS n, "
        f"CASE WHEN len(toks) <= {mt} THEN 1 "
        f"ELSE ((len(toks) - {mt}) + {st} - 1) // {st} + 1 END AS nc "
        "FROM t), "
        "c AS (SELECT doc_id, toks, n, "
        "unnest(generate_series(0, nc - 1)) AS ci FROM p) "
        "SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx, "
        f"array_to_string(toks[ci*{st}+1 : ci*{st}+{mt}], ' ') AS chunk, "
        f"CAST(least({mt}, n - ci*{st}) AS BIGINT) AS n_tokens FROM c")
