"""URL hygiene operators for web corpora.

Not a reference operator family (CoreNLP never sees URLs as keys) — this
is part of the LLM-training-data extension surface: at 10^12 documents
the FIRST dedup key is the URL itself (Common Crawl re-crawls; mirrors
differ only in tracking parameters), and per-domain statistics drive the
crawl-mix / skew decisions everything downstream depends on.

Every kernel here is a pyarrow.compute RE2 call — zero Python per row —
and every pattern is shared verbatim with a DuckDB oracle
(``url_normalize_planted`` / ``url_dedup_planted`` /
``domain_stats_planted``), so the driver's correctness gate pins the
regex SEMANTICS end to end, the same contract pii_batch uses
(ops/webfilters.py).

Normalization spec (deterministic, order matters):
  1. strip the fragment (``#...`` to end of string);
  2. drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``) wherever they appear;
  3. if the surviving first parameter now starts with ``&``, promote it
     to ``?`` (one replacement);
  4. strip a dangling trailing ``?`` or ``&``.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# shared with the DuckDB oracles — keep literal and RE2-compatible
FRAGMENT_PAT = r"#.*"
TRACKING_PAT = r"[?&](?:utm_[a-z]+|fbclid|gclid|msclkid)=[^&]*"
PROMOTE_PAT = r"^([^?]*?)&"
DANGLING_PAT = r"[?&]$"
# host of an absolute URL; group 1 = domain (named for pc.extract_regex)
DOMAIN_PAT = r"^[a-z][a-z0-9+.-]*://(?:[^/?#@]*@)?(?P<host>[^/:?#]+)"


def normalize_urls(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Vectorized URL canonicalization (spec above)."""
    s = pc.replace_substring_regex(arr, pattern=FRAGMENT_PAT,
                                   replacement="")
    s = pc.replace_substring_regex(s, pattern=TRACKING_PAT, replacement="")
    s = pc.replace_substring_regex(s, pattern=PROMOTE_PAT,
                                   replacement=r"\1?", max_replacements=1)
    return pc.replace_substring_regex(s, pattern=DANGLING_PAT,
                                      replacement="")


def domains_of(arr: pa.ChunkedArray | pa.Array,
               strip_www: bool = True) -> pa.ChunkedArray:
    """Vectorized host extraction; non-URLs → empty string."""
    ext = pc.extract_regex(arr, DOMAIN_PAT)
    host = pc.fill_null(pc.struct_field(ext, "host"), "")
    if strip_www:
        host = pc.replace_substring_regex(host, pattern=r"^www\.",
                                          replacement="",
                                          max_replacements=1)
    return host


def url_normalize_batch(batch: pa.Table, url_col: str = "url",
                        out_col: str = "url_norm") -> pa.Table:
    return batch.append_column(out_col, normalize_urls(batch.column(url_col)))


def domain_batch(batch: pa.Table, url_col: str = "url",
                 out_col: str = "domain") -> pa.Table:
    return batch.append_column(out_col, domains_of(batch.column(url_col)))


def url_dedup(pages_ds, url_col: str = "url", id_col: str = "doc_id"):
    """One row per normalized URL: canonical = min(id), dup count.

    Same two-phase shape as ops/dedup.exact_dedup — the native hash
    aggregate map-combines per block before the shuffle, so a hot URL
    (a crawl loop hitting one page) ships one partial row per block."""
    from ray.data.aggregate import Count, Min

    normed = pages_ds.map_batches(
        lambda b: url_normalize_batch(b, url_col=url_col),
        batch_format="pyarrow")
    return (normed
            .select_columns(["url_norm", id_col])
            .groupby("url_norm")
            .aggregate(Min(id_col, alias_name="canonical_" + id_col),
                       Count(alias_name="dup_count")))


def domain_stats(pages_ds, url_col: str = "url", size_col: str = "n_chars"):
    """Per-domain corpus share: page count + total payload size.

    The crawl-mix table a 100-TB run computes first; also the input to
    hot-domain detection (SURVEY §4.2 skew) — a domain whose count is a
    large corpus fraction needs salted downstream keys."""
    from ray.data.aggregate import Count, Sum

    domed = pages_ds.map_batches(
        lambda b: domain_batch(b, url_col=url_col), batch_format="pyarrow")
    return (domed
            .select_columns(["domain", size_col])
            .groupby("domain")
            .aggregate(Count(alias_name="n_pages"),
                       Sum(size_col, alias_name="total_chars")))
