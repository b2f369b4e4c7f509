"""Parameterized DuckDB SQL fragments shared by the driver oracles
(pipelines/queries.py, over the real ``documents`` table) and the
planted full-chain oracles (pipelines/planted.py, over the synthesized
``webdocs`` CTE). Keeping one builder per rule set guarantees the
planted and real-table oracles pin the IDENTICAL semantics."""

# the 8 Gopher stopwords, cycled into the weblines construction so the
# stopword gate is non-trivial on the word-salad test corpus
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def c4_clean_sql(table: str = "documents") -> str:
    """C4 line/page cleaning rules (mirrors ops/webfilters.c4_clean_batch):
    n_lines_kept + page_keep as BIGINT."""
    return (
        f"WITH k AS (SELECT doc_id, text, list_filter(list_transform("
        "string_split(text, chr(10)), s -> trim(s)), s -> "
        "regexp_matches(s, '[.!?\"]$') AND "
        r"len(regexp_extract_all(s, '\S+')) >= 3 AND "
        f"NOT contains(lower(s), 'javascript')) AS kept FROM {table}) "
        "SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_lines_kept, "
        "CAST((len(kept) >= 3 AND NOT contains(text, '{') AND "
        "NOT contains(lower(text), 'lorem ipsum')) AS BIGINT) "
        "AS page_keep FROM k")


def gopher_rules_sql(table: str = "documents") -> str:
    """The seven Gopher A1.1 gates (mirrors ops/webfilters.
    gopher_rules_batch); all thresholds in integer arithmetic."""
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPS)
    return (
        "WITH toks AS (SELECT doc_id, text, list_filter("
        r"regexp_split_to_array(text, '\s+'), x -> x != '') AS t "
        f"FROM {table}), "
        "tok AS (SELECT doc_id, unnest(t) AS w FROM toks), "
        "ts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
        "CAST(sum(len(w)) AS BIGINT) AS total_chars, "
        "CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 "
        "END) AS BIGINT) AS n_alpha_words, "
        f"CAST(count(DISTINCT CASE WHEN lower(w) IN ({stops}) "
        "THEN lower(w) END) AS BIGINT) "
        "AS n_stop_hits FROM tok GROUP BY doc_id), "
        "ln AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS l "
        f"FROM {table}), "
        "ls AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines, "
        r"CAST(sum(CASE WHEN regexp_matches(l, '^\s*[-*•]') THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_bullet_lines, "
        r"CAST(sum(CASE WHEN regexp_matches(l, '\.\.\.\s*$') THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_ellipsis_lines FROM ln "
        "GROUP BY doc_id), "
        "sym AS (SELECT doc_id, CAST(len(text) - len(replace(text, '#', "
        "'')) + (len(text) - len(replace(text, '...', ''))) // 3 "
        f"AS BIGINT) AS n_symbols FROM {table}) "
        "SELECT d.doc_id, COALESCE(ts.n_words, 0) AS n_words, "
        "ls.n_lines AS n_lines, sym.n_symbols AS n_symbols, "
        "ls.n_bullet_lines AS n_bullet_lines, "
        "ls.n_ellipsis_lines AS n_ellipsis_lines, "
        "COALESCE(ts.n_alpha_words, 0) AS n_alpha_words, "
        "COALESCE(ts.n_stop_hits, 0) AS n_stop_hits, "
        "CAST((COALESCE(ts.n_words, 0) >= 50 AND "
        "COALESCE(ts.n_words, 0) <= 100000 AND "
        "3 * COALESCE(ts.n_words, 0) <= COALESCE(ts.total_chars, 0) AND "
        "COALESCE(ts.total_chars, 0) <= 10 * COALESCE(ts.n_words, 0) "
        "AND 10 * sym.n_symbols < COALESCE(ts.n_words, 0) AND "
        "10 * ls.n_bullet_lines < 9 * ls.n_lines AND "
        "10 * ls.n_ellipsis_lines < 3 * ls.n_lines AND "
        "5 * COALESCE(ts.n_alpha_words, 0) >= 4 * COALESCE(ts.n_words, "
        "0) AND COALESCE(ts.n_stop_hits, 0) >= 2) AS BIGINT) "
        f"AS gopher_keep FROM {table} d "
        "LEFT JOIN ts ON d.doc_id = ts.doc_id "
        "JOIN ls ON d.doc_id = ls.doc_id "
        "JOIN sym ON d.doc_id = sym.doc_id")


def weblines_ctes(src: str = "documents") -> str:
    """CTE chain synthesizing deterministic multi-line webtext
    ``webdocs(doc_id, text)`` from ``src``'s whitespace tokens — the
    planted construction behind c4/gopher/paragraph-dedup oracles
    (mirrors pipelines/planted._weblines_text):

    * line k (1-based) = stopword(k mod 8) + tokens 5k-3..5k
    * '- ' bullet prefix when k%6=0; ' javascript' when k%12=0;
      terminal '.' when k%4!=0; ' ...' suffix when k%9=0
    * lines grouped 3-per-paragraph, paragraphs joined by blank lines
    * docs with doc_id%13=0 get a trailing '{ code }' line
    """
    stops = list(GOPHER_STOPS)
    when = " ".join(f"WHEN {i} THEN '{s}'" for i, s in enumerate(stops))
    return (
        f"wl_toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        r"trim(text), '\s+'), x -> x != '') AS t "
        f"FROM {src}), "
        "wl_lines AS (SELECT doc_id, k, "
        f"(CASE (k % 8) {when} END) || "
        # COALESCE: array_to_string of an empty slice is NULL in DuckDB
        "(CASE WHEN COALESCE(array_to_string(t[5*k-3:5*k], ' '), '') "
        "= '' THEN '' ELSE ' ' || array_to_string(t[5*k-3:5*k], ' ') "
        "END) AS base "
        "FROM (SELECT doc_id, t, unnest(generate_series(1, "
        "(len(t) + 4) // 5)) AS k FROM wl_toks WHERE len(t) > 0)), "
        "wl_fmt AS (SELECT doc_id, k, "
        "(CASE WHEN k % 6 = 0 THEN '- ' ELSE '' END) || base || "
        "(CASE WHEN k % 12 = 0 THEN ' javascript' ELSE '' END) || "
        "(CASE WHEN k % 4 <> 0 THEN '.' ELSE '' END) || "
        "(CASE WHEN k % 9 = 0 THEN ' ...' ELSE '' END) AS line "
        "FROM wl_lines), "
        "wl_paras AS (SELECT doc_id, (k - 1) // 3 AS p, "
        "string_agg(line, chr(10) ORDER BY k) AS para FROM wl_fmt "
        "GROUP BY doc_id, (k - 1) // 3), "
        "wl_docs AS (SELECT doc_id, string_agg(para, chr(10) || chr(10) "
        "ORDER BY p) AS body FROM wl_paras GROUP BY doc_id), "
        # token-less docs still yield a (possibly empty) webdocs row so
        # the Ray and SQL sides agree on row counts
        "webdocs AS (SELECT w.doc_id, COALESCE(d.body, '') || "
        "(CASE WHEN w.doc_id % 13 = 0 THEN chr(10) || '{ code }' "
        "ELSE '' END) AS text FROM wl_toks w "
        "LEFT JOIN wl_docs d ON w.doc_id = d.doc_id)")
