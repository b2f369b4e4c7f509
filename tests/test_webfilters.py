"""Web-corpus hygiene ops (ops/webfilters.py): PII detect/redact,
Gopher-style repetition stats, benchmark decontamination.

pii_planted's driver oracle lives in ORACLE_SQL (checked by
test_query_catalog alongside the other 49); the rows-only queries get
their DuckDB cross-checks here so every webfilter op has oracle-grade
evidence without consuming driver-budget slots.
"""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from corenlp_ray.ops.webfilters import (DECONTAM_NGRAM, decontaminate,
                                        pii_batch, repetition_batch)

SF = "/root/testdata/sf0.001"


def test_pii_counts_redaction_and_decoys():
    t = pa.table({"text": [
        "mail bob@x.example.com and sue@y.org; call 555-123-4567",
        "v1.2.3.4000 is a version, example dot com is prose",
        "server 10.0.0.1 and 255.255.255.0 but not 1234-567-8901",
        "",
    ]})
    out = pii_batch(t)
    assert out.column("n_emails").to_pylist() == [2, 0, 0, 0]
    assert out.column("n_phones").to_pylist() == [1, 0, 0, 0]
    assert out.column("n_ips").to_pylist() == [0, 0, 2, 0]
    red = out.column("text_redacted").to_pylist()
    assert red[0] == "mail [EMAIL] and [EMAIL]; call [PHONE]"
    assert red[1] == t.column("text")[1].as_py()  # decoys untouched
    assert "[IP]" in red[2] and "1234-567-8901" in red[2]
    assert out.column("redacted_len").to_pylist() == [
        len(r) for r in red]


def test_repetition_semantics():
    t = pa.table({"text": [
        "a b\na b\nc d",          # 3 lines, 1 dup
        "p q r",                   # single line
        "x y\n\nx y\n\nz",         # paras: [x y, x y, z] -> dup 1/3
        "",
    ]})
    out = repetition_batch(t)
    assert out.column("n_lines").to_pylist() == [3, 1, 5, 1]
    np.testing.assert_allclose(
        out.column("dup_line_frac").to_pylist(),
        [1 / 3, 0.0, 2 / 5, 0.0])
    np.testing.assert_allclose(
        out.column("dup_para_frac").to_pylist(),
        [0.0, 0.0, 1 / 3, 0.0])
    # 'a b\na b\nc d': bigrams of ws-tokens = [a b, b a, a b, b c, c d]
    # modal 'a b' x2 of 5
    np.testing.assert_allclose(
        out.column("top_bigram_frac").to_pylist()[0], 2 / 5)
    assert out.column("top_bigram_frac").to_pylist()[3] == 0.0


def _modal_bigram_frac(text: str) -> float:
    toks = [x for x in text.strip().split() if x]
    if len(toks) < 2:
        return 0.0
    from collections import Counter

    c = Counter(zip(toks, toks[1:]))
    return max(c.values()) / sum(c.values())


def test_repetition_duckdb_parity():
    """dup fractions + n_lines against an independent DuckDB derivation
    over planted multi-line docs; top_bigram_frac against an
    independent pure-Python counter."""
    texts = [f"alpha beta\ngamma {i % 3}\nalpha beta\n\ndelta {i % 5}"
             for i in range(97)] + ["solo", ""]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    mine = repetition_batch(t).to_pandas()

    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    want = con.execute(
        "SELECT doc_id, len(string_split(text, chr(10))) AS n_lines, "
        "CASE WHEN len(string_split(text, chr(10))) > 1 THEN "
        "1.0 - len(list_distinct(string_split(text, chr(10)))) * 1.0 / "
        "len(string_split(text, chr(10))) ELSE 0.0 END AS dup_line_frac, "
        "CASE WHEN len(string_split(text, chr(10)||chr(10))) > 1 THEN "
        "1.0 - len(list_distinct(string_split(text, chr(10)||chr(10)))) "
        "* 1.0 / len(string_split(text, chr(10)||chr(10))) ELSE 0.0 END "
        "AS dup_para_frac FROM docs ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(
        mine[["doc_id", "n_lines", "dup_line_frac",
              "dup_para_frac"]].reset_index(drop=True),
        want, check_dtype=False)
    np.testing.assert_allclose(
        mine["top_bigram_frac"].to_numpy(),
        np.array([_modal_bigram_frac(x) for x in texts]))


def test_decontamination_duckdb_parity(ray_session):
    from corenlp_ray.pipelines.queries import QUERIES

    mine = (QUERIES["decontamination"](SF).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    n = DECONTAM_NGRAM
    want = con.execute(
        "WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        r"lower(trim(text)), '\s+'), x -> x != '') AS t FROM documents), "
        "bench AS (SELECT DISTINCT array_to_string(t[1:{n}], ' ') AS ng "
        "FROM toks WHERE doc_id % 97 = 0 AND len(t) >= {n}), "
        "sh AS (SELECT doc_id, array_to_string(t[i:i+{m}], ' ') AS s "
        "FROM toks, LATERAL (SELECT unnest(generate_series(1, "
        "len(t)-{m})) AS i) g WHERE len(t) >= {n}) "
        "SELECT tk.doc_id, COALESCE(bool_or(sh.s IN (SELECT ng FROM "
        "bench)), FALSE) AS contaminated FROM toks tk LEFT JOIN sh "
        "ON tk.doc_id = sh.doc_id GROUP BY tk.doc_id ORDER BY tk.doc_id"
        .format(n=n, m=n - 1)).fetchdf()
    assert mine["contaminated"].sum() > 0  # bench docs self-flag
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_decontamination_known_plant(ray_session):
    """A doc embedding a benchmark doc's opening 8-gram mid-text flags;
    unrelated text does not."""
    import ray.data as rd

    bench_text = "the quick brown fox jumps over the lazy dog tail"
    docs = pa.table({
        "doc_id": [0, 1, 2],
        "text": [bench_text,
                 "prefix words here " + " ".join(
                     bench_text.split()[:8]) + " trailing stuff",
                 "completely unrelated content with many words to spare"],
    })
    out = (decontaminate(rd.from_arrow(docs), every=97)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert out["contaminated"].tolist() == [True, True, False]


def test_pii_stats_runs_on_real_docs(ray_session):
    from corenlp_ray.pipelines.queries import QUERIES

    df = QUERIES["pii_stats"](SF).to_pandas()
    assert len(df) == 500
    # word-salad corpus carries no PII; the stage must say so, not crash
    assert df[["n_emails", "n_phones", "n_ips"]].to_numpy().sum() == 0


def test_c4_clean_semantics():
    from corenlp_ray.ops.webfilters import c4_clean_batch

    t = pa.table({"text": [
        "Good long sentence here.\nshort.\nNo terminal punct here\n"
        "Another fine line stays!\nthis has javascript inside.\n"
        "And one more keeper?",
        "A page with code { inside }. Fine line.\nSecond good line "
        "here.\nThird good line too.",
        "Lorem Ipsum dolor sit amet. Looks valid.\nMore good text "
        "ends.\nThird keeps going on.",
        "Only two good lines here.\nSecond keeper line stays.",
        "",
    ]})
    out = c4_clean_batch(t)
    assert out.column("n_lines_kept").to_pylist() == [3, 3, 3, 2, 0]
    # page 0 keeps; 1 has '{'; 2 has lorem ipsum; 3 below min lines
    assert out.column("page_keep").to_pylist() == [
        True, False, False, False, False]
    assert out.column("text_clean").to_pylist()[0] == (
        "Good long sentence here.\nAnother fine line stays!\n"
        "And one more keeper?")


def test_c4_clean_duckdb_parity():
    from corenlp_ray.ops.webfilters import c4_clean_batch

    texts = []
    for i in range(211):
        lines = [f"Sentence number {i} ends well.",
                 f"tiny{i}.",
                 f"A javascript mention {i} here.",
                 f"No terminal punct {i}",
                 f"Another full line {i} stays!",
                 f"Third proper line {i} remains?"]
        if i % 7 == 0:
            lines.append("code block { starts here }.")
        if i % 11 == 0:
            lines.append("Lorem ipsum filler sentence here.")
        texts.append("\n".join(lines))
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    mine = c4_clean_batch(t).to_pandas()[
        ["doc_id", "n_lines_kept", "page_keep", "text_clean"]]

    con = duckdb.connect()
    con.register("docs", t.to_pandas())
    want = con.execute(
        "WITH k AS (SELECT doc_id, text, list_filter(list_transform("
        "string_split(text, chr(10)), s -> trim(s)), s -> "
        "regexp_matches(s, '[.!?\"]$') AND "
        r"len(regexp_extract_all(s, '\S+')) >= 3 AND "
        "NOT contains(lower(s), 'javascript')) AS kept FROM docs) "
        "SELECT doc_id, CAST(len(kept) AS BIGINT) AS n_lines_kept, "
        "len(kept) >= 3 AND NOT contains(text, '{') AND "
        "NOT contains(lower(text), 'lorem ipsum') AS page_keep, "
        "array_to_string(kept, chr(10)) AS text_clean "
        "FROM k ORDER BY doc_id").fetchdf()
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_gopher_rules_semantics():
    from corenlp_ray.ops.webfilters import gopher_rules_batch

    good = ("the cat and dog have fun with food " * 8).strip()  # 64 words
    t = pa.table({"doc_id": list(range(6)), "text": [
        good,                                   # passes all gates
        "the cat and dog",                      # too few words
        good + " ##### " + "#" * 60,            # symbol ratio >= 0.1
        "\n".join(["- " + good] * 10),          # 100% bullet lines
        good.replace("the", "xxx").replace("and", "yyy")
            .replace("have", "zzz").replace("with", "www"),  # no stops
        "",                                     # empty
    ]})
    out = gopher_rules_batch(t).to_pandas()
    assert out["gopher_keep"].tolist() == [
        True, False, False, False, False, False]
    assert out["n_words"].tolist()[0] == 64
    assert out["n_stop_hits"].tolist()[0] == 4  # the, and, have, with
    assert out["n_symbols"].tolist()[2] >= 65
    assert out["n_bullet_lines"].tolist()[3] == 10
    assert out["n_lines"].tolist()[5] == 1 and out["n_words"].tolist()[5] == 0


def test_gopher_rules_ellipsis_and_mean_length():
    from corenlp_ray.ops.webfilters import gopher_rules_batch

    base = ("the cat and dog have fun with food " * 8).strip()
    t = pa.table({"doc_id": [0, 1], "text": [
        "\n".join([base + " ..."] * 10),     # every line ends ...
        ("a " * 60 + "the and").strip(),     # mean word len < 3
    ]})
    out = gopher_rules_batch(t).to_pandas()
    assert out["n_ellipsis_lines"].tolist()[0] == 10
    assert not out["gopher_keep"].any()


def test_gopher_rules_query_duckdb_parity(ray_session):
    from corenlp_ray.pipelines.queries import ORACLE_SQL, QUERIES

    mine = (QUERIES["gopher_rules"](SF).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = (con.execute(ORACLE_SQL["gopher_rules"]).fetchdf()
            .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)


def test_weblines_construction_matches_sql():
    """The Python and SQL weblines constructions must agree char-for-char
    (they feed the c4_planted/gopher_planted full-chain oracles)."""
    import pyarrow.parquet as pq

    from corenlp_ray.pipelines._sqlfrags import weblines_ctes
    from corenlp_ray.pipelines.planted import _weblines_text

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = dict(con.execute(
        f"WITH {weblines_ctes('documents')} "
        "SELECT doc_id, text FROM webdocs").fetchall())
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"])
    for d, x in zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()):
        assert _weblines_text(int(d), x or "") == want[d]
    # decorations actually occur
    joined = "\n".join(want.values())
    assert "- " in joined and " ..." in joined and "javascript" in joined
    assert "{ code }" in joined


def test_weblines_edge_docs():
    from corenlp_ray.pipelines.planted import _weblines_text

    assert _weblines_text(13, "") == "\n{ code }"   # token-less, %13 doc
    assert _weblines_text(1, "") == ""
    # k=1: the group's first token is REPLACED by stop cycle index 1
    # ('be'), 'solo' held positions 5k-4 so it drops; period (1%4!=0)
    assert _weblines_text(1, "solo") == "be."
    assert _weblines_text(1, "a b c d e f") == "be b c d e.\nto."


def test_unicode_clean_semantics():
    import pyarrow as pa

    from corenlp_ray.ops.webfilters import unicode_clean_batch

    batch = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["café  x", "plain ascii", "  Ångstrom\t\n q ",
                 "café x"]})
    out = unicode_clean_batch(batch)
    assert out.column("text_clean").to_pylist() == [
        "café x", "plain ascii", "Ångstrom q", "café x"]
    # row 1 composes, row 3 trims+collapses, rows 2 and 4 untouched
    assert out.column("changed").to_pylist() == [True, False, True, False]


def test_unicode_clean_duckdb_parity():
    import duckdb
    import pyarrow as pa

    from corenlp_ray.ops.webfilters import unicode_clean_batch, \
        unicode_clean_sql

    texts = ["café", "ä + ö", "  tab\tsep  ",
             "nfcé already", "", "mixed éé Å"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    mine = unicode_clean_batch(t).select(
        ["doc_id", "text_clean", "changed"]).to_pandas()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(unicode_clean_sql("documents")).fetchdf()
    assert mine.values.tolist() == want.values.tolist()


def test_blocklist_gate_token_exact():
    import pyarrow as pa

    from corenlp_ray.ops.webfilters import blocklist_gate_batch

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["What the hell is this", "hello shell okay",
                           "", "Damn it and DAMN again crap"]})
    out = blocklist_gate_batch(t)
    # token-exact: "hello"/"shell" must NOT match "hell"
    assert out.column("n_blocked").to_pylist() == [1, 0, 0, 3]
    assert out.column("blocklist_keep").to_pylist() == [
        False, True, True, False]


def test_blocklist_gate_custom_lexicon():
    import pyarrow as pa

    from corenlp_ray.ops.webfilters import blocklist_gate_batch

    t = pa.table({"doc_id": [1], "text": ["alpha beta GAMMA"]})
    out = blocklist_gate_batch(t, lexicon=("gamma",))
    assert out.column("n_blocked").to_pylist() == [1]
