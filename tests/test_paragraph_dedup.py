"""Paragraph-level corpus dedup (ops/dedup.paragraph_dedup): first
occurrence wins, reassembly order, cross-layout determinism, and the
planted header-boilerplate oracle."""
import pyarrow as pa
import pytest


def _run(texts, ray_session, nparts=3):
    import ray.data as rd

    from corenlp_ray.ops.dedup import paragraph_dedup

    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = paragraph_dedup(rd.from_arrow(tbl).repartition(nparts))
    return {r["doc_id"]: r for r in out.take_all()}


def test_first_occurrence_wins_and_reassembles(ray_session):
    got = _run([
        "shared\n\nunique zero",
        "shared\n\nunique one\n\nshared",   # dups of doc0's header + own
        "totally fresh",
    ], ray_session)
    assert got[0]["text_dedup"] == "shared\n\nunique zero"
    assert got[0]["n_paras"] == 2 and got[0]["n_paras_kept"] == 2
    # doc1 loses 'shared' (doc0 owns it) twice, keeps only its middle
    assert got[1]["text_dedup"] == "unique one"
    assert got[1]["n_paras"] == 3 and got[1]["n_paras_kept"] == 1
    assert got[2]["text_dedup"] == "totally fresh"


def test_doc_with_nothing_left_drops_out(ray_session):
    got = _run(["dup", "dup", "dup"], ray_session)
    assert set(got) == {0}
    assert got[0]["n_paras_kept"] == 1


def test_within_doc_duplicates_collapse(ray_session):
    got = _run(["a\n\nb\n\na\n\nb\n\nc"], ray_session)
    assert got[0]["text_dedup"] == "a\n\nb\n\nc"
    assert got[0]["n_paras"] == 5 and got[0]["n_paras_kept"] == 3


def test_layout_invariance(ray_session):
    texts = [f"common header\n\nbody {i % 7}\n\ntail {i % 3}"
             for i in range(40)]
    a = _run(texts, ray_session, nparts=2)
    b = _run(texts, ray_session, nparts=13)
    assert a == b


def test_planted_oracle_duckdb_parity(ray_session):
    import duckdb
    import pandas as pd

    from corenlp_ray.pipelines.planted import (
        paragraph_dedup_planted_sql, q_paragraph_dedup_planted)

    sf = "/root/testdata/sf0.001"
    mine = (q_paragraph_dedup_planted(sf).to_pandas()
            .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    want = (con.execute(paragraph_dedup_planted_sql()).fetchdf()
            .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    # the boilerplate header survives on exactly one page
    n_headers = mine["text_dedup"].str.contains(
        "shared boilerplate header").sum()
    assert n_headers == 1
    # every page except the header's owner lost at least one paragraph
    assert (mine["n_paras_kept"] < mine["n_paras"]).sum() >= len(mine) - 1
