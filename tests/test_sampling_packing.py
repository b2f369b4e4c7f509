"""Unit tests for ops/sampling.py and ops/packing.py — edge cases the
planted catalog oracles (packing_planted / hash_sample_planted /
domain_quota_planted, tests/test_query_catalog.py) don't reach."""
import numpy as np
import pyarrow as pa
import pytest

from corenlp_ray.ops.packing import _spans_for, pack_sequences
from corenlp_ray.ops.sampling import (accept_mask, domain_quota_sample,
                                      hash_sample, mix32)


# ------------------------------------------------------------ sampling ----

def test_mix32_deterministic_and_uniformish():
    keys = np.arange(100_000, dtype=np.int64)
    h = mix32(keys, seed=1)
    assert np.array_equal(h, mix32(keys, seed=1))
    assert not np.array_equal(h, mix32(keys, seed=2))
    assert h.max() < (1 << 32)
    # roughly uniform: each quartile of the space holds 25% ± 1%
    q = np.bincount((h >> np.uint64(30)).astype(int), minlength=4)
    assert np.all(np.abs(q / len(keys) - 0.25) < 0.01)


def test_accept_mask_rates():
    keys = np.arange(200_000, dtype=np.int64)
    for rate in (0.0, 0.1, 0.5, 1.0):
        frac = accept_mask(keys, rate, seed=9).mean()
        assert abs(frac - rate) < 0.005


def test_hash_sample_cluster_size_invariant(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    a = hash_sample(rd.from_arrow(tbl), 0.3, seed=4).to_pandas()
    b = hash_sample(rd.from_arrow(tbl).repartition(7), 0.3,
                    seed=4).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])


def test_domain_quota_zero_and_unlisted(ray_session):
    import ray.data as rd

    n = 2000
    doms = ["a.com", "b.com", "c.com"]
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "domain": pa.array([doms[i % 3] for i in range(n)]),
    })
    out = domain_quota_sample(
        rd.from_arrow(tbl), {"a.com": 0.0, "b.com": 1.0},
        default_rate=0.5, seed=11).to_pandas()
    by = out.groupby("domain").size()
    assert "a.com" not in by.index          # rate 0 drops everything
    assert by["b.com"] == n // 3 + (n % 3 > 1)  # rate 1 keeps everything
    assert 0.35 < by["c.com"] / (n // 3) < 0.65  # default applies


# ------------------------------------------------------------- packing ----

def test_spans_exact_boundaries():
    # doc of 10 tokens starting at offset 250 with seq_len 128 spans
    # sequences 1 (tokens 0..6 -> global 250..255) and 2 (6..10)
    t = _spans_for(np.array([5]), np.array([250]), np.array([10]), 128)
    assert t.to_pydict() == {
        "doc_id": [5, 5], "seq_id": [1, 2],
        "tok_start": [0, 6], "tok_end": [6, 10]}


def test_spans_doc_on_seq_boundary():
    t = _spans_for(np.array([1]), np.array([128]), np.array([128]), 128)
    assert t.to_pydict() == {
        "doc_id": [1], "seq_id": [1], "tok_start": [0], "tok_end": [128]}


@pytest.mark.parametrize("group_size", [1, 16, 4096])
def test_pack_group_size_invariant(ray_session, group_size):
    """The plan is a pure function of (doc_id, n_tokens) — coarse-group
    granularity and block layout must not change it."""
    import ray.data as rd

    texts = ["tok " * ((i * 37) % 55) if i % 9 else "" for i in range(300)]
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array([t.strip() for t in texts])})
    plan = (pack_sequences(rd.from_arrow(tbl).repartition(5), 64,
                           group_size=group_size)
            .to_pandas().sort_values(["doc_id", "seq_id"])
            .reset_index(drop=True))
    # reference: serial cumsum
    n = np.array([len(t.split()) if t.strip() else 0
                  for t in [x.strip() for x in texts]])
    off = np.cumsum(n) - n
    rows = []
    for d in range(300):
        if not n[d]:
            continue
        for s in range(off[d] // 64, (off[d] + n[d] - 1) // 64 + 1):
            rows.append((d, s, max(s * 64, off[d]) - off[d],
                         min((s + 1) * 64, off[d] + n[d]) - off[d]))
    assert list(map(tuple, plan.itertuples(index=False))) == rows


def test_pack_total_token_conservation(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                    "text": pa.array(["w " * (i % 13) for i in range(50)])})
    plan = pack_sequences(rd.from_arrow(tbl), 32, group_size=8).to_pandas()
    total = sum(i % 13 for i in range(50))
    assert int((plan["tok_end"] - plan["tok_start"]).sum()) == total
    # every span is non-empty and within a single sequence
    assert (plan["tok_end"] > plan["tok_start"]).all()


def test_shuffled_pack_matches_serial_reference(ray_session):
    import ray.data as rd

    from corenlp_ray.ops.packing import pack_sequences_shuffled
    from corenlp_ray.ops.sampling import mix32

    texts = ["w " * (i % 9) for i in range(120)]
    tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                    "text": pa.array([t.strip() for t in texts])})
    plan = (pack_sequences_shuffled(rd.from_arrow(tbl).repartition(7),
                                    32, seed=5)
            .to_pandas().sort_values(["doc_id", "seq_id"])
            .reset_index(drop=True))
    # serial reference: concatenate in (mix32(id, 5), id) order
    ids = np.arange(120)
    n = np.array([len(t.split()) if t.strip() else 0
                  for t in [x.strip() for x in texts]])
    key = mix32(ids, seed=5).astype(np.int64)
    order = np.lexsort((ids, key))
    off = np.zeros(120, dtype=np.int64)
    pos = 0
    for d in order:
        off[d] = pos
        pos += n[d]
    rows = []
    for d in range(120):
        if not n[d]:
            continue
        for s in range(off[d] // 32, (off[d] + n[d] - 1) // 32 + 1):
            rows.append((d, s, max(s * 32, off[d]) - off[d],
                         min((s + 1) * 32, off[d] + n[d]) - off[d]))
    rows.sort()
    assert list(map(tuple, plan.itertuples(index=False))) == rows


def test_shuffled_pack_layout_invariant_and_differs_from_id_order(
        ray_session):
    import ray.data as rd

    from corenlp_ray.ops.packing import (pack_sequences,
                                         pack_sequences_shuffled)

    tbl = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                    "text": pa.array(["x " * (3 + i % 5)
                                      for i in range(80)])})
    a = (pack_sequences_shuffled(rd.from_arrow(tbl), 16, seed=2)
         .to_pandas().sort_values(["doc_id", "seq_id"])
         .reset_index(drop=True))
    b = (pack_sequences_shuffled(rd.from_arrow(tbl).repartition(11),
                                 16, seed=2)
         .to_pandas().sort_values(["doc_id", "seq_id"])
         .reset_index(drop=True))
    assert a.equals(b)
    c = (pack_sequences(rd.from_arrow(tbl), 16, group_size=16)
         .to_pandas().sort_values(["doc_id", "seq_id"])
         .reset_index(drop=True))
    assert not a.equals(c)  # the shuffle actually changes the layout
    # but token totals are conserved either way
    assert ((a.tok_end - a.tok_start).sum()
            == (c.tok_end - c.tok_start).sum())


def test_hash_split_partitions_every_row_once(ray_session):
    import ray.data as rd

    from corenlp_ray.ops.sampling import hash_split

    tbl = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    out = hash_split(rd.from_arrow(tbl).repartition(5),
                     {"train": 0.9, "valid": 0.05, "test": 0.05},
                     seed=3).take_all()
    assert len(out) == 2000
    from collections import Counter
    sizes = Counter(r["split"] for r in out)
    assert set(sizes) == {"train", "valid", "test"}
    assert 0.85 < sizes["train"] / 2000 < 0.95
    # deterministic across layouts
    out2 = hash_split(rd.from_arrow(tbl).repartition(17),
                      {"train": 0.9, "valid": 0.05, "test": 0.05},
                      seed=3).take_all()
    assert ({r["doc_id"]: r["split"] for r in out}
            == {r["doc_id"]: r["split"] for r in out2})


def test_hash_split_validates_fractions(ray_session):
    from corenlp_ray.ops.sampling import split_thresholds

    with pytest.raises(ValueError):
        split_thresholds({"a": 0.5, "b": 0.2})
    ths = split_thresholds({"a": 0.5, "b": 0.5})
    assert ths[-1] == ("b", 1 << 32)


# ------------------------------------------------------ mixture sample ----

def test_mixture_thresholds_exact_integers():
    from corenlp_ray.ops.sampling import mixture_thresholds

    counts = {"en": 400, "de": 100, "zh": 50}
    # target mixture 2:1:1 → binding domain = zh (50/1 < 100/1 < 400/2)
    thr = mixture_thresholds(counts, {"en": 2, "de": 1, "zh": 1})
    space = 1 << 32
    assert thr["zh"] == space                      # binding: rate 1
    assert thr["de"] == space * 1 * 50 // (1 * 100)  # rate 1/2
    assert thr["en"] == space * 2 * 50 // (1 * 400)  # rate 1/4
    # a domain absent from weights (or weight 0) is dropped entirely
    thr2 = mixture_thresholds(counts, {"en": 1, "de": 1})
    assert "zh" not in thr2
    with pytest.raises(ValueError):
        mixture_thresholds({"en": 5}, {"de": 1})


def test_mixture_sample_matches_threshold_decisions(ray_session):
    import ray.data as rd

    from corenlp_ray.ops.sampling import (mix32, mixture_sample,
                                          mixture_thresholds)

    n = 600
    doms = np.array(["en", "de", "zh"])[np.arange(n) % 3]
    tbl = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                    "lang": pa.array(doms, pa.string())})
    W = {"en": 2, "de": 1, "zh": 1}
    got = mixture_sample(rd.from_arrow(tbl), W, domain_col="lang") \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    thr = mixture_thresholds({"en": 200, "de": 200, "zh": 200}, W)
    keys = np.arange(n, dtype=np.int64)
    keep = mix32(keys) < np.array([thr[d] for d in doms], dtype=np.uint64)
    assert got["doc_id"].tolist() == keys[keep].tolist()
    # cluster-size invariance: decisions are pure functions of the row
    got2 = mixture_sample(rd.from_arrow(tbl).repartition(11), W,
                          domain_col="lang").to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert got2["doc_id"].tolist() == got["doc_id"].tolist()


def test_exemplar_sample_matches_sql(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from corenlp_ray.ops.sampling import exemplar_sample, \
        exemplar_sample_sql

    rng = np.random.RandomState(7)
    n = 400
    t = pa.table({
        "doc_id": np.arange(n, dtype=np.int64),
        "lang": [["en", "de", "fr", "zh"][i] for i in
                 rng.randint(0, 4, n)]})
    ds = ray.data.from_arrow(t).repartition(7)
    mine = (exemplar_sample(ds, key_col="lang", n=3).to_pandas()
            .sort_values(["lang", "rn"], ignore_index=True))
    con = duckdb.connect()
    con.register("docs", t)
    want = (con.execute(exemplar_sample_sql("docs", "lang", n=3))
            .fetchdf().sort_values(["lang", "rn"], ignore_index=True))
    assert mine[["lang", "doc_id", "h", "rn"]].values.tolist() == \
        want[["lang", "doc_id", "h", "rn"]].values.tolist()


def test_exemplar_sample_partition_invariant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from corenlp_ray.ops.sampling import exemplar_sample

    t = pa.table({
        "doc_id": np.arange(200, dtype=np.int64),
        "lang": [["en", "de"][i % 2] for i in range(200)]})

    def run(parts):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = exemplar_sample(ds, key_col="lang", n=5).to_pandas()
        return df.sort_values(["lang", "rn"]).values.tolist()

    assert run(2) == run(13)


def test_chunk_documents_semantics(ray_session):
    import pyarrow as pa
    import ray

    from corenlp_ray.ops.packing import chunk_documents

    t = pa.table({"doc_id": [1, 2, 3],
                  "text": ["a b c d e f g h i j",   # 10 toks
                           "x y",                    # fits in one
                           "   "]})                  # empty: dropped
    out = (chunk_documents(ray.data.from_arrow(t), max_tokens=4,
                           overlap=1).to_pandas()
           .sort_values(["doc_id", "chunk_idx"], ignore_index=True))
    got = out[["doc_id", "chunk_idx", "chunk", "n_tokens"]].values.tolist()
    # step = 3: starts 0,3,6 — the third window ends exactly at token
    # 10, so ceil((n-mt)/st)+1 = 3 chunks cover everything
    assert got == [
        [1, 0, "a b c d", 4], [1, 1, "d e f g", 4],
        [1, 2, "g h i j", 4],
        [2, 0, "x y", 2]]


def test_chunk_documents_rejects_bad_overlap():
    import pytest

    from corenlp_ray.ops.packing import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(None, max_tokens=4, overlap=4)


def test_mix32_sql_parity_on_negative_keys():
    """numpy wraps negative keys mod 2^64 while DuckDB HUGEINT keeps the
    sign — both sides now mask to the non-negative int64 domain first
    (advisor r4)."""
    import numpy as np

    from corenlp_ray.ops.sampling import mix32, mix32_sql

    keys = np.array([-2**63, -12345, -1, 0, 1, 7, 2**62, 2**63 - 1],
                    dtype=np.int64)
    py = mix32(keys, seed=5)
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT {mix32_sql('k', 5)} FROM "
        "(SELECT unnest(?::BIGINT[]) AS k)", [keys.tolist()]).fetchall()
    assert py.tolist() == [r[0] for r in rows]
