"""N-gram LM perplexity scoring (ops/lm.py): CCNet-style quality
filter. The full train→score pipeline is driver-oracled as
``lm_perplexity_planted`` (ORACLE_SQL); here we pin the math on a
hand-computable corpus, the broadcast/join regime agreement, held-out
scoring with unseen grams, and min_count pruning semantics.
"""
import math

import numpy as np
import pyarrow as pa
import pytest

from corenlp_ray.ops.lm import (lm_perplexity, lm_stats,
                                score_perplexity, train_bigram_counts)

SF = "/root/testdata/sf0.001"


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(rows))), pa.int64()),
        "text": pa.array(rows, pa.string())}))


def test_bigram_counts_and_stats(ray_session):
    counts = train_bigram_counts(_ds(["a b a", "a b", "   ", ""]))
    rows = {(r["w1"], r["w2"]): r["c"] for r in counts.take_all()}
    # unigrams (w2=''): a×3, b×2 ; bigrams: (a,b)×2, (b,a)×1
    assert rows[("a", "")] == 3 and rows[("b", "")] == 2
    assert rows[("a", "b")] == 2 and rows[("b", "a")] == 1
    n, v = lm_stats(counts.materialize())
    assert (n, v) == (5, 2)


def test_scores_match_hand_computation(ray_session):
    docs = _ds(["a b a", "a b"])
    out = {r["doc_id"]: r for r in lm_perplexity(docs).take_all()}
    n, v = 5.0, 2.0
    # doc 0: first 'a' → log2(n+v)-log2(3+1); 'b'|a → log2(3+v)-log2(2+1);
    #        'a'|b → log2(2+v)-log2(1+1)
    d0 = (math.log2(n + v) - math.log2(4) + math.log2(5) - math.log2(3)
          + math.log2(4) - math.log2(2)) / 3
    d1 = (math.log2(n + v) - math.log2(4) + math.log2(5) - math.log2(3)) / 2
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 2
    assert out[0]["lm_bits"] == pytest.approx(round(d0, 6), abs=1e-9)
    assert out[1]["lm_bits"] == pytest.approx(round(d1, 6), abs=1e-9)


def test_empty_docs_excluded(ray_session):
    out = lm_perplexity(_ds(["x y", "", "   \n\t "])).take_all()
    assert sorted(r["doc_id"] for r in out) == [0]


def test_heldout_unseen_grams(ray_session):
    counts = train_bigram_counts(_ds(["a b a b"])).materialize()
    out = score_perplexity(_ds(["z q"]), counts).take_all()
    n, v = 4.0, 2.0
    want = (math.log2(n + v) - math.log2(1)       # unseen unigram: c=0
            + math.log2(0 + v) - math.log2(1)) / 2  # unseen prev + bigram
    assert out[0]["lm_bits"] == pytest.approx(round(want, 6), abs=1e-9)


def test_min_count_prunes_bigrams_not_unigrams(ray_session):
    counts = train_bigram_counts(_ds(["a b a", "a b"]), min_count=2)
    rows = {(r["w1"], r["w2"]): r["c"] for r in counts.take_all()}
    assert ("b", "a") not in rows          # c=1 pruned
    assert rows[("a", "b")] == 2           # c=2 kept
    assert rows[("b", "")] == 2            # unigrams always kept


def test_broadcast_and_join_regimes_agree(ray_session):
    import ray.data as rd
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).limit(120)
    counts = train_bigram_counts(docs).materialize()
    bro = {r["doc_id"]: r for r in
           score_perplexity(docs, counts,
                            broadcast_limit=10**9).take_all()}
    joi = {r["doc_id"]: r for r in
           score_perplexity(docs, counts, broadcast_limit=0).take_all()}
    assert set(bro) == set(joi) and len(bro) > 100
    for k in bro:
        assert bro[k]["n_tokens"] == joi[k]["n_tokens"]
        assert bro[k]["lm_bits"] == pytest.approx(joi[k]["lm_bits"],
                                                  abs=2e-6)


def test_scores_are_finite_and_plausible(ray_session):
    import ray.data as rd
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).limit(200)
    out = lm_perplexity(docs).take_all()
    bits = np.array([r["lm_bits"] for r in out])
    assert np.isfinite(bits).all()
    assert (bits > 0).all() and (bits < 32).all()


def test_dsir_hand_computation(ray_session):
    from corenlp_ray.ops.lm import dsir_logratio
    raw = _ds(["a b", "c c"])
    target = _ds(["a b"])
    out = {r["doc_id"]: r for r in dsir_logratio(raw, target).take_all()}
    # target: ct(a)=ct(b)=1, Nt=2, Vt=2; raw: cr(a)=cr(b)=1, cr(c)=2,
    # Nr=4, Vr=3
    def bits(ct, cr):
        return ((math.log2(ct + 1) - math.log2(2 + 2))
                - (math.log2(cr + 1) - math.log2(4 + 3)))
    d0 = (bits(1, 1) + bits(1, 1)) / 2
    d1 = (bits(0, 2) + bits(0, 2)) / 2
    assert out[0]["dsir_bits"] == pytest.approx(round(d0, 6), abs=1e-9)
    assert out[1]["dsir_bits"] == pytest.approx(round(d1, 6), abs=1e-9)
    assert out[0]["dsir_bits"] > 0 > out[1]["dsir_bits"]


def test_dsir_target_docs_score_higher(ray_session):
    import ray.data as rd
    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text", "lang"])
    langs = {r["doc_id"]: r["lang"] for r in
             docs.select_columns(["doc_id", "lang"]).take_all()}
    from corenlp_ray.ops.lm import dsir_logratio
    out = dsir_logratio(
        docs.select_columns(["doc_id", "text"]),
        docs.filter(expr="lang == 'en'")
            .select_columns(["doc_id", "text"])).take_all()
    en = [r["dsir_bits"] for r in out if langs[r["doc_id"]] == "en"]
    rest = [r["dsir_bits"] for r in out if langs[r["doc_id"]] != "en"]
    assert np.mean(en) > np.mean(rest)


def test_pmi_collocations_hand_computed(ray_session):
    import math

    import pyarrow as pa
    import ray

    from corenlp_ray.ops.lm import pmi_collocations

    # corpus: "a b" x3, "a c" x1 → N=8 tokens, Nb=4 bigrams
    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["a b", "a b", "a b", "a c"]})
    ds = ray.data.from_arrow(t).repartition(3)
    out = pmi_collocations(ds, min_count=1).to_pandas()
    out = out.set_index(["w1", "w2"]).sort_index()
    ab = out.loc[("a", "b")]
    assert int(ab.c12) == 3 and int(ab.c1) == 4 and int(ab.c2) == 3
    want = round(math.log((3.0 * 8.0 * 8.0) / (4.0 * 4.0 * 3.0)), 6)
    assert abs(ab.pmi - want) < 1e-9
    ac = out.loc[("a", "c")]
    assert int(ac.c12) == 1 and int(ac.c2) == 1


def test_pmi_collocations_partition_invariant(ray_session):
    import pyarrow as pa
    import ray

    from corenlp_ray.ops.lm import pmi_collocations

    texts = [f"w{i % 7} w{(i + 1) % 7} w{i % 3}" for i in range(60)]
    t = pa.table({"doc_id": list(range(60)), "text": texts})

    def run(parts):
        ds = ray.data.from_arrow(t).repartition(parts)
        return (pmi_collocations(ds, min_count=2).to_pandas()
                .sort_values(["w1", "w2"], ignore_index=True)
                .values.tolist())

    assert run(2) == run(9)


def test_pmi_broadcast_and_bucketed_regimes_identical(ray_session,
                                                      monkeypatch):
    import pyarrow as pa
    import ray

    import corenlp_ray.ops.lm as lm

    texts = [f"w{i % 5} w{(i + 1) % 5} w{i % 3} w{(i + 2) % 7}"
             for i in range(80)]
    t = pa.table({"doc_id": list(range(80)), "text": texts})

    def run():
        ds = ray.data.from_arrow(t).repartition(5)
        return (lm.pmi_collocations(ds, min_count=2).to_pandas()
                .sort_values(["w1", "w2"], ignore_index=True)
                .values.tolist())

    broadcast = run()
    monkeypatch.setattr(lm, "_PMI_BROADCAST_VOCAB_MAX", 0)
    bucketed = run()
    assert broadcast == bucketed and len(broadcast) > 0
