"""HyperLogLog registers and Bloom-filter membership
(ops/sketches.py): combiner shapes, md5-u64 parity with the DuckDB
mirrors, exact false-positive reproduction, estimate accuracy."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from corenlp_ray.ops.sketches import (bloom_build, bloom_probe,
                                      bloom_probe_sql, hll_estimate,
                                      hll_partial_batch, hll_registers,
                                      hll_registers_sql, md5_u64,
                                      md5_u64_sql)


def test_md5_u64_matches_duckdb():
    vals = ["", "a", "hello world", "ünïcødé", "x" * 500]
    mine = md5_u64(vals)
    con = duckdb.connect()
    con.register("vals", pa.table({"v": pa.array(vals, pa.string())}))
    want = [r[0] for r in con.execute(
        f"SELECT {md5_u64_sql('v')} FROM vals").fetchall()]
    assert mine.tolist() == want


def test_hll_partial_is_a_combiner():
    # registers of a concatenation == elementwise max of the parts
    a = pa.table({"text": [f"doc {i}" for i in range(50)]})
    b = pa.table({"text": [f"doc {i}" for i in range(25, 90)]})
    both = pa.table({"text": [f"doc {i}" for i in range(90)]})

    def regs(t):
        p = hll_partial_batch(t, p=6)
        r = np.zeros(64, dtype=np.int64)
        r[p.column("bucket").to_numpy()] = p.column("max_rho").to_numpy()
        return r

    assert (np.maximum(regs(a), regs(b)) == regs(both)).all()


def test_hll_registers_and_estimate(ray_session):
    import ray.data as rd

    n = 3000
    tbl = pa.table({"text": [f"value {i}" for i in range(n)]})
    regs = hll_registers(rd.from_arrow(tbl).repartition(7),
                         p=8).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(hll_registers_sql("t", "text", p=8)).fetchdf()
    pd.testing.assert_frame_equal(
        regs.sort_values("bucket", ignore_index=True),
        want.sort_values("bucket", ignore_index=True), check_dtype=False)
    est = hll_estimate(regs, p=8)
    assert abs(est - n) / n < 0.15  # ~1.04/sqrt(256) ≈ 6.5% std error


def test_bloom_exact_membership_and_fp_parity(ray_session):
    import ray.data as rd

    corpus = pa.table({"doc_id": pa.array(range(0, 400, 2), pa.int64()),
                       "text": [f"member {i}" for i in range(200)]})
    probes = pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "text": ([f"member {i}" for i in range(200)]
                 + [f"novel {i}" for i in range(200)])})
    m, k = 256, 3  # tiny filter → false positives guaranteed
    pos = bloom_build(rd.from_arrow(corpus), m=m, k=k)
    out = (bloom_probe(rd.from_arrow(probes), pos, m=m, k=k)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    # no false negatives, ever
    assert (out["bloom_hit"][:200] == 1).all()
    # false positives exist at this density and match the exact recompute
    bits = np.zeros(m, dtype=bool)
    h = md5_u64([f"member {i}" for i in range(200)])
    lo, hi = (h & np.uint64(0xFFFFFFFF)).astype(np.int64), \
        (h >> np.uint64(32)).astype(np.int64)
    for i in range(k):
        bits[(lo + i * hi) % m] = True
    hn = md5_u64([f"novel {i}" for i in range(200)])
    ln, hnn = (hn & np.uint64(0xFFFFFFFF)).astype(np.int64), \
        (hn >> np.uint64(32)).astype(np.int64)
    expect = np.ones(200, dtype=bool)
    for i in range(k):
        expect &= bits[(ln + i * hnn) % m]
    assert out["bloom_hit"][200:].to_numpy().astype(bool).tolist() \
        == expect.tolist()
    assert expect.any()  # the FP path is genuinely exercised


def test_count_min_matches_exact_and_estimates(ray_session):
    import ray.data as rd

    from corenlp_ray.ops.sketches import (cms_estimate, count_min,
                                          count_min_sql)

    # heavy hitter 'en' ×300, tail values ×1 each
    vals = ["en"] * 300 + [f"tail {i}" for i in range(100)]
    tbl = pa.table({"text": pa.array(vals, pa.string())})
    grid = count_min(rd.from_arrow(tbl).repartition(9),
                     d=4, w=128).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(count_min_sql("t", "text", d=4, w=128)).fetchdf()
    key = ["row", "cell"]
    pd.testing.assert_frame_equal(
        grid.sort_values(key, ignore_index=True),
        want.sort_values(key, ignore_index=True), check_dtype=False)
    # point estimates: never under the true count, heavy hitter ≈ exact
    est = cms_estimate(grid, ["en", "tail 0", "absent"], d=4, w=128)
    assert est[0] >= 300 and est[0] <= 300 + 100  # overcount ≤ εN
    assert est[1] >= 1
    # grid total mass = d × corpus size (conservation under the shuffle)
    assert int(grid["n"].sum()) == 4 * len(vals)


def test_hll_by_key_matches_sql_and_merges(ray_session):
    import ray.data as rd

    from corenlp_ray.ops.sketches import (hll_estimate, hll_registers_by,
                                          hll_registers_by_sql)

    vals = [("a", f"x{i}") for i in range(400)] \
        + [("b", f"x{i}") for i in range(50)]   # b's values ⊂ a's
    tbl = pa.table({"k": [k for k, _ in vals],
                    "text": [v for _, v in vals]})
    regs = hll_registers_by(rd.from_arrow(tbl).repartition(7),
                            key="k", p=8).to_pandas()
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        hll_registers_by_sql("t", "k", "text", p=8)).fetchdf()
    key = ["k", "bucket"]
    pd.testing.assert_frame_equal(
        regs.sort_values(key, ignore_index=True),
        want.sort_values(key, ignore_index=True), check_dtype=False)
    # per-key estimates land in the p=8 error band
    for k, true in (("a", 400), ("b", 50)):
        est = hll_estimate(regs[regs["k"] == k], p=8)
        assert abs(est - true) / true < 0.2


def test_md5_u64_sql_null_parity():
    """md5_u64 hashes None as '' — the SQL mirror COALESCEs so a null
    row lands in the same bucket instead of dropping (advisor r4)."""
    import numpy as np

    from corenlp_ray.ops.sketches import md5_u64, md5_u64_sql

    vals = ["a", None, "", "xyz"]
    py = md5_u64(vals)
    import duckdb

    rows = duckdb.connect().execute(
        f"SELECT {md5_u64_sql('v')} FROM "
        "(SELECT unnest(?::VARCHAR[]) AS v)", [vals]).fetchall()
    assert py.tolist() == [int(r[0]) for r in rows]


def test_hll_registers_by_null_keys(ray_session):
    """A null group key must stay its own register set, matching the
    SQL mirror's GROUP BY NULL-keeping semantics (advisor r4)."""
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.sketches import hll_registers_by

    ds = rd.from_arrow(pa.table({
        "lang": ["en", None, "en", None],
        "text": ["a", "b", "c", "d"]}))
    out = hll_registers_by(ds, key="lang", col="text", p=4).to_pandas()
    langs = set(out["lang"].where(out["lang"].notna(), None))
    assert None in langs and "en" in langs
    # null-key group carries its own (distinct) registers
    assert (out["lang"].isna().sum()) == 2
