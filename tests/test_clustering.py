"""Distributed k-means (ops/clustering.py). The planted catalog oracle
(kmeans_planted) value-hashes the pipeline on analytic geometry; here
we pin the numerics (init, means, empty-cluster guard), block-layout
invariance, and recovery of the ground-truth ``label`` clusters on the
real embeddings table.
"""
import numpy as np
import pyarrow as pa
import pytest

from corenlp_ray.ops.clustering import kmeans, kmeans_assignments

SF = "/root/testdata/sf0.001"


def _ds(ids, vecs, parallelism=2):
    import ray.data as rd
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float64()))})
    return rd.from_arrow(t).repartition(parallelism)


def test_two_blob_recovery_and_centroid_means(ray_session):
    # blob A around (0,0): ids 0,2,4 ; blob B around (10,10): ids 1,3,5
    ids = [0, 1, 2, 3, 4, 5]
    vecs = [[0.0, 0.0], [10.0, 10.0], [1.0, 0.0],
            [11.0, 10.0], [0.0, 1.0], [10.0, 11.0]]
    asg, cents = kmeans(_ds(ids, vecs), k=2, iterations=3)
    got = {r["vec_id"]: r["cluster"] for r in asg.take_all()}
    # init = vectors of ids 0 and 1 → cluster 0 = blob A, 1 = blob B
    assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}
    np.testing.assert_allclose(cents[0], [1 / 3, 1 / 3])
    np.testing.assert_allclose(cents[1], [31 / 3, 31 / 3])


def test_block_layout_invariance(ray_session):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 4))
    vecs[30:] += 8.0
    ids = list(range(60))
    a = {r["vec_id"]: r["cluster"] for r in kmeans_assignments(
        _ds(ids, vecs.tolist(), parallelism=1), k=3, iterations=2)
        .take_all()}
    b = {r["vec_id"]: r["cluster"] for r in kmeans_assignments(
        _ds(ids, vecs.tolist(), parallelism=7), k=3, iterations=2)
        .take_all()}
    assert a == b


def test_empty_cluster_keeps_centroid(ray_session):
    # k=3 but only two distinct points: centroid 2 starts on a
    # duplicate of point 1's position and must survive the rounds
    ids = [0, 1, 2, 3]
    vecs = [[0.0], [5.0], [5.0], [0.1]]
    asg, cents = kmeans(_ds(ids, vecs), k=3, iterations=2)
    got = {r["vec_id"]: r["cluster"] for r in asg.take_all()}
    # ties at distance 0 break to the lowest cluster index → cluster 2
    # (init = vec of id 2, same position as id 1's centroid) stays empty
    assert got[1] == 1 and got[2] == 1
    assert cents.shape == (3, 1) and cents[2][0] == 5.0


def test_real_embeddings_deterministic_and_complete(ray_session):
    # the testdata embeddings are near-uniform unit vectors (within-
    # label mean cosine ~0.02), so there is no recoverable ground truth;
    # pin instead that the real-table run is complete, in-range, and
    # byte-identical across block layouts (the cluster-size-invariance
    # property the planted oracle also pins)
    import ray.data as rd
    base = rd.read_parquet(f"{SF}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    a = {r["vec_id"]: r["cluster"] for r in
         kmeans_assignments(base, k=8, iterations=2).take_all()}
    b = {r["vec_id"]: r["cluster"] for r in
         kmeans_assignments(base.repartition(13), k=8,
                            iterations=2).take_all()}
    assert a == b and len(a) == 500
    assert set(a.values()) <= set(range(8))


def test_semantic_dedup_groups_and_singletons(ray_session):
    from corenlp_ray.ops.clustering import semantic_dedup
    # two near-dup pairs + two singletons; k=2 fences them apart
    vecs = [[1.0, 0.0, 0.0], [0.999, 0.01, 0.0],   # group rep 0
            [0.0, 1.0, 0.0], [0.0, 0.999, 0.02],    # group rep 2
            [0.7, 0.7, 0.1], [-1.0, 0.0, 0.0]]      # singletons
    ds = _ds(list(range(6)), vecs, parallelism=3)
    out = {r["vec_id"]: r["dup_group"] for r in
           semantic_dedup(ds, k=2, threshold=0.995).take_all()}
    assert out[0] == 0 and out[1] == 0
    assert out[2] == 2 and out[3] == 2
    assert out[5] == 5  # opposite direction: cosine −1, never a dup


def test_semantic_dedup_no_dups(ray_session):
    from corenlp_ray.ops.clustering import semantic_dedup
    vecs = np.eye(4).tolist()
    out = {r["vec_id"]: r["dup_group"] for r in
           semantic_dedup(_ds(list(range(4)), vecs), k=2,
                          threshold=0.9).take_all()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_pairwise_cap_logs_dropped(ray_session, caplog):
    import logging

    from corenlp_ray.ops import clustering
    from corenlp_ray.ops.clustering import _cluster_dup_labels
    old = clustering.MAX_PAIRWISE
    clustering.MAX_PAIRWISE = 4
    try:
        g = pa.table({
            "vec_id": pa.array(list(range(10)), pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * 10,
                                  pa.list_(pa.float64()))})
        before = clustering.DROPPED_PAIRS.get("semantic_dedup", 0)
        with caplog.at_level(logging.WARNING,
                             logger="corenlp_ray.ops.clustering"):
            labels = _cluster_dup_labels(g, 0.99, "vec_id", "embedding")
        dropped = clustering.DROPPED_PAIRS["semantic_dedup"] - before
        # 45 total pairs − (4·3/2 + 4·3/2 + 2·1/2) within-chunk = 32
        assert dropped == 32
        assert "skipped" in caplog.text
        # chunked fallback: one dup group per chunk
        assert labels.column("dup_group").to_pylist() == [
            0, 0, 0, 0, 4, 4, 4, 4, 8, 8]
    finally:
        clustering.MAX_PAIRWISE = old
