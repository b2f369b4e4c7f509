"""Unit tests for ops/graph.pagerank — cases the full-chain
pagerank_planted oracle (tests/test_query_catalog.py) doesn't isolate."""
import collections

import numpy as np
import pyarrow as pa

from corenlp_ray.ops.graph import pagerank


def _manual(edges, iters=3, d=0.85):
    E = sorted(set(edges))
    V = sorted({x for e in E for x in e})
    outdeg = collections.Counter(e[0] for e in E)
    r = {v: 1.0 / len(V) for v in V}
    for _ in range(iters):
        nr = {v: (1 - d) / len(V) for v in V}
        for s, t in E:
            nr[t] += d * r[s] / outdeg[s]
        r = nr
    return r


def _run(edges, ray_unused, **kw):
    import ray.data as rd

    tbl = pa.table({"subj": [e[0] for e in edges],
                    "obj": [e[1] for e in edges]})
    df = pagerank(rd.from_arrow(tbl), **kw).to_pandas()
    return dict(zip(df["node"], df["rank"]))


def test_pagerank_matches_manual(ray_session):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
             ("d", "c"), ("a", "b")]  # includes a parallel edge
    got = _run(edges, ray_session)
    want = _manual(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9


def test_pagerank_dangling_and_source_only(ray_session):
    # b has no out-edges (dangling: mass leaks); a has no in-edges
    got = _run([("a", "b")], ray_session, iterations=2)
    want = _manual([("a", "b")], iters=2)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    # a only ever receives the base term
    assert abs(got["a"] - 0.15 / 2) < 1e-12


def test_pagerank_mass_bounded(ray_session):
    # ring: no dangling nodes -> total mass conserved at 1.0
    edges = [(str(i), str((i + 1) % 10)) for i in range(10)]
    got = _run(edges, ray_session, iterations=4)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # symmetric ring -> uniform ranks
    assert np.allclose(list(got.values()), 0.1)


def test_pagerank_block_layout_invariant(ray_session):
    import ray.data as rd

    edges = [(f"n{i % 17}", f"n{(i * 7) % 17}") for i in range(200)
             if i % 17 != (i * 7) % 17]
    tbl = pa.table({"subj": [e[0] for e in edges],
                    "obj": [e[1] for e in edges]})
    a = pagerank(rd.from_arrow(tbl)).to_pandas()
    b = pagerank(rd.from_arrow(tbl).repartition(9)).to_pandas()
    ma, mb = dict(zip(a["node"], a["rank"])), dict(zip(b["node"], b["rank"]))
    assert set(ma) == set(mb)
    for v in ma:
        assert abs(ma[v] - mb[v]) < 1e-12


def test_triangle_count_k4_with_noise(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.graph import triangle_count

    # K4 on a,b,c,d (every node in 3 triangles) + a pendant edge d-e,
    # plus duplicate / reversed / self edges that must all collapse
    edges = pa.table({
        "subj": ["a", "a", "a", "b", "b", "c", "d", "c", "a", "e"],
        "obj":  ["b", "c", "d", "c", "d", "d", "e", "b", "a", "e"]})
    out = (triangle_count(rd.from_arrow(edges)).to_pandas()
           .sort_values("node", ignore_index=True))
    assert out["node"].tolist() == ["a", "b", "c", "d"]
    assert out["n_tri"].tolist() == [3, 3, 3, 3]


def test_triangle_count_triangle_free(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.ops.graph import triangle_count

    # C4 is triangle-free
    edges = pa.table({"subj": ["a", "b", "c", "d"],
                      "obj": ["b", "c", "d", "a"]})
    assert triangle_count(rd.from_arrow(edges)).count() == 0


def test_khop_shortest_hops_and_cycles(ray_session):
    import pyarrow as pa
    import ray

    from corenlp_ray.ops.graph import khop_reachability

    # a->b->c->a cycle plus shortcut a->c and tail c->d
    t = pa.table({"subj": ["a", "b", "c", "a", "c"],
                  "obj":  ["b", "c", "a", "c", "d"]})
    ds = ray.data.from_arrow(t).repartition(3)
    out = khop_reachability(ds, k=3).to_pandas()
    got = {(r.src, r.dst): r.hops for r in out.itertuples()}
    assert got[("a", "b")] == 1 and got[("a", "c")] == 1
    assert got[("a", "d")] == 2          # via the shortcut, not the cycle
    assert got[("b", "a")] == 2 and got[("b", "d")] == 2
    assert got[("a", "a")] == 2          # a->c->a beats the 3-cycle
    assert got[("c", "c")] == 2
    assert ("d", "a") not in got         # d is a sink


def test_khop_early_exit_on_saturation(ray_session):
    import pyarrow as pa
    import ray

    from corenlp_ray.ops.graph import khop_reachability

    t = pa.table({"subj": ["a"], "obj": ["b"]})
    ds = ray.data.from_arrow(t)
    out = khop_reachability(ds, k=64).to_pandas()
    assert out.values.tolist() == [["a", "b", 1]]


def test_cooccurrence_edges_counts_distinct_docs(ray_session):
    import pyarrow as pa
    import ray

    from corenlp_ray.ops.graph import cooccurrence_edges

    # doc 1: {x, y, z}; doc 2: {x, y, x-dup}; doc 3: {y}
    t = pa.table({
        "doc_id": [1, 1, 1, 2, 2, 2, 3],
        "surface": ["x", "y", "z", "x", "y", "x", "y"]})
    ds = ray.data.from_arrow(t).repartition(3)
    out = cooccurrence_edges(ds).to_pandas()
    got = {(r.ent_a, r.ent_b): r.n_docs for r in out.itertuples()}
    # the duplicate x mention in doc 2 must not inflate the count
    assert got == {("x", "y"): 2, ("x", "z"): 1, ("y", "z"): 1}
