"""Loader for the reference's real wikidict TSV format
(WikidictAnnotator.java:57-114: text\tlink\tscore, skip leading-tab
lines, score threshold only when > 0, caseless, dup surfaces last-wins).
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tsv_path(tmp_path_factory):
    """Synthetic 1M-row TSV in the reference's link-sorted layout."""
    p = tmp_path_factory.mktemp("wikidict") / "wikidict.tsv"
    rng = np.random.default_rng(7)
    scores = rng.random(1_000_000)
    with open(p, "w", encoding="utf-8") as f:
        f.write("\tskipped_leading_tab\t0.9\n")
        for i in range(1_000_000):
            # sorted by link (the reference's string-reuse assumption)
            f.write(f"surface {i}\tLink_{i // 4}\t{scores[i]:.6f}\n")
        f.write("Dup Key\tFirst_Link\t0.5\n")
        f.write("Dup Key\tSecond_Link\t0.5\n")
    return str(p), scores


def test_load_wikidict_tsv(tsv_path):
    from corenlp_ray.stages.entitylink import load_wikidict_tsv

    path, scores = tsv_path
    d = load_wikidict_tsv(path)
    assert len(d) == 1_000_001            # 1M + Dup Key; tab line skipped
    assert d["surface 12345"] == "Link_3086"
    assert d["Dup Key"] == "Second_Link"  # HashMap.put last-wins
    assert "\tskipped_leading_tab" not in d and "" not in d


def test_load_wikidict_tsv_threshold_and_caseless(tsv_path):
    from corenlp_ray.stages.entitylink import load_wikidict_tsv

    path, scores = tsv_path
    d = load_wikidict_tsv(path, threshold=0.75)
    # compare against the 6-decimal values actually written to the file
    expect = int((np.round(scores, 6) >= 0.75).sum())
    assert len(d) == expect               # both 0.5 Dup Key rows dropped
    d2 = load_wikidict_tsv(path, caseless=True)
    assert "dup key" in d2 and "Dup Key" not in d2


def test_wikidict_tsv_dataset_matches_loader(ray_session, tsv_path):
    from corenlp_ray.stages.entitylink import (load_wikidict_tsv,
                                               wikidict_tsv_dataset)

    path, scores = tsv_path
    ds = wikidict_tsv_dataset(path, threshold=0.75)
    rows = ds.count()
    d = load_wikidict_tsv(path, threshold=0.75)
    # dataset keeps duplicate-surface rows (a join-side concern);
    # row count = loader size + duplicates surviving the threshold
    assert rows == int((np.round(scores, 6) >= 0.75).sum())
    sample = ds.take(5)
    assert all(r["link"].startswith("Link_") for r in sample)
    assert all(d[r["surface"]] == r["link"] for r in sample)


def test_wikidict_dataset_feeds_link_join(ray_session, tsv_path):
    import pyarrow as pa
    import ray.data as rd

    from corenlp_ray.stages.entitylink import (wikidict_link_join,
                                               wikidict_tsv_dataset)

    path, _ = tsv_path
    probe = rd.from_arrow(pa.table(
        {"surface": ["surface 10", "surface 20", "missing"],
         "doc_id": pa.array([1, 2, 3], pa.int64())}))
    out = wikidict_link_join(probe, wikidict_tsv_dataset(path))
    got = {r["surface"]: r["link"] for r in out.take_all()}
    assert got == {"surface 10": "Link_2", "surface 20": "Link_5"}


def test_entity_linker_uses_broadcast_dict(ray_session):
    import pyarrow as pa
    import ray

    from corenlp_ray.stages.entitylink import EntityLinker

    ref = ray.put({"acme corp": "Acme_Corporation"})
    batch = pa.table({
        "tok_word": [["Acme", "Corp", "rose"]],
        "men_begin": [[0]], "men_end": [[2]],
        "men_ner": [["ORGANIZATION"]], "men_norm": [[""]]})
    out = EntityLinker(dict_ref=ref)(batch)
    assert out.column("men_link").to_pylist() == [["Acme_Corporation"]]
