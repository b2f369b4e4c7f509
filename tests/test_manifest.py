"""Lineage manifests + resumable writes (the noClobber analogue)."""
import json
import os

import pyarrow.parquet as pq
import pytest

from corenlp_ray.state.manifest import (Manifest, input_fingerprint,
                                        kg_job, write_partitioned_resumable)


def test_fingerprint_changes_with_input(tmp_path):
    f = tmp_path / "a.parquet"
    f.write_bytes(b"xx")
    fp1 = input_fingerprint([str(f)], {"k": 1})
    fp2 = input_fingerprint([str(f)], {"k": 2})
    assert fp1 != fp2
    f.write_bytes(b"yyy")
    assert input_fingerprint([str(f)], {"k": 1}) != fp1


def test_manifest_roundtrip(tmp_path):
    m = Manifest(str(tmp_path / "out"))
    assert not m.complete(3, "fp")
    m.mark(3, "fp", 42)
    assert m.complete(3, "fp")
    assert not m.complete(3, "other")
    assert m.entries()[0]["rows"] == 42


def test_resumable_write_skips_complete(ray_session, tmp_path):
    import ray.data as rd

    calls = []

    def factory(missing):
        calls.append(sorted(missing))
        rows = [{"subj_bucket": b, "v": i} for b in missing
                for i in range(3)]
        return rd.from_items(rows)

    out = str(tmp_path / "kg")
    fp = "fp1"
    r1 = write_partitioned_resumable(factory, out, 4, fp)
    assert r1["written"] == 4 and r1["skipped"] == 0
    assert r1["metrics"]["rows"] == 12    # per-partition metrics sidecar
    r2 = write_partitioned_resumable(factory, out, 4, fp)
    assert r2 == {"written": 0, "skipped": 4}
    assert calls == [[0, 1, 2, 3]]  # factory not called on full resume
    # partial invalidation: delete one manifest entry
    os.remove(os.path.join(out, "_manifest", "2.json"))
    r3 = write_partitioned_resumable(factory, out, 4, fp)
    assert r3["written"] == 1 and r3["skipped"] == 3
    assert calls[-1] == [2]
    # new fingerprint invalidates everything
    r4 = write_partitioned_resumable(factory, out, 4, "fp2")
    assert r4["written"] == 4 and r4["skipped"] == 0


def test_kg_job_end_to_end_resume(ray_session, tmp_path):
    out = str(tmp_path / "kgjob")
    r1 = kg_job("/root/testdata/sf0.001", out, num_buckets=4)
    assert r1["written"] == 4
    # data landed partitioned and readable
    import pyarrow.dataset as pads

    tbl = pads.dataset(out + "/subj_bucket=0").to_table()
    assert tbl.num_rows >= 0
    total = sum(e["rows"] for e in Manifest(out).entries())
    assert total > 0
    # second run is a no-op
    r2 = kg_job("/root/testdata/sf0.001", out, num_buckets=4)
    assert r2 == {"written": 0, "skipped": 4}
