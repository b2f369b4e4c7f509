"""Shared mutable entity index (raw-actor state; ids consistent across
batches and workers)."""


def test_entity_index_stable_ids(ray_session):
    from corenlp_ray.state.entity_index import EntityIndex

    idx = EntityIndex(num_shards=2)
    a = idx.assign_batch(["Obama", "IBM", "Paris"])
    b = idx.assign_batch(["IBM", "Obama", "Hooli"])
    assert a[0] == b[1] and a[1] == b[0]  # same surface → same id
    assert len({*a, b[2]}) == 4           # distinct surfaces → distinct ids
    assert idx.total() == 4


def test_with_entity_ids_on_kg(ray_session):
    import ray.data as rd

    from corenlp_ray.state.entity_index import with_entity_ids

    rows = [
        {"subj": "Obama", "pred": "per:employee_of", "obj": "IBM"},
        {"subj": "IBM", "pred": "org:parents", "obj": "Hooli"},
        {"subj": "Obama", "pred": "per:cities_of_residence", "obj": "Paris"},
    ]
    ds, idx = with_entity_ids(rd.from_items(rows), num_shards=2)
    out = ds.take_all()
    ids = {}
    for r in out:
        ids.setdefault(r["subj"], set()).add(r["subj_id"])
        ids.setdefault(r["obj"], set()).add(r["obj_id"])
    # each surface has exactly one id, across subject and object positions
    assert all(len(v) == 1 for v in ids.values())
    assert len({next(iter(v)) for v in ids.values()}) == len(ids)
