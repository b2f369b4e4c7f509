"""Round-3 ADVICE + VERDICT regression pins.

Covers: Mc/Mac truecase lexicon gate, non-projective training rows,
geo_subtype canonical country surfaces, hopping-window size/hop
validation, NER leading-title gate on ORG runs, coref incremental
cluster maps (behavior-preserving), vectorized partitioner parity.
"""
import pandas as pd
import pyarrow as pa
import pytest

from corenlp_ray.stages.misc_annotators import truecase_word
from corenlp_ray.models.transition_parser import TransitionParser
from corenlp_ray.functions.lexicon import geo_subtype
from corenlp_ray.stages.ner import ner_sentence


# ---------------------------------------------------------- truecase ----

def test_mac_rule_spares_common_words():
    # round-3 ADVICE (high): prefix rule corrupted dictionary words
    assert truecase_word("machine", False) == "machine"
    assert truecase_word("mackerel", False) == "mackerel"
    assert truecase_word("macros", False) == "macros"
    assert truecase_word("macabre", False) == "macabre"


def test_mc_mac_surnames_still_capitalize():
    assert truecase_word("mcvey", False) == "McVey"       # reference itest
    assert truecase_word("mcdonald", False) == "McDonald"
    assert truecase_word("macarthur", False) == "MacArthur"
    assert truecase_word("macleod", False) == "MacLeod"


# --------------------------------------------- transition parser train ----

def test_train_survives_non_projective_gold():
    # round-3 ADVICE (medium): IndexError buf.pop on non-projective trees
    words = ["a", "b", "c", "d"]
    tags = ["DT", "NN", "VB", "NN"]
    heads = [3, 4, 0, 3]          # arcs (1,3) and (2,4) cross
    labels = ["dep"] * 4
    proj = (["x", "y"], ["NN", "VB"], [2, 0], ["nsubj", "root"])
    p = TransitionParser.train([(words, tags, heads, labels), proj],
                               n_iter=2)
    assert p.weights   # trained on the projective row, didn't crash


def test_oracle_never_shifts_empty_buffer():
    from corenlp_ray.models.transition_parser import (_Config,
                                                      _oracle_action)
    c = _Config(2)
    c.stack = [0, 1, 2]
    c.buf = []
    act = _oracle_action(c, [0, 2, 1], ["", "root", "dep"])
    assert act != "S"


# ----------------------------------------------------------- geo subtype ----

def test_geo_subtype_canonical_country_surfaces():
    # round-3 ADVICE (low): 'the United States' fell through to 'city'
    assert geo_subtype("the United States") == "country"
    assert geo_subtype("U.S.A.") == "country"
    assert geo_subtype("United States of America") == "country"
    assert geo_subtype("Great Britain") == "country"
    assert geo_subtype("California") == "state"
    assert geo_subtype("Springfield") == "city"


# ------------------------------------------------------- hopping window ----

def test_hopping_window_rejects_non_multiple_size(ray_session):
    import ray.data as rd

    from corenlp_ray.ops.windows import hopping_window

    ds = rd.from_items([{"user_id": 1,
                         "ts": pd.Timestamp("2024-01-01 00:10:00"),
                         "value": 1.0}])
    with pytest.raises(ValueError):
        hopping_window(ds, size_minutes=45, hop_minutes=30)


# ------------------------------------------------------- NER title gate ----

def _tags_for(sent):
    out = []
    for w in sent:
        if w == ".":
            out.append(".")
        elif w in ("makes", "is", "spoke", "waved", "arrived"):
            out.append("VBZ")
        elif w[:1].isupper():
            out.append("NNP")
        else:
            out.append("NN")
    return out


def test_title_not_stripped_from_org_run():
    sent = ["General", "Dynamics", "Land", "Systems", "makes", "tanks", "."]
    _, mentions = ner_sentence(sent, _tags_for(sent))
    assert (0, 4, "ORGANIZATION", "General Dynamics Land Systems") \
        in mentions


def test_title_still_stripped_from_person_run():
    sent = ["President", "Obama", "spoke", "."]
    _, mentions = ner_sentence(sent, _tags_for(sent))
    assert (1, 2, "PERSON", "Obama") in mentions


def test_geo_feature_run_keeps_leading_title_word():
    sent = ["Prince", "Edward", "Island", "is", "pretty", "."]
    _, mentions = ner_sentence(sent, _tags_for(sent))
    assert (0, 3, "LOCATION", "Prince Edward Island") in mentions


# ------------------------------------------------- vectorized partitioner ----

def test_partition_codes_consistent_for_equal_keys():
    from corenlp_ray.ops._partition import partition_codes

    t1 = pa.table({"k": ["a", "b", "a", "c"], "v": [1, 2, 3, 4]})
    t2 = pa.table({"k": ["c", "a", "b"], "x": [9.0, 8.0, 7.0]})
    p1 = partition_codes(t1, ["k"], 16).to_pylist()
    p2 = partition_codes(t2, ["k"], 16).to_pylist()
    by_key_1 = dict(zip(t1.column("k").to_pylist(), p1))
    by_key_2 = dict(zip(t2.column("k").to_pylist(), p2))
    for k in ("a", "b", "c"):
        assert by_key_1[k] == by_key_2[k]
    assert by_key_1["a"] == p1[2]  # same key, same batch → same partition


def test_partition_codes_multi_column_and_empty():
    from corenlp_ray.ops._partition import partition_codes

    t = pa.table({"a": [1, 1, 2], "b": ["x", "x", "y"]})
    p = partition_codes(t, ["a", "b"], 8).to_pylist()
    assert p[0] == p[1]
    assert all(0 <= x < 8 for x in p)
    empty = pa.table({"a": pa.array([], type=pa.int64())})
    assert partition_codes(empty, ["a"], 8).to_pylist() == []
