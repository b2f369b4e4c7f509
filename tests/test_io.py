"""CoNLL-U reader/writer + JSON/text outputters."""
import json
import os

import pyarrow as pa

from corenlp_ray.sources.conllu import (docs_from_conllu, parse_conllu,
                                        to_conllu, write_conllu)
from corenlp_ray.sources.outputters import doc_to_json, doc_to_text, write_json
from corenlp_ray.sources.pages import synth_pages_table
from corenlp_ray.stages.ner import ner_batch
from corenlp_ray.stages.pos import pos_batch
from corenlp_ray.stages.depparse import depparse_batch
from corenlp_ray.stages.lemma import lemma_batch
from corenlp_ray.stages.tokenize import tokenize_ssplit_batch

CONLLU = """\
# sent_id = test-1
1\tCats\tcat\tNNS\t_\t_\t2\tnsubj\t_\t_
2\thave\thave\tVBP\t_\t_\t0\troot\t_\t_
3\ttails\ttail\tNNS\t_\t_\t2\tobj\t_\t_
4\t.\t.\t.\t_\t_\t2\tpunct\t_\t_

1\tDogs\tdog\tNNS\t_\t_\t2\tnsubj\t_\t_
2\tbark\tbark\tVBP\t_\t_\t0\troot\t_\t_
"""


def test_parse_conllu():
    row = parse_conllu(CONLLU, "d1")
    assert row["tok_word"] == ["Cats", "have", "tails", ".", "Dogs", "bark"]
    assert row["sent_begin"] == [0, 4]
    assert row["dep_head"][0] == 1      # Cats -> have (doc-level)
    assert row["dep_head"][1] == -1     # root
    assert row["dep_head"][4] == 5      # Dogs -> bark
    assert row["dep_label"][2] == "obj"


def test_conllu_roundtrip():
    row = parse_conllu(CONLLU, "d1")
    rendered = to_conllu(row)
    row2 = parse_conllu(rendered, "d1")
    assert row2["tok_word"] == row["tok_word"]
    assert row2["dep_head"] == row["dep_head"]
    assert row2["dep_label"] == row["dep_label"]


def test_docs_from_conllu_feeds_stages():
    tbl = docs_from_conllu([CONLLU])
    # OpenIE directly over gold trees (the reference's decoupling trick)
    from corenlp_ray.stages.openie import extract_sentence_triples

    row = tbl.to_pylist()[0]
    b, e = row["sent_begin"][0], row["sent_end"][0]
    triples = extract_sentence_triples(
        row["tok_word"][b:e], row["tok_pos"][b:e], row["tok_lemma"][b:e],
        [h - b if h >= 0 else -1 for h in row["dep_head"][b:e]],
        row["dep_label"][b:e], [])
    assert ("Cats", "have", "tails") in {(s, p, o) for s, p, o, *_ in triples}


def annotated_row():
    tbl = synth_pages_table(n=2, seed=41)
    out = depparse_batch(lemma_batch(ner_batch(pos_batch(
        tokenize_ssplit_batch(tbl)))))
    return out.to_pylist()[0]


def test_doc_to_json_shape():
    row = annotated_row()
    d = doc_to_json(row)
    assert "sentences" in d and d["sentences"]
    s0 = d["sentences"][0]
    assert s0["tokens"][0]["word"]
    assert "characterOffsetBegin" in s0["tokens"][0]
    assert "basicDependencies" in s0
    assert any(dep["dep"] == "root" for dep in s0["basicDependencies"])
    assert "entitymentions" in d
    json.dumps(d)  # serializable


def test_doc_to_text():
    row = annotated_row()
    t = doc_to_text(row)
    assert "Sentence #1:" in t


def test_write_sinks(ray_session, tmp_path):
    import ray.data as rd

    tbl = synth_pages_table(n=4, seed=43)
    docs = depparse_batch(lemma_batch(ner_batch(pos_batch(
        tokenize_ssplit_batch(tbl)))))
    ds = rd.from_arrow(docs)
    jout = write_json(ds, str(tmp_path / "json")).take_all()
    assert sum(r["docs"] for r in jout) == 4
    files = os.listdir(tmp_path / "json")
    assert files and all(f.endswith(".jsonl") for f in files)
    cout = write_conllu(ds, str(tmp_path / "conllu")).take_all()
    assert sum(r["docs"] for r in cout) == 4


def test_doc_to_conll_columns():
    from corenlp_ray.sources.outputters import doc_to_conll

    row = {"tok_word": ["The", "dog", "ran", "."],
           "tok_lemma": ["the", "dog", "run", "."],
           "tok_pos": ["DT", "NN", "VBD", "."],
           "tok_ner": ["O", "O", "O", "O"],
           "dep_head": [1, 2, -1, 2],
           "dep_label": ["det", "nsubj", "root", "punct"],
           "sent_begin": [0], "sent_end": [4]}
    out = doc_to_conll(row)
    lines = [l for l in out.splitlines() if l]
    assert lines[0].split("\t") == ["1", "The", "the", "DT", "O", "2",
                                    "det"]
    assert lines[2].split("\t") == ["3", "ran", "run", "VBD", "O", "0",
                                    "root"]
    # blank line terminates the sentence
    assert out.endswith("\n\n") or out.endswith("\n")


def test_write_conll_roundtrip(tmp_path, ray_session):
    import glob

    import ray.data as rd

    from corenlp_ray.sources.outputters import write_conll

    row = {"tok_word": ["Hi", "."], "tok_lemma": ["hi", "."],
           "tok_pos": ["UH", "."], "tok_ner": ["O", "O"],
           "dep_head": [-1, 0], "dep_label": ["root", "punct"],
           "sent_begin": [0], "sent_end": [2]}
    out = str(tmp_path / "conll")
    write_conll(rd.from_items([row]), out).take_all()
    files = glob.glob(out + "/*.conll")
    assert files
    content = open(files[0]).read()
    assert content.splitlines()[0].startswith("1\tHi\thi\tUH")


def test_doc_to_xml_shape():
    import xml.etree.ElementTree as ET

    from corenlp_ray.sources.outputters import doc_to_xml

    row = annotated_row()
    x = doc_to_xml(row, triples=[(0, "Cats", "have", "tails", 1.0,
                                  "openie")])
    root = ET.fromstring(x)
    assert root.tag == "root"
    sents = root.findall("./document/sentences/sentence")
    assert sents and sents[0].get("id") == "1"
    tok = sents[0].find("./tokens/token")
    assert tok.get("id") == "1" and tok.find("word").text
    assert tok.find("POS") is not None
    deps = sents[0].find('./dependencies[@type="basic-dependencies"]')
    assert deps is not None
    gov = deps.find("./dep/governor")
    assert gov is not None and gov.get("idx") is not None
    tr = sents[0].find("./openie/triple")
    assert tr is not None and tr.find("subject").text == "Cats"


def test_doc_to_tagged():
    from corenlp_ray.sources.outputters import doc_to_tagged

    row = annotated_row()
    t = doc_to_tagged(row)
    first = t.splitlines()[0].split()[0]
    assert "_" in first  # word_POS


def test_write_xml_roundtrip(tmp_path, ray_session):
    import xml.etree.ElementTree as ET

    import ray.data as rd

    from corenlp_ray.sources.outputters import write_xml

    tbl = synth_pages_table(n=3, seed=47)
    docs = depparse_batch(lemma_batch(ner_batch(pos_batch(
        tokenize_ssplit_batch(tbl)))))
    out = write_xml(rd.from_arrow(docs), str(tmp_path / "xml")).take_all()
    assert sum(r["docs"] for r in out) == 3
    files = os.listdir(tmp_path / "xml")
    assert files and all(f.endswith(".xml") for f in files)
    # every document block parses as XML
    body = open(os.path.join(tmp_path / "xml", files[0])).read()
    for chunk in body.split('<?xml version="1.0" encoding="UTF-8"?>'):
        if chunk.strip():
            ET.fromstring(chunk)


def test_doc_to_inline_xml():
    from corenlp_ray.sources.outputters import doc_to_inline_xml

    row = annotated_row()
    txt = doc_to_inline_xml(row)
    # contiguous entity runs are wrapped; brackets balance
    assert txt.count("<") == txt.count(">")
    for ty in ("PERSON", "ORGANIZATION", "LOCATION"):
        assert txt.count("<%s>" % ty) == txt.count("</%s>" % ty)
