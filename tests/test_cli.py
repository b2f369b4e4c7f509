"""CLI driver (python -m corenlp_ray) — the ray job submit surface."""
import json
import subprocess
import sys


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "corenlp_ray", *args],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": "/root/repo",
             "HOME": "/root", "RAY_ADDRESS": "local"})


def test_cli_kg_and_resume(tmp_path):
    out = str(tmp_path / "kg")
    r = run_cli("kg", "--sf-dir", "/root/testdata/sf0.001", "--out", out,
                "--num-buckets", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["written"] == 4
    r2 = run_cli("kg", "--sf-dir", "/root/testdata/sf0.001", "--out", out,
                 "--num-buckets", "4")
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2 == {"job": "kg", "out": out, "written": 0, "skipped": 4}


def test_cli_query(tmp_path):
    r = run_cli("query", "--name", "lang_counts", "--sf-dir",
                "/root/testdata/sf0.001", "--limit", "10")
    assert r.returncode == 0, r.stderr[-2000:]
    rows = [json.loads(l) for l in r.stdout.strip().splitlines()]
    assert any(row["lang"] == "en" for row in rows)


def test_cli_unknown_query():
    r = run_cli("query", "--name", "nope", "--sf-dir", "/root/testdata/sf0.001")
    assert r.returncode == 2
    assert "unknown query" in r.stderr


def test_train_cli_pos(tmp_path):
    import json
    import subprocess
    import sys

    out = str(tmp_path / "pos.json")
    r = subprocess.run(
        [sys.executable, "-m", "corenlp_ray", "train", "--model", "pos",
         "--out", out, "--distill-sf-dir", "/root/testdata/sf0.001",
         "--n-iter", "2", "--limit-docs", "20"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    payload = json.loads(r.stdout.strip().splitlines()[-1])
    assert payload["model"] == "pos" and payload["n_features"] > 0
    from corenlp_ray.models.perceptron_tagger import PerceptronTagger

    m = PerceptronTagger.load(out)
    assert m.tag(["The", "dog", "ran", "."])


def test_cli_annotate_annotators_and_xml(tmp_path):
    out = str(tmp_path / "xml")
    r = run_cli("annotate", "--sf-dir", "/root/testdata/sf0.001",
                "--out", out, "--annotators",
                "tokenize,ssplit,pos,lemma,ner",
                "--output-format", "xml")
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res == {"job": "annotate-xml", "docs": 500}
    import os
    import xml.etree.ElementTree as ET

    f = os.path.join(out, os.listdir(out)[0])
    first = open(f).read().split(
        '<?xml version="1.0" encoding="UTF-8"?>')[1]
    root = ET.fromstring(first)
    assert root.find("./document/sentences/sentence/tokens/token/POS") \
        is not None
    # depparse was NOT requested: no dependencies element
    assert root.find("./document/sentences/sentence/dependencies") is None


def test_train_cli_crf_and_relation(tmp_path):
    crf = str(tmp_path / "crf.json")
    r = run_cli("train", "--model", "crf-ner", "--out", crf,
                "--distill-sf-dir", "/root/testdata/sf0.001",
                "--n-iter", "3", "--limit-docs", "15")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["n_features"] > 0
    from corenlp_ray.models.crf_ner import CrfNER

    assert CrfNER.load(crf).tags
    rel = str(tmp_path / "rel.json")
    r = run_cli("train", "--model", "relation", "--out", rel,
                "--distill-sf-dir", "/root/testdata/sf0.001",
                "--n-iter", "3", "--limit-docs", "30")
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1])["n_classes"] >= 2
