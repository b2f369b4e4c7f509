"""Evaluation-harness tests (models/eval.py — the runnable form of the
reference's POSTaggerBenchmarkITest / NERBenchmarkSlowITest /
DependencyParser accuracy prints) and the CoNLL-2003 / TSV readers."""
import pytest

from corenlp_ray.models.eval import (attachment_scores, span_prf,
                                     token_accuracy)
from corenlp_ray.sources.conll2003 import (parse_conll2003,
                                           read_tsv_tagged)


def test_token_accuracy():
    gold = [["DT", "NN", "VBD"], ["PRP", "VBZ"]]
    pred = [["DT", "NN", "VBZ"], ["PRP", "VBZ"]]
    assert token_accuracy(gold, pred) == pytest.approx(4 / 5)


def test_span_prf_exact_match_semantics():
    gold = [["B-PER", "I-PER", "O", "B-LOC"]]
    pred = [["B-PER", "I-PER", "O", "B-ORG"]]   # wrong type on span 2
    m = span_prf(gold, pred)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1
    assert m["f1"] == pytest.approx(0.5)


def test_span_prf_boundary_mismatch_is_both_fp_and_fn():
    gold = [["B-PER", "I-PER", "O"]]
    pred = [["B-PER", "O", "O"]]                # truncated span
    m = span_prf(gold, pred)
    assert m["tp"] == 0 and m["fp"] == 1 and m["fn"] == 1


def test_span_prf_bare_type_tags():
    # the engine's NER emits bare types (PERSON PERSON O) — same span
    # semantics as IOB with implicit I- prefix
    gold = [["PERSON", "PERSON", "O", "LOCATION"]]
    pred = [["PERSON", "PERSON", "O", "LOCATION"]]
    m = span_prf(gold, pred)
    assert m["f1"] == 1.0 and m["tp"] == 2


def test_attachment_scores():
    gold_h = [[2, 0, 2]]
    pred_h = [[2, 0, 1]]
    gold_l = [["nsubj", "root", "obj"]]
    pred_l = [["nsubj", "root", "nmod"]]
    m = attachment_scores(gold_h, pred_h, gold_l, pred_l)
    assert m["uas"] == pytest.approx(2 / 3)
    assert m["las"] == pytest.approx(2 / 3)


def test_parse_conll2003_format():
    text = ("-DOCSTART- -X- O O\n\n"
            "EU NNP I-NP I-ORG\n"
            "rejects VBZ I-VP O\n"
            "German JJ I-NP I-MISC\n"
            "call NN I-NP O\n\n"
            "Peter NNP I-NP I-PER\n"
            "Blackburn NNP I-NP I-PER\n")
    sents = parse_conll2003(text)
    assert len(sents) == 2
    words, pos, ner = sents[0]
    assert words == ["EU", "rejects", "German", "call"]
    assert ner == ["I-ORG", "O", "I-MISC", "O"]
    assert sents[1][2] == ["I-PER", "I-PER"]


def test_ner_band_harness_end_to_end():
    """The NERBenchmark shape: run the engine's NER over CoNLL-format
    gold, score with span F1 (real CoNLL-2003 drops into the same
    call)."""
    from corenlp_ray.stages.ner import ner_sentence
    from corenlp_ray.stages.pos import tag_sentence

    text = ("Barack NNP I-NP I-PER\n"
            "Obama NNP I-NP I-PER\n"
            "visited VBD I-VP O\n"
            "Paris NNP I-NP I-LOC\n"
            ". . O O\n")
    sents = parse_conll2003(text)
    gold = [ner for _, _, ner in sents]
    pred = []
    type_map = {"PERSON": "PER", "LOCATION": "LOC",
                "ORGANIZATION": "ORG", "MISC": "MISC"}
    for words, _, _ in sents:
        tags = tag_sentence(words)
        types, _ = ner_sentence(words, tags)
        pred.append([("I-" + type_map[t]) if t in type_map else "O"
                     for t in types])
    m = span_prf(gold, pred)
    assert m["f1"] == 1.0


def test_read_tsv_tagged(tmp_path):
    p = tmp_path / "tagged.tsv"
    p.write_text("The\tDT\ndog\tNN\n\nran\tVBD\n")
    corpus = read_tsv_tagged(str(p))
    assert corpus == [(["The", "dog"], ["DT", "NN"]),
                      (["ran"], ["VBD"])]
