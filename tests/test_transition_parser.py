"""Arc-standard transition parser tests (the trainable nndep slot —
models/transition_parser.py). Verified via oracle round-trips on the
reference's own CoNLL-U example trees, distillation against the rule
cascade, projectivity filtering, and persistence."""
import pytest

from corenlp_ray.models.transition_parser import (
    TransitionParser, _Config, _apply, _is_projective, _oracle_action,
    read_conllu_trees)

_CONLLU = ("/root/reference/data/edu/stanford/nlp/pipeline/"
           "en-example.conllu")

_SENTS = [
    "The quick brown fox jumped over the lazy dog .",
    "President Obama visited Paris last week .",
    "The committee has approved the merger agreement .",
    "Investors bought bonds and sold stocks yesterday .",
    "A spokesman for the company declined to comment .",
    "The new factory will employ 500 workers next year .",
    "He said the bank would cut costs .",
    "Revenue rose sharply in the second quarter .",
]


def _tagged(sents):
    from corenlp_ray.stages.pos import tag_sentence

    return [(s.split(), tag_sentence(s.split())) for s in sents]


def test_oracle_reconstructs_gold_trees():
    """Running the static oracle's own actions must rebuild every
    projective gold tree exactly (transition-system soundness)."""
    for words, tags, heads, rels in read_conllu_trees(_CONLLU):
        if not _is_projective(heads):
            continue
        n = len(words)
        gh, gl = [0] + heads, [""] + rels
        c = _Config(n)
        guard = 4 * n + 10
        while not c.terminal() and guard:
            guard -= 1
            act = _oracle_action(c, gh, gl)
            if act == "S" and not c.buf:
                break
            _apply(c, act)
        assert c.heads[1:] == heads
        assert c.labels[1:] == rels


def test_trains_on_reference_conllu_trees():
    corpus = [r for r in read_conllu_trees(_CONLLU)
              if _is_projective(r[2])]
    assert corpus
    m = TransitionParser.train(corpus, n_iter=12)
    for words, tags, heads, rels in corpus:
        ph, pl = m.parse(words, tags)
        assert ph == heads          # fits its own training data (capacity)


@pytest.fixture(scope="module")
def distilled():
    return TransitionParser.distill(_tagged(_SENTS))


def test_distillation_matches_teacher(distilled):
    from corenlp_ray.models.transition_parser import _is_projective
    from corenlp_ray.stages.depparse import parse_sentence

    agree = total = 0
    for words, tags in _tagged(_SENTS):
        h0, _ = parse_sentence(words, tags)
        want_h = [h + 1 if h >= 0 else 0 for h in h0]
        if not _is_projective(want_h):
            continue
        got_h, _ = distilled.parse(words, tags)
        agree += sum(a == b for a, b in zip(got_h, want_h))
        total += len(words)
    assert total > 0
    assert agree / total >= 0.9     # UAS vs teacher on training sents


def test_projectivity_filter():
    assert _is_projective([2, 0, 2])          # simple chain
    assert not _is_projective([3, 4, 0, 3])   # crossing arcs 1→3 / 2→4


def test_save_load_roundtrip(tmp_path, distilled):
    p = str(tmp_path / "dep.json")
    distilled.save(p)
    m2 = TransitionParser.load(p)
    w, t = _tagged(_SENTS)[0]
    assert m2.parse(w, t) == distilled.parse(w, t)


def test_weighted_stage_pins_model(tmp_path, distilled, ray_session):
    import ray.data as rd

    from corenlp_ray.stages.depparse import WeightedDepParser

    p = str(tmp_path / "dep.json")
    distilled.save(p)
    words, tags = _tagged(_SENTS)[0]
    ds = rd.from_items([{
        "tok_word": words, "tok_pos": tags,
        "sent_begin": [0], "sent_end": [len(words)]}])
    out = ds.map_batches(WeightedDepParser,
                         fn_constructor_kwargs={"model_path": p},
                         batch_format="pyarrow",
                         concurrency=1).take_all()
    heads = out[0]["dep_head"]
    assert len(heads) == len(words)
    assert -1 in list(heads)        # exactly one root token
