"""NER golden fixtures (FIXTURES F4): typing, normalization, chunking."""
from corenlp_ray.stages.ner import ner_batch, ner_sentence
from corenlp_ray.stages.pos import pos_batch, tag_sentence
from corenlp_ray.stages.tokenize import tokenize, tokenize_ssplit_batch
from corenlp_ray.sources.pages import synth_pages_table


def run(text, docdate=None):
    words = [t[0] for t in tokenize(text)]
    tags = tag_sentence(words)
    types, mentions = ner_sentence(words, tags, docdate)
    return words, types, mentions


def spans(mentions, words):
    return [(" ".join(words[b:e]), t, n) for b, e, t, n in mentions]


def test_person_location():
    words, types, mentions = run("John Smith was born in Springfield.")
    got = spans(mentions, words)
    assert ("John Smith", "PERSON", "John Smith") in got
    assert ("Springfield", "LOCATION", "Springfield") in got


def test_org_by_suffix():
    words, _, mentions = run("Acme Corp. is headquartered in Madison.")
    got = spans(mentions, words)
    assert ("Acme Corp.", "ORGANIZATION", "Acme Corp.") in got
    assert ("Madison", "LOCATION", "Madison") in got


def test_org_multiword():
    words, _, mentions = run("She joined Stark Industries last year.")
    got = spans(mentions, words)
    assert ("Stark Industries", "ORGANIZATION", "Stark Industries") in got


def test_title_person():
    words, _, mentions = run("Dr. Jones arrived.")
    got = spans(mentions, words)
    assert ("Jones", "PERSON", "Jones") in got


def test_date_normalization():
    words, _, mentions = run("She died on March 3, 1999.")
    got = spans(mentions, words)
    assert ("March 3 , 1999", "DATE", "1999-03-03") in got


def test_date_year_only():
    _, _, mentions = run("He founded Initech in 2004.")
    assert any(t == "DATE" and n == "2004" for _, _, t, n in mentions)


def test_date_resolves_against_docdate():
    words, _, mentions = run("The meeting is on June 5.", docdate="2017-07-14")
    got = spans(mentions, words)
    assert ("June 5", "DATE", "2017-06-05") in got


def test_money_percent_number():
    words, _, mentions = run("It cost $3 million, up 4.5% from 10,000.")
    got = spans(mentions, words)
    assert ("$ 3 million", "MONEY", "3000000") in got
    assert ("4.5 %", "PERCENT", "4.5%") in got
    assert ("10,000", "NUMBER", "10000") in got


def test_number_words():
    _, _, mentions = run("He owns three hundred cats.")
    assert any(t == "NUMBER" and n == "300" for _, _, t, n in mentions)


def test_ordinal():
    _, _, mentions = run("The 3rd place and the first prize.")
    norms = [(t, n) for _, _, t, n in mentions]
    assert ("ORDINAL", "3") in norms and ("ORDINAL", "1") in norms


def test_batch_stage_on_pages():
    tbl = synth_pages_table(n=8, seed=11)
    out = ner_batch(pos_batch(tokenize_ssplit_batch(tbl)))
    assert {"tok_ner", "men_begin", "men_end", "men_sent", "men_ner",
            "men_norm"} <= set(out.column_names)
    # every synthesized page mentions at least one typed entity
    total = sum(len(out.column("men_ner")[i].as_py()) for i in range(6))
    assert total > 0
    for i in range(out.num_rows):
        mb = out.column("men_begin")[i].as_py()
        me = out.column("men_end")[i].as_py()
        nw = len(out.column("tok_word")[i].as_py())
        for b, e in zip(mb, me):
            assert 0 <= b < e <= nw
