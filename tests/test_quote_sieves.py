"""Multi-sieve quote attribution (round-2 verdict task 8).

Sieve chain and ordering follow the reference's DEFAULT_QMSIEVES
(pipeline/QuoteAttributionAnnotator.java:128 ``tri,dep,onename,voc,
paraend,conv,sup,loose``); case shapes mirror the trigram patterns in
quoteattribution/sieves/QMSieves/TrigramSieve.java (CVQ/VCQ/PVQ/VPQ and
QVC/QCV/QVP/QPV) and the conversational-alternation sieve.
"""
import pyarrow as pa

from corenlp_ray.sources.pages import PAGES_SCHEMA
from corenlp_ray.stages.coref import coref_batch
from corenlp_ray.stages.depparse import depparse_batch
from corenlp_ray.stages.lemma import lemma_batch
from corenlp_ray.stages.misc_annotators import quote_batch
from corenlp_ray.stages.ner import ner_batch
from corenlp_ray.stages.pos import pos_batch
from corenlp_ray.stages.tokenize import tokenize_ssplit_batch


def doc(text):
    tbl = pa.Table.from_pylist([{
        "url": "u", "warc_ts": 0, "html": b"", "text": text, "lang": "en",
    }], schema=PAGES_SCHEMA)
    return coref_batch(depparse_batch(lemma_batch(ner_batch(pos_batch(
        tokenize_ssplit_batch(tbl))))))


def quotes(text):
    out = quote_batch(doc(text))
    return list(zip(out.column("quo_text")[0].as_py(),
                    out.column("quo_speaker")[0].as_py(),
                    out.column("quo_sieve")[0].as_py()))


def test_tri_qvc_said_name_after():
    q = quotes('"We will win," said Mary Johnson.')
    assert q[0][1] == "Mary Johnson"
    assert q[0][2] == "tri-QVC"


def test_tri_cvq_name_verb_before():
    q = quotes('Robert Brown said "this is fine."')
    assert q[0][1] == "Robert Brown"
    assert q[0][2] == "tri-CVQ"


def test_tri_qcv_name_then_verb_after():
    q = quotes('"We must act now," Mary Johnson said.')
    assert q[0][1] == "Mary Johnson"
    assert q[0][2] == "tri-QCV"


def test_tri_pronoun_resolves_through_coref():
    # he → coref antecedent Robert Brown via the pronoun map
    q = quotes('Robert Brown entered the room. He said "hello there."')
    assert q[0][2] in ("tri-PVQ", "tri-VPQ")
    assert q[0][1] == "Robert Brown"


def test_onename_single_name_sentence():
    # no adjacent speech verb trigram; exactly one PERSON in the
    # sentence containing the opening mark
    q = quotes('According to Mary Johnson, "the plan is working."')
    assert q[0][1] == "Mary Johnson"
    assert q[0][2] in ("onename", "tri-CVQ")


def test_vocative_previous_quote():
    # the name addressed inside quote 1 speaks quote 2
    q = quotes('"Hello, Mary Johnson!" A voice rang out. '
               '"Welcome back," was the reply.')
    assert len(q) == 2
    assert q[1][1] == "Mary Johnson"
    assert q[1][2] == "voc"


def test_conversation_alternation():
    text = ('"I disagree," said Mary Johnson. '
            '"You are wrong," said Robert Brown. '
            '"Prove it."')
    q = quotes(text)
    assert len(q) == 3
    assert q[0][1] == "Mary Johnson"
    assert q[1][1] == "Robert Brown"
    # third quote has no local cue: alternation hands it to speaker 1
    assert q[2][1] == "Mary Johnson"
    assert q[2][2] == "conv"


def test_unattributed_quote_empty():
    q = quotes('The sign read "no entry." The crowd and police watched.')
    assert q[0][1] == ""
    assert q[0][2] == ""


def test_sieve_column_parallel_lengths():
    out = quote_batch(doc('"A," said Mary Johnson. "B," said Robert Brown.'))
    texts = out.column("quo_text")[0].as_py()
    sieves = out.column("quo_sieve")[0].as_py()
    speakers = out.column("quo_speaker")[0].as_py()
    assert len(texts) == len(sieves) == len(speakers) == 2
