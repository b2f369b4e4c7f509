"""Sentence-splitting parity with the reference's
WordToSentenceProcessorTest (/root/reference/test/src/edu/stanford/nlp/
process/WordToSentenceProcessorTest.java — default-policy cases
:68-100 and the paragraph-strategy matrix :113-145). Each case:
tokenize the input, split under the given newline policy, and the
per-sentence word lists must equal the tokenization of the reference's
gold sentence strings."""
import pyarrow as pa
import pytest

from corenlp_ray.stages.tokenize import tokenize, tokenize_ssplit_batch


def split_words(text, policy):
    tb = pa.Table.from_pydict({"text": [text]})
    out = tokenize_ssplit_batch(tb, newline_policy=policy)
    words = out.column("tok_word")[0].as_py()
    sb = out.column("sent_begin")[0].as_py()
    se = out.column("sent_end")[0].as_py()
    return [words[b:e] for b, e in zip(sb, se)]


def gold_words(sents):
    return [[t[0] for t in tokenize(s)] for s in sents]


# (policy, input, gold sentences)
CASES = [
    ("never", "This should only be one sentence.",
     ["This should only be one sentence."]),
    ("never", "This should be two sentences.  There is a split.",
     ["This should be two sentences.", "There is a split."]),
    ("never", "This should be two sentences!  There is a split.",
     ["This should be two sentences!", "There is a split."]),
    ("never", "This should be two sentences?  There is a split.",
     ["This should be two sentences?", "There is a split."]),
    ("never", "This should be two sentences!!!?!!  There is a split.",
     ["This should be two sentences!!!?!!", "There is a split."]),
    ("never", "This should be two sentences.  Second one incomplete",
     ["This should be two sentences.", "Second one incomplete"]),
    ("never", "One incomplete sentence", ["One incomplete sentence"]),
    ("never", '(Break after a parenthesis.)  (Or after "quoted stuff!")',
     ["(Break after a parenthesis.)", '(Or after "quoted stuff!")']),
    ("never", "  ", []),
    ("never", "This should be\n one sentence.",
     ["This should be one sentence."]),
    ("never", "'') Funny stuff joined on.", ["'') Funny stuff joined on."]),
    ("never", "Mr. White got a loaf of bread",
     ["Mr. White got a loaf of bread"]),
    # paragraph strategies (WordToSentenceProcessorTest:113-145)
    ("never",
     "Depending on the options,\nthis could be all sorts of things,\n\n "
     "as I like chocolate. And cookies.",
     ["Depending on the options, this could be all sorts of things, "
      "as I like chocolate.", "And cookies."]),
    ("always",
     "Depending on the options,\nthis could be all sorts of things,\n\n "
     "as I like chocolate. And cookies.",
     ["Depending on the options,", "this could be all sorts of things,",
      "as I like chocolate.", "And cookies."]),
    ("two",
     "Depending on the options,\nthis could be all sorts of things,\n\n "
     "as I like chocolate. And cookies.",
     ["Depending on the options, this could be all sorts of things,",
      "as I like chocolate.", "And cookies."]),
    ("two",
     "Depending on the options,\nthis could be all sorts of things,\n "
     "as I like chocolate. And cookies.",
     ["Depending on the options, this could be all sorts of things, "
      "as I like chocolate.", "And cookies."]),
    ("two",
     "Specific descriptions are absent.\n\n''Mossy Head Industrial Park''"
     " it says.",
     ["Specific descriptions are absent.",
      "''Mossy Head Industrial Park'' it says."]),
]


@pytest.mark.parametrize("policy,text,gold", CASES,
                         ids=[f"{c[0]}:{c[1][:28]}" for c in CASES])
def test_ssplit_case(policy, text, gold):
    assert split_words(text, policy) == gold_words(gold)
