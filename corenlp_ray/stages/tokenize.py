"""PTB-style invertible tokenization + sentence splitting (fused stage).

Reference semantics rebuilt from scratch (NOT ported):
  * tokenize — TokenizerAnnotator/PTBTokenizer conventions: deterministic
    English tokenization with clitic splitting (do n't, John 's), URL/email
    atoms, abbreviation-period retention, number atoms, quote/dash/ellipsis
    normalization, and the ``invertible`` contract (original text + char
    offsets recoverable per token). Cf.
    /root/reference/src/edu/stanford/nlp/process/PTBLexer.flex:137-180 and
    pipeline/TokenizerAnnotator.java:30.
  * ssplit — WordsToSentencesAnnotator rules: a sentence ends at a
    boundary token ``[.!?]+`` (and CJK 。！？), then absorbs boundary
    followers (closing quotes/brackets). Cf.
    /root/reference/src/edu/stanford/nlp/process/WordToSentenceProcessor.java:79-87.
    Newline policy: NEVER (newlines are ordinary whitespace), the
    reference default (pipeline/StanfordCoreNLP.java:154).

Design decisions (documented divergences, applied consistently so that
downstream parity is at the triple level):
  * hyphenated words stay single tokens (splitHyphenated=false).
  * curly quotes/dashes/ellipses are normalized in ``word``; ``orig``
    keeps the exact input slice (invertibility invariant:
    text[begin:end] == orig).

Output columns (CoNLL-style parallel list columns per document row — the
columnar re-expression of the reference's List<CoreLabel>; cf. SURVEY §1.2):
  tok_word  list<string>   normalized token text
  tok_orig  list<string>   exact input slice
  tok_begin list<int32>    char offset begin (into ``text``)
  tok_end   list<int32>    char offset end (exclusive)
  tok_sent  list<int32>    sentence index per token
  sent_begin list<int32>   per sentence: first token index (doc-level)
  sent_end  list<int32>    per sentence: one-past-last token index
"""
from __future__ import annotations

import re
from typing import List, Tuple

import pyarrow as pa

# ---------------------------------------------------------------- lexer ----

_ABBREVS = (
    "Mr|Mrs|Ms|Dr|Prof|Sr|Jr|St|Mt|Ft|Gen|Sen|Rep|Gov|Col|Capt|Lt|Sgt|Adm|"
    "Inc|Corp|Co|Ltd|Bros|vs|etc|No|Nos|Vol|Fig|Figs|Jan|Feb|Mar|Apr|Jun|"
    "Jul|Aug|Sep|Sept|Oct|Nov|Dec|approx|dept|est|Ave|Blvd|Rd|Hwy|Univ|"
    "Assn|Dept|Messrs|Mme|Mlle|Rev|Hon|Pres|Supt|Det|Insp"
)

_L = r"A-Za-zÀ-ɏͰ-ϿЀ-ӿ"

_TOKEN_RE = re.compile(
    r"(?:https?://|www\.)[^\s<>\"']*[^\s<>\"'.,;:!?)\]]"  # URL
    r"|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"    # email
    r"|(?:[" + _L + r"]\.){2,}"                            # acronym U.S., i.e.
    r"|(?<![" + _L + r"])(?:" + _ABBREVS + r")\."          # abbreviation + .
    r"|[+-]?\d+(?:,\d{3})*(?:\.\d+)?(?:st|nd|rd|th)?"      # number / ordinal
    r"|\.\d+"                                              # .5
    r"|\.\.\.|…"                                           # ellipsis
    r"|--+|—|–"                                            # dashes
    r"|[" + _L + r"][" + _L + r"0-9]*(?:[-'’][" + _L + r"0-9]+)*"  # word
    r"|[!?！？]+|[。]"                                      # terminal punct runs
    r"|``|''"                                              # PTB quote pairs
    r"|\S"                                                 # any other char
)

# clitics split off the END of a word token (PTB convention)
_CLITIC_RE = re.compile(r"(?i)(n[’']t|[’'](?:s|m|re|ve|ll|d))$")

_NORM_MAP = {
    "“": '"', "”": '"', "„": '"', "«": '"', "»": '"',
    "‘": "'", "’": "'", "‚": "'", "‹": "'", "›": "'",
    "—": "--", "–": "--", "…": "...",
    " ": " ",
    # CP1252 mojibake repair (cf. PTBLexer CP1252 handling)
    "\x91": "'", "\x92": "'", "\x93": '"', "\x94": '"', "\x96": "--",
    "\x97": "--", "\x85": "...",
}
_NORM_RE = re.compile("|".join(re.escape(k) for k in _NORM_MAP))


def _normalize_word(s: str) -> str:
    return _NORM_RE.sub(lambda m: _NORM_MAP[m.group(0)], s)


def tokenize(text: str) -> List[Tuple[str, str, int, int]]:
    """Pure kernel: text → list of (word, orig, char_begin, char_end).

    Invertible: text[begin:end] == orig for every token; tokens are
    non-overlapping and in order; inter-token gaps are whitespace only.
    """
    toks: List[Tuple[str, str, int, int]] = []
    for m in _TOKEN_RE.finditer(text):
        orig = m.group(0)
        b, e = m.start(), m.end()
        cm = _CLITIC_RE.search(orig)
        # never split the clitic off a bare-apostrophe atom like "'s" itself
        if cm and cm.start() > 0:
            split = cm.start()
            base, clit = orig[:split], orig[split:]
            toks.append((_normalize_word(base), base, b, b + split))
            toks.append((_normalize_word(clit), clit, b + split, e))
        else:
            toks.append((_normalize_word(orig), orig, b, e))
    return toks


# --------------------------------------------------------------- ssplit ----

_BOUNDARY_RE = re.compile(r"^(?:[.!?！？]+|[。])$")
# boundary followers, cf. WordToSentenceProcessor.java:85
_FOLLOWER = {")", "]", "}", '"', "'", "''", "”", "’", "»", "…", "-RRB-"}


def ssplit(words: List[str], para_break_before=frozenset()) -> List[Tuple[int, int]]:
    """Pure kernel: token words → [(tok_begin, tok_end)] sentence spans.

    ``para_break_before``: token indices preceded by a blank line — these
    force a sentence boundary (the reference's TWO_CONSECUTIVE newline
    policy, ``WordToSentenceProcessor.java:76``; appropriate for web pages
    where CleanXml-style extraction separates blocks with blank lines).
    """
    sents: List[Tuple[int, int]] = []
    start = 0
    i = 0
    n = len(words)
    while i < n:
        if i > start and i in para_break_before:
            sents.append((start, i))
            start = i
        if _BOUNDARY_RE.match(words[i]):
            j = i + 1
            while j < n and words[j] in _FOLLOWER and j not in para_break_before:
                j += 1
            sents.append((start, j))
            start = j
            i = j
        else:
            i += 1
    if start < n:
        sents.append((start, n))
    return sents


# -------------------------------------------------------- batch transform ----

def tokenize_ssplit_batch(batch: pa.Table, text_col: str = "text",
                          newline_policy: str = "two") -> pa.Table:
    """map_batches stage: + tok_* and sent_* parallel list columns.

    Stateless task stage; regexes compile once per worker at import. The
    per-document loop is inherent (tokenization is sequential within a
    string); each document is processed by a single compiled-DFA pass.

    ``newline_policy`` mirrors the reference's
    ssplit.newlineIsSentenceBreak enum (WordToSentenceProcessor.java:76):
    "never" (newlines are whitespace), "two" (a blank line forces a
    boundary — the web-page default here), "always" (every newline
    forces a boundary).
    """
    words_c, origs_c, begins_c, ends_c, tsent_c, sb_c, se_c = ([] for _ in range(7))
    for text in batch.column(text_col).to_pylist():
        text = text or ""
        toks = tokenize(text)
        words = [t[0] for t in toks]
        breaks = set()
        if newline_policy != "never":
            for k in range(1, len(toks)):
                gap = text[toks[k - 1][3]:toks[k][2]]
                if newline_policy == "always" and "\n" in gap:
                    breaks.add(k)
                elif "\n\n" in gap or gap.count("\n") >= 2:
                    breaks.add(k)
        sents = ssplit(words, breaks)
        tok_sent = [0] * len(toks)
        for si, (b, e) in enumerate(sents):
            for k in range(b, e):
                tok_sent[k] = si
        words_c.append(words)
        origs_c.append([t[1] for t in toks])
        begins_c.append([t[2] for t in toks])
        ends_c.append([t[3] for t in toks])
        tsent_c.append(tok_sent)
        sb_c.append([s[0] for s in sents])
        se_c.append([s[1] for s in sents])
    i32 = pa.list_(pa.int32())
    return (
        batch
        .append_column("tok_word", pa.array(words_c, type=pa.list_(pa.string())))
        .append_column("tok_orig", pa.array(origs_c, type=pa.list_(pa.string())))
        .append_column("tok_begin", pa.array(begins_c, type=i32))
        .append_column("tok_end", pa.array(ends_c, type=i32))
        .append_column("tok_sent", pa.array(tsent_c, type=i32))
        .append_column("sent_begin", pa.array(sb_c, type=i32))
        .append_column("sent_end", pa.array(se_c, type=i32))
    )
