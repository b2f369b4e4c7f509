"""Deterministic synthesis and reading of the ``pages`` input table.

Authoritative input shape (BASELINE.json ``input_hint``):
    pages(url: string, warc_ts: timestamp[us], html: binary,
          text: string, lang: string)

Because no external corpus exists in this sandbox, pages are synthesized
deterministically (seeded by doc_id) from a template bank whose sentences
cover the reference's golden constructions — OpenIE regression sentences
(/root/reference/itest/src/edu/stanford/nlp/naturalli/OpenIEITest.java:45-124)
and TAC-KBP relation patterns
(/root/reference/src/edu/stanford/nlp/ie/KBPRelationExtractor.java:121-170).
The generator also returns the GOLD relation triples implied by each
instantiated template, which is what the P/R ≥ 0.95 harness scores against.

Two entry points:
  * ``synth_pages_table(n, seed)``  — small pyarrow.Table for unit tests.
  * ``read_pages(sf_dir)``          — Ray Dataset of pages derived 1:1 from
    the driver's ``documents`` table (doc_id → deterministic page), so page
    volume scales with sf. Streaming: built via map_batches, never
    materialized on the driver.

The ``text`` column is the byte-identical-extraction oracle:
``extract_text(html) == text`` for every row by construction (FIXTURES F1).
"""
from __future__ import annotations

import html as _htmllib
import random
from typing import Dict, List, Tuple

import pyarrow as pa

from corenlp_ray.stages.extract import canonicalize_text, extract_text

PERSONS = [
    "John Smith", "Mary Johnson", "Robert Brown", "Patricia Davis",
    "Michael Wilson", "Linda Martinez", "David Anderson", "Barbara Taylor",
    "James Moore", "Susan Clark", "William Lewis", "Elizabeth Walker",
]
ORGS = [
    "Acme Corp.", "Globex Inc.", "Initech", "Umbrella Group",
    "Stark Industries", "Wayne Enterprises", "Cyberdyne Systems",
    "Tyrell Corp.", "Hooli", "Vandelay Industries",
]
CITIES = [
    "Springfield", "Riverside", "Fairview", "Georgetown", "Madison",
    "Clinton", "Salem", "Bristol", "Arlington", "Dover",
]
TOPICS = ["robotics", "biology", "linguistics", "astronomy", "economics"]
YEARS = [1987, 1992, 1999, 2004, 2011, 2015]

# Each template: (sentence-format, [(subj_slot, relation, obj_slot), ...]).
# Slots: P=person, P2=second person, O=org, O2=second org, C=city, Y=year, T=topic.
TEMPLATES: List[Tuple[str, List[Tuple[str, str, str]]]] = [
    ("{P} was born in {C}.", [("P", "per:city_of_birth", "C")]),
    ("{P} works for {O}.", [("P", "per:employee_of", "O")]),
    ("{P} is the chief executive officer of {O}.",
     [("P", "per:title", "chief executive officer"),
      ("P", "per:employee_of", "O"),
      ("O", "org:top_members/employees", "P")]),
    ("{O} is headquartered in {C}.", [("O", "org:city_of_headquarters", "C")]),
    ("{P} founded {O} in {Y}.",
     [("O", "org:founded_by", "P"), ("O", "org:founded", "Y")]),
    ("{P} is married to {P2}.",
     [("P", "per:spouse", "P2"), ("P2", "per:spouse", "P")]),
    ("{P} died in {C}.", [("P", "per:city_of_death", "C")]),
    ("{P} graduated from {O}.", [("P", "per:schools_attended", "O")]),
    ("{O} is a subsidiary of {O2}.",
     [("O", "org:parents", "O2"), ("O2", "org:subsidiaries", "O")]),
    ("{P} lives in {C}.", [("P", "per:cities_of_residence", "C")]),
    ("{P}, {AGE}, joined {O}.",
     [("P", "per:age", "AGE"), ("P", "per:employee_of", "O")]),
    ("{P} and {P2} work for {O}.",
     [("P", "per:employee_of", "O"), ("P2", "per:employee_of", "O")]),
    ("{P}, who works for {O}, lives in {C}.",
     [("P", "per:employee_of", "O"),
      ("P", "per:cities_of_residence", "C")]),
]

# OpenIE-only sentences (no KBP relation), incl. the reference's goldens.
OPENIE_SENTENCES = [
    "Some cats have tails.",
    "All rabbits eat vegetables.",
    "{P} studies {T}.",
    "{O} acquired {O2}.",
    "{P}'s research group studies {T}.",
    "The quick brown fox jumped over the lazy dog.",
    '"We will win this year," said {P2}.',
]

# Coref exercise: pronoun in a follow-up sentence refers to {P}.
COREF_FOLLOWUPS = [
    "He works for {O2}.",
    "She lives in {C}.",
]

_PRONOUN_FOR = {}  # filled lazily: person -> he/she by position parity


def _slots(rng: random.Random) -> Dict[str, str]:
    p_idx = rng.randrange(len(PERSONS))
    p2_idx = (p_idx + 1 + rng.randrange(len(PERSONS) - 1)) % len(PERSONS)
    o_idx = rng.randrange(len(ORGS))
    o2_idx = (o_idx + 1 + rng.randrange(len(ORGS) - 1)) % len(ORGS)
    return {
        "P": PERSONS[p_idx], "P2": PERSONS[p2_idx],
        "O": ORGS[o_idx], "O2": ORGS[o2_idx],
        "C": rng.choice(CITIES), "Y": str(rng.choice(YEARS)),
        "T": rng.choice(TOPICS), "AGE": str(25 + rng.randrange(50)),
        "_P_idx": str(p_idx),
    }


def gen_page(doc_id: int, filler: str = "") -> Tuple[str, List[Tuple[str, str, str]]]:
    """Deterministically generate (canonical_text, gold_kbp_triples) for a
    doc_id. Gold triples use the surface forms as they appear in text."""
    rng = random.Random(10_000 + doc_id)
    slots = _slots(rng)
    n_templ = 2 + rng.randrange(3)
    chosen = rng.sample(TEMPLATES, n_templ)
    sentences: List[str] = []
    gold: List[Tuple[str, str, str]] = []
    for fmt, rels in chosen:
        sentences.append(fmt.format(**slots))
        for s_slot, rel, o_slot in rels:
            subj = slots.get(s_slot, s_slot)
            obj = slots.get(o_slot, o_slot)
            gold.append((subj, rel, obj))
    # one OpenIE-only sentence (the acquisition template also implies KBP
    # parent/subsidiary relations — keep gold consistent with extraction)
    oie = rng.choice(OPENIE_SENTENCES)
    sentences.append(oie.format(**slots))
    if oie.startswith("{O} acquired"):
        gold.append((slots["O2"], "org:parents", slots["O"]))
        gold.append((slots["O"], "org:subsidiaries", slots["O2"]))
    # optional coref follow-up right after a person-subject sentence
    if rng.random() < 0.5:
        he_she = "He" if int(slots["_P_idx"]) % 2 == 0 else "She"
        follow = rng.choice(COREF_FOLLOWUPS).format(**slots)
        follow = follow.replace("He ", he_she + " ").replace("She ", he_she + " ")
        sentences.append("{} visited {} last year. {}".format(
            slots["P"], slots["C"], follow))
        if "works for" in follow:
            gold.append((slots["P"], "per:employee_of", slots["O2"]))
        elif "lives in" in follow:
            gold.append((slots["P"], "per:cities_of_residence", slots["C"]))
    paras = [" ".join(sentences)]
    if filler:
        paras.append(filler)
    return canonicalize_text("\n\n".join(paras)), gold


_BOILER_HEAD = (
    "<html><head><title>Doc {doc_id}</title>"
    "<style>body {{ margin: 0; }}</style>"
    "<script>var x = 1 < 2 && \"tracker\";</script></head>"
    "<body><nav><ul><li><a href=\"/home\">Home</a></li>"
    "<li><a href=\"/about\">About</a></li></ul></nav>"
    "<!-- comment {doc_id} -->"
)
_BOILER_FOOT = "<footer>© example.org</footer></body></html>"


def html_of(text: str, doc_id: int) -> bytes:
    """Wrap canonical text in deterministic boilerplate HTML such that
    ``extract_text(html_of(t, i))`` == canonicalize_text('Doc {i}\\n\\nHome\\n\\nAbout\\n\\n' + t ...).

    To preserve the byte-identical invariant simply, the *canonical text of
    the page* is defined as everything the extractor keeps — including the
    title and nav items. ``make_page`` therefore computes the final ``text``
    column by running the extractor spec over the generated HTML once at
    generation time (generation-side, not pipeline-side).
    """
    paras = "".join(
        "<p>{}</p>".format(_htmllib.escape(p)) for p in text.split("\n\n")
    )
    return (_BOILER_HEAD.format(doc_id=doc_id) + paras + _BOILER_FOOT).encode("utf-8")


def make_page(doc_id: int, lang: str = "en", filler: str = "") -> Dict[str, object]:
    body, gold = gen_page(doc_id, filler)
    html = html_of(body, doc_id)
    text = extract_text(html)  # generation-time; the oracle for the pipeline
    domain = "hot.example.org" if doc_id % 10 < 3 else f"site{doc_id % 97}.example.org"
    return {
        "url": f"https://{domain}/doc/{doc_id}",
        "warc_ts": 1_500_000_000_000_000 + doc_id * 60_000_000,  # us epoch
        "html": html,
        "text": text,
        "lang": lang,
        "_gold": gold,
    }


PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def synth_pages_table(n: int = 50, seed: int = 0, with_gold: bool = False):
    """Small in-memory pages table for unit tests. Includes edge rows:
    an empty page and a tag-only page (FIXTURES F1 notes)."""
    rows = [make_page(seed * 100_000 + i, lang="en" if i % 7 != 3 else "de")
            for i in range(n)]
    golds = {r["url"]: r.pop("_gold") for r in rows}
    if n >= 3:
        rows[-1]["html"] = b"<html><body></body></html>"
        rows[-1]["text"] = extract_text(rows[-1]["html"])
        golds[rows[-1]["url"]] = []
        rows[-2]["html"] = b""
        rows[-2]["text"] = ""
        golds[rows[-2]["url"]] = []
    tbl = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    return (tbl, golds) if with_gold else tbl


def _docs_to_pages(batch: pa.Table, pages_per_doc: int = 1) -> pa.Table:
    rows = []
    ids = batch.column("doc_id").to_pylist()
    langs = batch.column("lang").to_pylist()
    texts = batch.column("text").to_pylist()
    for doc_id, lang, filler in zip(ids, langs, texts):
        for k in range(pages_per_doc):
            r = make_page(int(doc_id) * pages_per_doc + k, lang=lang,
                          filler=filler or "")
            r.pop("_gold")
            rows.append(r)
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def read_pages(sf_dir: str, pages_per_doc: int | None = None):
    """Ray Dataset of pages, derived deterministically from the driver's
    ``documents`` table (volume scales with sf). Streaming map_batches —
    nothing materializes on the driver.

    ``pages_per_doc`` (or $GRAFT_PAGES_PER_DOC, default 1) multiplies
    corpus volume deterministically — the bench knob for measuring at
    compute-dominated scale on a fixed sf directory."""
    import os

    import ray.data as rd

    if pages_per_doc is None:
        pages_per_doc = int(os.environ.get("GRAFT_PAGES_PER_DOC", "1"))
    import pyarrow.parquet as pq

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    # task granularity: ~16 docs per block so downstream (fused) actor
    # pools get many sub-second tasks to balance, independent of the
    # parquet file's native row-group count
    blocks = max(32, min(4096, n_docs // 16))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"],
                           override_num_blocks=blocks)
    return docs.map_batches(
        lambda b: _docs_to_pages(b, pages_per_doc),
        batch_format="pyarrow", batch_size=64)


def gold_triples_for_doc(doc_id: int) -> List[Tuple[str, str, str]]:
    """Gold KBP triples for a synthesized doc (P/R harness)."""
    return gen_page(doc_id)[1]
