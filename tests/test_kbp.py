"""KBP relation extraction goldens (FIXTURES F6) incl. template-bank P/R."""
import pyarrow as pa

from corenlp_ray.sources.pages import PAGES_SCHEMA, make_page, gold_triples_for_doc
from corenlp_ray.stages.coref import coref_batch
from corenlp_ray.stages.depparse import depparse_batch
from corenlp_ray.stages.kbp import kbp_batch
from corenlp_ray.stages.lemma import lemma_batch
from corenlp_ray.stages.ner import ner_batch
from corenlp_ray.stages.pos import pos_batch
from corenlp_ray.stages.tokenize import tokenize_ssplit_batch


def annotate_docs(tbl):
    return coref_batch(depparse_batch(lemma_batch(ner_batch(pos_batch(
        tokenize_ssplit_batch(tbl))))))


def kbp_for_text(text):
    tbl = pa.Table.from_pylist([{
        "url": "u", "warc_ts": 1_500_000_000_000_000, "html": b"",
        "text": text, "lang": "en"}], schema=PAGES_SCHEMA)
    trip = kbp_batch(annotate_docs(tbl))
    return {(r["subj"], r["pred"], r["obj"]) for r in trip.to_pylist()}


def test_born_in():
    t = kbp_for_text("John Smith was born in Springfield.")
    assert ("John Smith", "per:city_of_birth", "Springfield") in t


def test_employee_of():
    t = kbp_for_text("Mary Johnson works for Initech.")
    assert ("Mary Johnson", "per:employee_of", "Initech") in t


def test_headquarters():
    t = kbp_for_text("Globex Inc. is headquartered in Dover.")
    assert ("Globex Inc.", "org:city_of_headquarters", "Dover") in t


def test_founded():
    t = kbp_for_text("Patricia Davis founded Hooli in 2004.")
    assert ("Hooli", "org:founded_by", "Patricia Davis") in t
    assert ("Hooli", "org:founded", "2004") in t


def test_spouse_symmetric():
    t = kbp_for_text("Robert Brown is married to Linda Martinez.")
    assert ("Robert Brown", "per:spouse", "Linda Martinez") in t
    assert ("Linda Martinez", "per:spouse", "Robert Brown") in t


def test_title_and_top_member():
    t = kbp_for_text(
        "Susan Clark is the chief executive officer of Umbrella Group.")
    assert ("Susan Clark", "per:employee_of", "Umbrella Group") in t
    assert ("Umbrella Group", "org:top_members/employees", "Susan Clark") in t
    assert any(p == "per:title" and s == "Susan Clark" for s, p, o in t)


def test_subsidiary():
    t = kbp_for_text("Initech is a subsidiary of Globex Inc.")
    assert ("Initech", "org:parents", "Globex Inc.") in t
    assert ("Globex Inc.", "org:subsidiaries", "Initech") in t


def test_schools():
    t = kbp_for_text("David Anderson graduated from Stanford University.")
    assert ("David Anderson", "per:schools_attended", "Stanford University") in t


def test_residence():
    t = kbp_for_text("Barbara Taylor lives in Salem.")
    assert ("Barbara Taylor", "per:cities_of_residence", "Salem") in t


def test_death():
    t = kbp_for_text("William Lewis died in Bristol.")
    assert ("William Lewis", "per:city_of_death", "Bristol") in t


def test_pronoun_subject_via_coref():
    t = kbp_for_text("James Moore visited Salem last year. He works for Hooli.")
    assert ("James Moore", "per:employee_of", "Hooli") in t


def test_pr_on_template_bank():
    """P/R ≥ 0.95 vs the template-implied gold triples over 40 synthesized
    pages — the in-repo stand-in for the reference-triples parity gate."""
    rows, gold = [], set()
    for doc_id in range(200, 240):
        page = make_page(doc_id)
        page.pop("_gold")
        rows.append(page)
        for s, r, o in gold_triples_for_doc(doc_id):
            gold.add((page["url"], s, r, o))
    tbl = pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)
    trip = kbp_batch(annotate_docs(tbl))
    got = {(r["url"], r["subj"], r["pred"], r["obj"])
           for r in trip.to_pylist()
           if r["pred"] != "per:title"}  # titles carry phrase objs; gold has slot surface
    gold_cmp = {g for g in gold if g[2] != "per:title"}
    tp = len(got & gold_cmp)
    prec = tp / max(1, len(got))
    rec = tp / max(1, len(gold_cmp))
    assert prec >= 0.95, f"precision {prec:.3f}; spurious: {sorted(got - gold_cmp)[:8]}"
    assert rec >= 0.95, f"recall {rec:.3f}; missed: {sorted(gold_cmp - got)[:8]}"


def test_age():
    t = kbp_for_text("Robert Brown, 45, attended the meeting.")
    assert ("Robert Brown", "per:age", "45") in t


def test_appositive_title():
    t = kbp_for_text("Susan Clark, chief executive officer of Hooli, resigned.")
    assert ("Susan Clark", "per:employee_of", "Hooli") in t
    assert ("Hooli", "org:top_members/employees", "Susan Clark") in t
    assert any(p == "per:title" and "officer" in o for s, p, o in t)


def test_alternate_names():
    t = kbp_for_text("International Business Machines (IBM) reported profits.")
    assert ("International Business Machines", "org:alternate_names", "IBM") in t
    assert ("IBM", "org:alternate_names", "International Business Machines") in t


def test_origin_nationality():
    t = kbp_for_text("The American John Smith arrived.")
    assert ("John Smith", "per:origin", "American") in t


def test_dep_rule_bank_siblings():
    t = kbp_for_text("Mary Johnson is the sister of Robert Brown.")
    assert ("Mary Johnson", "per:siblings", "Robert Brown") in t
    assert ("Robert Brown", "per:siblings", "Mary Johnson") in t


def test_dep_rule_bank_parents():
    t = kbp_for_text("David Anderson is the son of Barbara Taylor.")
    assert ("David Anderson", "per:parents", "Barbara Taylor") in t


def test_dep_rule_bank_custom_file(tmp_path):
    from corenlp_ray.stages.kbp import load_dep_rules
    f = tmp_path / "rules.tsv"
    f.write_text("{lemma:admire}=v >nsubj {ner:PERSON}=s >obj {ner:PERSON}=o"
                 "\tx:admires\ts\to\t0.5\t\n")
    rules = load_dep_rules(str(f))
    assert len(rules) == 1 and rules[0].relation == "x:admires"


def test_conjoined_subjects_distribute():
    t = kbp_for_text("John Smith and Mary Johnson work for Initech.")
    assert ("John Smith", "per:employee_of", "Initech") in t
    assert ("Mary Johnson", "per:employee_of", "Initech") in t


def test_relative_clause_subject():
    t = kbp_for_text("Mary Johnson, who works for Initech, lives in Salem.")
    assert ("Mary Johnson", "per:employee_of", "Initech") in t
    assert ("Mary Johnson", "per:cities_of_residence", "Salem") in t
