"""Full enhanced-graph band on the reference's CC_PROCESSED gold.

Gold = UniversalEnglishGrammaticalStructureTest CC_PROCESSED cases
(35): the COMPLETE enhanced representation — conj:<coordinator> and
obl/nmod:<case> subtyped labels plus conjunct role propagation
(nsubj(are, boys) AND nsubj(are, girls)). We reconstruct the basic
tree (first line per child, sentence-word subtypes stripped), run
enhance_dependencies, and score the full predicted graph against the
full gold graph (punct children excluded — the gold omits them).

Run: PYTHONPATH=/root/repo python scripts/eval_ccprocessed_ud.py
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from corenlp_ray.functions.enhanced_ud import enhance_dependencies
from corenlp_ray.models.ud_gold import extract_cases, ptb_tokens
from eval_enhanced_ud import triples  # noqa: E402  (same line parser)

_EXTRA_LABELS = {"ref", "nsubj:xsubj", "csubj:xsubj"}


def _strip_word_subtype(lab, word_set):
    base, _, sub = lab.partition(":")
    if sub and sub.replace("_", " ").split()[0] in word_set:
        return base
    return lab


def main():
    tp = fp = fn = 0
    cases = 0
    per_case = []
    for tree, deps in extract_cases("CC_PROCESSED"):
        try:
            words, tags = ptb_tokens(tree)
        except IndexError:          # non-literal tree arg in the Java
            continue
        n = len(words)
        lowers = {w.lower() for w in words}
        allt = triples(deps, n)
        if not allt:
            continue
        cases += 1
        basic = {}
        # a child with a conj:* line is BASICALLY a conjunct — its other
        # lines (nmod:of(Activation, NFkappaB), nsubj(are, girls)) are
        # the propagated enhanced copies
        for h, c, lab in allt:
            if lab.startswith("conj"):
                basic[c] = (h, "conj")
        for h, c, lab in allt:
            lab0 = _strip_word_subtype(lab, lowers)
            if c not in basic and lab0 not in _EXTRA_LABELS \
                    and lab0 != "conj":
                basic[c] = (h, lab0)
        for h, c, lab in allt:
            if c not in basic:
                basic[c] = (h, _strip_word_subtype(lab, lowers))
        root1 = next((c for c, (h, _) in basic.items() if h == 0), 1)
        heads = [basic.get(c + 1, (root1, "punct"))[0] - 1
                 for c in range(n)]
        labels = [basic.get(c + 1, (0, "punct"))[1] for c in range(n)]
        pred = set(enhance_dependencies(words, tags, None, heads, labels))
        scored = {c - 1 for c in basic}
        pred = {e for e in pred if e[1] in scored}
        gold = {(h - 1, c - 1, lab) for h, c, lab in allt}
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
        if pred != gold:
            per_case.append((" ".join(words)[:60],
                             sorted(pred - gold)[:4],
                             sorted(gold - pred)[:4]))
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    print(json.dumps({"cases": cases, "tp": tp, "fp": fp, "fn": fn,
                      "precision": round(p, 4), "recall": round(r, 4),
                      "f1": round(f, 4)}))
    if "--detail" in sys.argv:
        for s, fps, fns in per_case[:12]:
            print(s, "\n  FP:", fps, "\n  FN:", fns)


if __name__ == "__main__":
    main()
