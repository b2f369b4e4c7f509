"""Enhanced++ band on the reference's own NON_COLLAPSED gold.

Gold = UniversalEnglishGrammaticalStructureTest NON_COLLAPSED cases:
each lists the BASIC arcs (first line per dependent) plus the enhanced
EXTRAS (nsubj:xsubj, ref, antecedent role inheritance, ...). We feed
the gold basic tree into enhance_dependencies and score micro-P/R of
the predicted extra edges against the gold extras (copy-node lines
like 8.1 are out of scope for the flat edge representation and are
excluded from both sides).

Run: PYTHONPATH=/root/repo python scripts/eval_enhanced_ud.py
"""
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from corenlp_ray.functions.enhanced_ud import enhance_dependencies
from corenlp_ray.models.ud_gold import extract_cases, ptb_tokens

_LINE = re.compile(r"^\s*([\w:']+)\(.*?-(\d+)('*),\s*.*?-(\d+)('*)\)\s*$")


def triples(dep_text, n):
    """All (head1, child1, label) gold triples; primes/copy nodes
    skipped."""
    out = []
    for line in dep_text.splitlines():
        if re.search(r"-\d+\.\d+", line):      # copy node (8.1)
            continue
        m = _LINE.match(line)
        if not m or m.group(3) or m.group(5):  # primed = copy reference
            continue
        label, h, c = m.group(1), int(m.group(2)), int(m.group(4))
        if 1 <= c <= n and 0 <= h <= n:
            out.append((h, c, label))
    return out


def main():
    tp = fp = fn = 0
    cases = 0
    for tree, deps in extract_cases("NON_COLLAPSED"):
        words, tags = ptb_tokens(tree)
        n = len(words)
        allt = triples(deps, n)
        if not allt:
            continue
        cases += 1
        # enhanced-only labels are extras even when listed first (the
        # gold prints ref(man, who) before the basic obj(love, who))
        _extra_labels = {"ref", "nsubj:xsubj", "csubj:xsubj"}
        basic = {}
        extras = set()
        for h, c, lab in allt:
            if c not in basic and lab not in _extra_labels:
                basic[c] = (h, lab)
            else:
                extras.add((h - 1, c - 1, lab))
        for h, c, lab in allt:       # child with ONLY extra-label lines
            if c not in basic:
                basic[c] = (h, lab)
                extras.discard((h - 1, c - 1, lab))
        root1 = next((c for c, (h, _) in basic.items() if h == 0), 1)
        # tokens with no gold line (punct) attach to the root and are
        # excluded from scoring — the gold never mentions them
        heads = [basic.get(c + 1, (root1, "punct"))[0] - 1
                 for c in range(n)]
        labels = [basic.get(c + 1, (0, "punct"))[1] for c in range(n)]
        pred = set(enhance_dependencies(words, tags, None, heads, labels))
        basic_set = {(basic[c][0] - 1, c - 1, basic[c][1]) for c in basic}

        def norm(e):
            # NON_COLLAPSED gold keeps bare obl/nmod (no case subtype);
            # strip the preposition subtype our collapsed labels carry,
            # keeping the gold's own standard subtypes
            h, c, lab = e
            base, _, sub = lab.partition(":")
            if base in ("obl", "nmod", "advcl", "acl", "conj") and \
                    sub not in ("", "tmod", "npmod", "poss", "agent",
                                "relcl", "xsubj"):
                lab = base
            return (h, c, lab)

        scored_children = {c - 1 for c in basic}
        # NON_COLLAPSED gold never adds the antecedent's inherited role
        # (that's the fully-enhanced representation our graph also
        # carries); exclude those children from the comparison
        antecedents = {h for h, c, lab in basic_set
                       if lab == "acl:relcl"}
        pred_extras = {norm(e) for e in pred
                       if e[1] in scored_children
                       and e[1] not in antecedents} - {
            norm(e) for e in basic_set}
        extras = {norm(e) for e in extras}
        tp += len(pred_extras & extras)
        fp += len(pred_extras - extras)
        fn += len(extras - pred_extras)
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    print(json.dumps({"cases": cases, "tp": tp, "fp": fp, "fn": fn,
                      "precision": round(p, 4), "recall": round(r, 4),
                      "f1": round(f, 4)}))


if __name__ == "__main__":
    main()
