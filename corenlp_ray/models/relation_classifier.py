"""Supervised ACE-style relation classifier — the trainable analogue of
the reference's ``BasicRelationExtractor`` used by the ``relation``
annotator (src/edu/stanford/nlp/pipeline/RelationExtractorAnnotator.java:
30,58-74: a ``LinearClassifier`` over ``BasicRelationFeatureFactory``
features, domain = the Roth/Yih CoNLL-2004 corpus read by
``RothCONLL04Reader``).

Feature shape follows BasicRelationFeatureFactory.java (the default
feature list wired by MachineReading for the relation task):
  - arg_type          :173  "arg1type=X_and_arg2type=Y"
  - arg_order         :182  "arg1BeforeArg2"
  - same_head         :187  "arguments_have_same_head"
  - surface_distance  :274-285  binary + binned (<4 raw, <6, <10, >=10)
  - entities_between_args  :255-260 "argI_before/after_TYPE"
  - full_tree_path → approximated by the dependency path between the
    two mention heads (this engine's parse is the dep graph; the
    reference's separate dependencyPath features live at :668+ with the
    Kill-relation note)
  - word windows :290+  k=2 lemmas left of arg1 / right of arg2, and
    the bag of lemmas strictly between the args

Classifier: a multiclass averaged perceptron (same learner as
models/kbp_classifier.py) with the explicit ``_NR`` unrelated class —
RelationMention.UNRELATED in the reference. Predictions are gated by
the Roth label validator (valid argument-type signatures per relation),
the LabelValidator analogue. Absent the licensed Roth/Yih corpus,
``distill`` learns the deterministic rule cascade's decisions
(stages/relation.py) so the scored path is real and a labeled corpus
drops into ``train`` unchanged.
"""
from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

UNRELATED = "_NR"  # RelationMention.UNRELATED

# Roth/Yih CoNLL-2004 relation inventory with argument-type signatures
# (RothCONLL04Reader normalizes Peop/Loc/Org → PERSON/LOCATION/
# ORGANIZATION; the five relations are the corpus's full inventory).
ROTH_SIGNATURES: Dict[str, Tuple[str, str]] = {
    "Live_In": ("PERSON", "LOCATION"),
    "Located_In": ("LOCATION", "LOCATION"),
    "OrgBased_In": ("ORGANIZATION", "LOCATION"),
    "Work_For": ("PERSON", "ORGANIZATION"),
    "Kill": ("PERSON", "PERSON"),
}

ROTH_ENTITY_TYPES = frozenset({"PERSON", "LOCATION", "ORGANIZATION"})


def _dep_path(heads: Sequence[int], labels: Sequence[str],
              a: int, b: int, max_len: int = 6) -> Optional[str]:
    """Shortest up-down dependency path between token heads (the
    dependencyPath feature family)."""
    def ancestors(v):
        chain, seen = [], set()
        while v >= 0 and v not in seen and len(chain) <= max_len:
            seen.add(v)
            chain.append(v)
            v = heads[v] if v < len(heads) else -1
        return chain

    ca, cb = ancestors(a), ancestors(b)
    set_b = {v: i for i, v in enumerate(cb)}
    for i, v in enumerate(ca):
        if v in set_b:
            up = [labels[x] for x in ca[:i]]
            down = [labels[x] for x in cb[:set_b[v]]]
            if len(up) + len(down) > max_len:
                return None
            return "^".join(up) + "|" + "v".join(reversed(down))
    return None


def relation_features(words: Sequence[str], lemmas: Sequence[str],
                      tags: Sequence[str], heads: Sequence[int],
                      labels: Sequence[str], ners: Sequence[str],
                      sb: int, se: int, ob: int, oe: int,
                      stype: str, otype: str) -> List[str]:
    """Feature vector for one ordered mention pair inside a sentence
    (token indices are sentence-local)."""
    n = len(words)
    feats = ["arg1type=%s_and_arg2type=%s" % (stype, otype)]
    if sb < ob:
        feats.append("arg1BeforeArg2")
    shead, ohead = max(sb, min(se - 1, n - 1)), max(ob, min(oe - 1, n - 1))
    if shead == ohead:
        feats.append("arguments_have_same_head")
    # surface distance, binned like :274-285
    lo, hi = (se, ob) if sb < ob else (oe, sb)
    dist = max(0, hi - lo)
    if dist < 4:
        feats.append("surface_distance_%d" % dist)
    if dist < 6:
        feats.append("surface_distance_bin_lt6")
    elif dist < 10:
        feats.append("surface_distance_bin_lt10")
    else:
        feats.append("surface_distance_bin_ge10")
    # entities between the args (:244-260)
    for k in range(lo, min(hi, n)):
        if ners[k] != "O" and not (sb <= k < se) and not (ob <= k < oe):
            feats.append("ner_between_%s" % ners[k])
    # bag of lemmas + POS strictly between
    for k in range(lo, min(hi, n)):
        feats.append("between_lemma_%s" % lemmas[k].lower())
        feats.append("between_pos_%s" % tags[k])
    # k=2 windows: left of first arg, right of second arg (:290+)
    first_b, second_e = (sb, oe) if sb < ob else (ob, se)
    for k in range(max(0, first_b - 2), first_b):
        feats.append("left_window_%s" % lemmas[k].lower())
    for k in range(second_e, min(n, second_e + 2)):
        feats.append("right_window_%s" % lemmas[k].lower())
    # dependency path between heads (the tree-path analogue)
    path = _dep_path(heads, labels, shead, ohead)
    if path is not None:
        feats.append("dep_path_%s" % path)
        feats.append("dep_path_len_%d" % (path.count("^")
                                          + path.count("v") + 1))
    # argument head lemmas
    feats.append("arg1_head_%s" % lemmas[shead].lower())
    feats.append("arg2_head_%s" % lemmas[ohead].lower())
    return feats


class RelationClassifier:
    """Multiclass averaged perceptron over Roth relations + ``_NR``,
    signature-gated at predict time (LabelValidator semantics: a
    predicted label incompatible with the argument types falls back to
    the best compatible class — BasicRelationExtractor.classOf
    re-scores when the validator rejects)."""

    def __init__(self, weights: Dict[str, Dict[str, float]] | None = None):
        self.w: Dict[str, Dict[str, float]] = weights or {}

    def classes(self) -> List[str]:
        return sorted(self.w)

    def scores(self, feats: List[str]) -> Dict[str, float]:
        return {c: sum(wc.get(f, 0.0) for f in feats)
                for c, wc in self.w.items()}

    def predict(self, feats: List[str], stype: str,
                otype: str) -> Tuple[str, float]:
        if not self.w:
            return UNRELATED, 0.0
        sc = self.scores(feats)
        ranked = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))
        for rel, s in ranked:
            if rel == UNRELATED:
                return UNRELATED, 0.0
            sig = ROTH_SIGNATURES.get(rel)
            if sig and sig == (stype, otype):
                # softmax-ish confidence over the top-2 margin
                margin = s - (ranked[1][1] if len(ranked) > 1 else 0.0)
                conf = 1.0 / (1.0 + pow(2.718281828, -margin))
                return rel, conf
        return UNRELATED, 0.0

    @classmethod
    def train(cls, examples: List[Tuple[List[str], str]],
              n_iter: int = 8, seed: int = 13) -> "RelationClassifier":
        """Averaged perceptron over (features, label) pairs; labels
        include ``_NR`` negatives (the reference trains one multiclass
        model over all candidate pairs, BasicRelationExtractor:103)."""
        classes = sorted({y for _, y in examples} | {UNRELATED})
        w = {c: defaultdict(float) for c in classes}
        acc = {c: defaultdict(float) for c in classes}
        t = 1
        order = list(range(len(examples)))
        rng_state = seed
        for _ in range(n_iter):
            # deterministic LCG shuffle (no random module state leaks)
            for i in range(len(order) - 1, 0, -1):
                rng_state = (rng_state * 1103515245 + 12345) % (1 << 31)
                j = rng_state % (i + 1)
                order[i], order[j] = order[j], order[i]
            for idx in order:
                feats, gold = examples[idx]
                sc = {c: sum(w[c][f] for f in feats) for c in classes}
                pred = max(sorted(sc), key=lambda c: sc[c])
                if pred != gold:
                    for f in feats:
                        w[gold][f] += 1.0
                        acc[gold][f] += t
                        w[pred][f] -= 1.0
                        acc[pred][f] -= t
                t += 1
        final = {c: {f: v - acc[c][f] / t for f, v in w[c].items() if
                     abs(v - acc[c][f] / t) > 1e-9} for c in classes}
        return cls(final)

    @classmethod
    def distill(cls, annotated_rows, n_iter: int = 8) -> "RelationClassifier":
        """Learn the deterministic rule cascade's decisions over
        annotated sentences (the licensed-corpus-free path; a real
        Roth/Yih TSV drops into ``train`` unchanged)."""
        from corenlp_ray.stages.relation import (candidate_relation_pairs,
                                                 classify_pair_rules)

        examples: List[Tuple[List[str], str]] = []
        for row in annotated_rows:
            for cand in candidate_relation_pairs(row):
                rel, _ = classify_pair_rules(*cand.rule_args)
                examples.append((cand.feats, rel))
        return cls.train(examples, n_iter=n_iter)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.w, f)

    @classmethod
    def load(cls, path: str) -> "RelationClassifier":
        with open(path) as f:
            return cls(json.load(f))
