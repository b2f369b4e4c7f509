"""Real-tree UD gold extraction from the reference's own conversion tests.

``UniversalEnglishGrammaticalStructureTest.java`` ships hundreds of
(PTB constituency tree, gold basic-UD dependency list) pairs — real
sentences with hand-checked heads and labels (trees/
UniversalEnglishGrammaticalStructureTest.java:73, the BASIC TestType).
That is the only sizeable *real-tree* dependency gold in the reference
repo (the licensed UD/WSJ treebanks are not shipped), so it is the
honest evaluation set for the depparse band: we score the deterministic
cascade and the trainable arc-standard slot against these trees rather
than against the cascade teacher.

Notes on the gold's conventions (mirrored here):
- Dependencies are 1-based ``label(headword-i, childword-j)``; the root
  line is ``root(ROOT-0, w-k)``.
- The BASIC gold omits punctuation dependencies (GrammaticalStructure
  .typedDependencies() drops punct by default), so attachment scores
  are computed over tokens that HAVE a gold line — same denominator
  the reference's conversion test effectively checks.
"""
from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

_JAVA_TEST = ("/root/reference/test/src/edu/stanford/nlp/trees/"
              "UniversalEnglishGrammaticalStructureTest.java")

_ESCAPES = {"n": "\n", "t": "\t", '"': '"', "\\": "\\", "'": "'",
            "r": "\r", "s": "s"}  # \\s inside regex-ish literals


def _java_string_args(body: str) -> List[str]:
    """Split one ``{TestType.X, <arg>, <arg>}`` body into its argument
    strings, concatenating ``"a" + "b"`` literal chains and decoding
    Java escapes.  Hand-rolled scanner: commas inside string literals
    must not split."""
    args: List[str] = []
    cur: List[str] = []
    i, n = 0, len(body)
    in_str = False
    while i < n:
        c = body[i]
        if in_str:
            if c == "\\" and i + 1 < n:
                cur.append(_ESCAPES.get(body[i + 1], body[i + 1]))
                i += 2
                continue
            if c == '"':
                in_str = False
                i += 1
                continue
            cur.append(c)
            i += 1
            continue
        if c == '"':
            in_str = True
            i += 1
            continue
        if c == ",":
            args.append("".join(cur))
            cur = []
            i += 1
            continue
        i += 1  # whitespace, '+', identifiers outside strings
    if cur:
        args.append("".join(cur))
    return [a for a in args if a.strip()]


def extract_cases(test_type: str = "BASIC",
                  path: str = _JAVA_TEST) -> List[Tuple[str, str]]:
    """All (tree_string, gold_dependency_text) pairs of one TestType."""
    with open(path, encoding="utf-8") as f:
        src = f.read()
    out: List[Tuple[str, str]] = []
    marker = "{TestType.%s," % test_type
    pos = 0
    while True:
        start = src.find(marker, pos)
        if start < 0:
            break
        # entry ends at the first '}' outside a string literal
        i = start + len(marker)
        in_str = False
        while i < len(src):
            c = src[i]
            if in_str:
                if c == "\\":
                    i += 2
                    continue
                if c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "}":
                break
            i += 1
        body = src[start + len(marker):i]
        args = _java_string_args(body)
        if len(args) >= 2:
            out.append((args[0], args[1]))
        pos = i
    return out


def ptb_tokens(tree: str) -> Tuple[List[str], List[str]]:
    """(words, tags) from a PTB bracket string — leaves in order, tag =
    the immediately dominating preterminal label."""
    toks = re.findall(r"\(|\)|[^\s()]+", tree)
    words: List[str] = []
    tags: List[str] = []
    stack: List[str] = []
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "(":
            stack.append(toks[i + 1])
            i += 2
        elif t == ")":
            stack.pop()
            i += 1
        else:
            if stack[-1] != "-NONE-":   # empty elements (traces) are
                words.append(t)         # dropped before indexing, as in
                tag = stack[-1]         # the reference's conversion
                if "-" in tag and not tag.startswith("-"):
                    tag = tag.split("-")[0]   # strip functional tags
                tags.append(tag)              # (NN-ADV → NN)
            i += 1
    return words, tags


_DEP_RE = re.compile(r"^\s*([\w:]+)\(.*?-(\d+)'*,\s*.*?-(\d+)'*\)\s*$")


def gold_heads(dep_text: str, n: int) -> Tuple[List[int], List[str]]:
    """1-based heads (0 = root) and labels; -2 where the gold has no
    line for the token (punct, omitted extras)."""
    heads = [-2] * n
    labels = [""] * n
    for line in dep_text.splitlines():
        m = _DEP_RE.match(line)
        if not m:
            continue
        label, h, c = m.group(1), int(m.group(2)), int(m.group(3))
        if 1 <= c <= n and heads[c - 1] == -2:  # keep first (basic) line
            heads[c - 1] = h
            labels[c - 1] = label
    return heads, labels


def load_ud_gold(test_type: str = "BASIC") -> List[Dict]:
    """Rows: words, tags (treebank), heads (1-based, 0=root, -2=absent),
    labels — deduplicated on the token sequence (the Java file repeats
    a few sentences across sections)."""
    rows: List[Dict] = []
    seen = set()
    for tree, deps in extract_cases(test_type):
        try:
            words, tags = ptb_tokens(tree)
        except IndexError:       # malformed capture — skip, never raise
            continue
        if not words:
            continue
        key = tuple(words)
        if key in seen:
            continue
        seen.add(key)
        heads, labels = gold_heads(deps, len(words))
        if not any(h >= 0 for h in heads):
            continue
        rows.append({"words": words, "tags": tags,
                     "heads": heads, "labels": labels})
    return rows


def score_predictions(rows: Sequence[Dict],
                      pred_heads: Sequence[Sequence[int]],
                      pred_labels: Sequence[Sequence[str]]
                      ) -> Dict[str, float]:
    """UAS/LAS over tokens with a gold line (gold omits punct).
    ``pred_heads`` are 0-based with -1 root (the cascade convention);
    gold is 1-based with 0 root."""
    ua = la = total = 0
    for row, ph, pl in zip(rows, pred_heads, pred_labels):
        for k, gh in enumerate(row["heads"]):
            if gh == -2:
                continue
            total += 1
            p1 = ph[k] + 1 if ph[k] >= 0 else 0
            if p1 == gh:
                ua += 1
                if _label_eq(pl[k], row["labels"][k]):
                    la += 1
    return {"uas": ua / total if total else 0.0,
            "las": la / total if total else 0.0,
            "tokens": total}


def _label_eq(pred: str, gold: str) -> bool:
    # gold uses subtyped labels (nsubj:pass, acl:relcl, obl:tmod …);
    # score the full label, but let a bare root/punct mismatch on the
    # subtype separator not double-penalize casing
    return pred == gold
