"""Debug/parity outputters mirroring the reference's JSON/text output
shapes (/root/reference/src/edu/stanford/nlp/pipeline/JSONOutputter.java:45
— tokens, sentences, triples at :131-136; TextOutputter.java:33; CoNLL in
sources/conllu.py). Parquet is the engine's real sink; these exist so a
reference user can diff outputs shape-for-shape.
"""
from __future__ import annotations

import json
from typing import Dict

import pyarrow as pa


def doc_to_json(row: Dict, triples=None) -> Dict:
    """One annotated doc row → the reference's JSON document shape."""
    sentences = []
    for si, (b, e) in enumerate(zip(row["sent_begin"], row["sent_end"])):
        tokens = []
        for k in range(b, e):
            tok = {
                "index": k - b + 1,
                "word": row["tok_word"][k],
                "originalText": row.get("tok_orig", row["tok_word"])[k],
                "characterOffsetBegin": row["tok_begin"][k],
                "characterOffsetEnd": row["tok_end"][k],
            }
            if "tok_lemma" in row:
                tok["lemma"] = row["tok_lemma"][k]
            if "tok_pos" in row:
                tok["pos"] = row["tok_pos"][k]
            if "tok_ner" in row:
                tok["ner"] = row["tok_ner"][k]
            tokens.append(tok)
        sent: Dict = {"index": si, "tokens": tokens}
        if "dep_head" in row:
            deps = []
            for k in range(b, e):
                h = row["dep_head"][k]
                deps.append({
                    "dep": row["dep_label"][k],
                    "governor": 0 if h < 0 else h - b + 1,
                    "governorGloss": "ROOT" if h < 0 else row["tok_word"][h],
                    "dependent": k - b + 1,
                    "dependentGloss": row["tok_word"][k],
                })
            sent["basicDependencies"] = deps
        if triples is not None:
            sent["openie"] = [
                {"subject": t["subj"], "relation": t["pred"],
                 "object": t["obj"], "confidence": t["confidence"]}
                for t in triples
                if t["url"] == row.get("url") and t["sent_idx"] == si
                and t["source"] == "openie"]
            sent["kbp"] = [
                {"subject": t["subj"], "relation": t["pred"],
                 "object": t["obj"], "confidence": t["confidence"]}
                for t in triples
                if t["url"] == row.get("url") and t["sent_idx"] == si
                and t["source"] == "kbp"]
        sentences.append(sent)
    doc: Dict = {"docId": row.get("url", ""), "sentences": sentences}
    if "men_begin" in row:
        doc["entitymentions"] = [
            {"text": " ".join(row["tok_word"][mb:me]), "ner": t,
             "normalizedNER": nv}
            for mb, me, t, nv in zip(row["men_begin"], row["men_end"],
                                     row["men_ner"], row["men_norm"])]
    if "men_chain" in row:
        chains: Dict[int, list] = {}
        for mi, c in enumerate(row["men_chain"]):
            chains.setdefault(c, []).append({
                "mentionBegin": row["men_begin"][mi],
                "mentionEnd": row["men_end"][mi],
                "text": " ".join(
                    row["tok_word"][row["men_begin"][mi]:row["men_end"][mi]]),
            })
        doc["corefs"] = {str(k): v for k, v in chains.items()
                         if len(v) > 1}
    return doc


def write_json(docs_ds, path: str):
    """Dataset sink: one .jsonl part per block (one JSON doc per line)."""
    import os
    import uuid

    os.makedirs(path, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        name = os.path.join(path, f"part-{uuid.uuid4().hex}.jsonl")
        with open(name, "w") as f:
            for r in rows:
                f.write(json.dumps(doc_to_json(r)) + "\n")
        return pa.Table.from_pydict({"file": [name], "docs": [len(rows)]})

    return docs_ds.map_batches(write_block, batch_format="pyarrow")


def doc_to_text(row: Dict) -> str:
    """TextOutputter-style human-readable rendering."""
    out = [f"Document: {row.get('url', '')}"]
    for si, (b, e) in enumerate(zip(row["sent_begin"], row["sent_end"])):
        out.append(f"Sentence #{si + 1}:")
        out.append(" ".join(row["tok_word"][b:e]))
        if "tok_pos" in row:
            out.append(" ".join(
                f"{row['tok_word'][k]}/{row['tok_pos'][k]}"
                for k in range(b, e)))
    return "\n".join(out) + "\n"
