"""The fused annotator pool and the staged registry pipeline must produce
identical triples (same kernels, same order — determinism across
execution shapes, which is also what makes the output independent of
parallelism level)."""
import pyarrow as pa

from corenlp_ray.sources.pages import synth_pages_table
from corenlp_ray.pipelines.kg import (FusedDocAnnotator, TripleExtractor,
                                      annotate_pages)
from corenlp_ray.stages.coref import coref_batch
from corenlp_ray.stages.depparse import depparse_batch
from corenlp_ray.stages.extract import extract_text_batch
from corenlp_ray.stages.lemma import lemma_batch
from corenlp_ray.stages.ner import ner_batch
from corenlp_ray.stages.pos import pos_batch
from corenlp_ray.stages.tokenize import tokenize_ssplit_batch


def staged_triples(tbl: pa.Table) -> pa.Table:
    b = extract_text_batch(tbl)
    b = tokenize_ssplit_batch(b)
    b = pos_batch(b)
    b = lemma_batch(b)
    b = ner_batch(b)
    b = depparse_batch(b)
    b = coref_batch(b)
    return TripleExtractor()(b)


def normalize(t: pa.Table):
    return sorted(map(tuple, zip(t.column("url").to_pylist(),
                                 t.column("subj").to_pylist(),
                                 t.column("pred").to_pylist(),
                                 t.column("obj").to_pylist(),
                                 t.column("source").to_pylist())))


def test_fused_equals_staged():
    tbl = synth_pages_table(n=25, seed=31)
    fused = FusedDocAnnotator()(tbl)
    staged = staged_triples(tbl)
    assert normalize(fused) == normalize(staged)
    assert fused.num_rows > 0


def test_batch_split_invariance():
    """Triples are identical whether the table arrives as one batch or
    many — the property that makes output independent of batch_size /
    parallelism."""
    tbl = synth_pages_table(n=20, seed=33)
    whole = normalize(FusedDocAnnotator()(tbl))
    parts = []
    for i in range(0, 20, 5):
        parts.append(FusedDocAnnotator()(tbl.slice(i, 5)))
    split = normalize(pa.concat_tables(parts))
    assert whole == split
