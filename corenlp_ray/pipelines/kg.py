"""The flagship end-to-end KG-construction pipeline.

pages → extract_text → tokenize+ssplit → pos → lemma → ner → depparse →
coref → (openie ∪ kbp) triples → canonicalization shuffle → KG store.

Stage compute shapes (SURVEY §7.3):
  * stateless tasks: extract, tokenize, lemma, coref, openie
  * actor pools:     pos, ner, depparse, kbp (model state pinned per actor)
  * shuffles:        alias-map two-phase aggregate; (subj,pred,obj) dedup
  * layout:          hash(subj)-bucketed Parquet

The default registry below is the annotator-name table
(cf. /root/reference/src/edu/stanford/nlp/pipeline/Annotator.java:90-119).
"""
from __future__ import annotations

from corenlp_ray.pipelines.registry import Stage, apply, register
from corenlp_ray.stages.canonicalize import build_alias_map, build_kg, write_kg
from corenlp_ray.stages.coref import coref_batch
from corenlp_ray.stages.depparse import DepParser
from corenlp_ray.stages.extract import extract_text_batch
from corenlp_ray.stages.kbp import KbpExtractor
from corenlp_ray.stages.lemma import lemma_batch
from corenlp_ray.stages.ner import NerTagger
from corenlp_ray.stages.openie import openie_batch
from corenlp_ray.stages.pos import PosTagger
from corenlp_ray.stages.tokenize import tokenize_ssplit_batch

# ---- the annotator registry (names mirror the reference's canon) ----
register(Stage("cleanxml", (), ("text_extracted",), extract_text_batch))
register(Stage("tokenize", (), ("tok_word", "tok_sent", "sent_begin"),
               tokenize_ssplit_batch))
register(Stage("pos", ("tok_word",), ("tok_pos",), PosTagger,
               {"concurrency": (1, 8), "batch_size": 128}))
register(Stage("lemma", ("tok_pos",), ("tok_lemma",), lemma_batch))
register(Stage("ner", ("tok_pos",), ("tok_ner", "men_begin"), NerTagger,
               {"concurrency": (1, 8), "batch_size": 128}))
register(Stage("depparse", ("tok_pos",), ("dep_head", "dep_label"), DepParser,
               {"concurrency": (1, 8), "batch_size": 128}))
register(Stage("coref", ("men_begin", "tok_pos"),
               ("men_chain", "men_canonical", "pron_idx"), coref_batch))

ANNOTATE_STAGES = ("cleanxml", "tokenize", "pos", "lemma", "ner",
                   "depparse", "coref")


def annotate_pages(pages_ds, distributed: bool = True):
    """pages Dataset → fully annotated docs Dataset (append-only columns)."""
    return apply(pages_ds, ANNOTATE_STAGES, distributed=distributed)


class TripleExtractor:
    """Fused openie+kbp extraction in ONE pass over the annotated docs
    (a union of two branches would re-execute the whole upstream
    annotation chain once per branch — the lazy-Dataset double-consume
    trap). Actor-pool stage: the KBP pattern banks bind once."""

    def __init__(self):
        self.kbp = KbpExtractor()

    def __call__(self, batch):
        import pyarrow as pa

        return pa.concat_tables([openie_batch(batch), self.kbp(batch)])


def extract_triples(docs_ds, distributed: bool = True):
    """annotated docs → triples Dataset (openie ∪ kbp, single pass)."""
    if distributed:
        return docs_ds.map_batches(TripleExtractor, batch_format="pyarrow",
                                   concurrency=(1, 8), batch_size=128)
    inst = TripleExtractor()
    return docs_ds.map_batches(lambda b: inst(b), batch_format="pyarrow")


def kg_pipeline(pages_ds, num_buckets: int = 16, canonicalize: bool = True,
                lang_filter: str = "en", distributed: bool = True,
                checkpoint_dir: str | None = None):
    """Full pipeline: pages → KG Dataset (not yet written).

    English-only (documented limitation, SURVEY §2.2 row 26): non-en rows
    are dropped at the head — prune before any expensive stage.

    The triples table is a stage boundary consumed twice (alias-map
    aggregate + dedup shuffle), so it is pinned once: checkpointed to
    Parquet when ``checkpoint_dir`` is given (the resume point — rerun
    skips the whole annotation chain), else materialized in the object
    store (triples ≪ pages, the safe-materialize regime)."""
    import pyarrow.compute as pc

    if lang_filter:
        pages_ds = pages_ds.map_batches(
            lambda b: b.filter(pc.equal(b.column("lang"), lang_filter)),
            batch_format="pyarrow")
    docs = annotate_pages(pages_ds, distributed=distributed)
    triples = extract_triples(docs, distributed=distributed)
    if canonicalize:
        if checkpoint_dir:
            import ray.data as rd

            triples.write_parquet(checkpoint_dir)
            triples = rd.read_parquet(checkpoint_dir)
        else:
            triples = triples.materialize()
        alias = build_alias_map(triples)
    else:
        alias = None
    return build_kg(triples, alias_map=alias, num_buckets=num_buckets)


def run_kg(pages_ds, out_path: str, **kw):
    kg = kg_pipeline(pages_ds, **kw)
    write_kg(kg, out_path)
    return kg
