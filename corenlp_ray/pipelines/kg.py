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
from corenlp_ray.stages.canonicalize import (build_alias_map, build_kg,
                                             resolve_alias_scale, write_kg)
from corenlp_ray.stages.coref import coref_batch
from corenlp_ray.stages.depparse import DepParser
from corenlp_ray.stages.extract import extract_text_batch
from corenlp_ray.stages.kbp import KbpExtractor
from corenlp_ray.stages.lemma import lemma_batch
from corenlp_ray.stages.ner import NerTagger
from corenlp_ray.stages.openie import openie_batch
from corenlp_ray.stages.pos import PosTagger
from corenlp_ray.stages.tokenize import tokenize_ssplit_batch

def _ncpus() -> int:
    import ray

    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:
        return 4


_N_MODEL_POOLS = 4  # pos, ner, depparse, triple-extract


def _pool() -> dict:
    """Actor-pool sizing for model stages: the four model pools split the
    cluster evenly, leaving a task-stage share (FIXED size, not
    autoscaling — autoscaling pools ramp from 1 actor and never reach
    width within a stage's lifetime, which flattens N→4N scaling).
    Small batches keep the pools' queues balanced."""
    n = _ncpus()
    per_pool = max(1, (n - max(2, n // 8)) // _N_MODEL_POOLS)
    return {"concurrency": per_pool, "batch_size": 32, "num_cpus": 1}


# ---- the annotator registry (names mirror the reference's canon) ----
register(Stage("cleanxml", (), ("text_extracted",), extract_text_batch))
register(Stage("tokenize", (), ("tok_word", "tok_sent", "sent_begin"),
               tokenize_ssplit_batch))
register(Stage("pos", ("tok_word",), ("tok_pos",), PosTagger, _pool))
register(Stage("lemma", ("tok_pos",), ("tok_lemma",), lemma_batch))
register(Stage("ner", ("tok_pos",), ("tok_ner", "men_begin"), NerTagger,
               _pool))
register(Stage("depparse", ("tok_pos",), ("dep_head", "dep_label"), DepParser,
               _pool))
register(Stage("coref", ("men_begin", "tok_pos"),
               ("men_chain", "men_canonical", "pron_idx"), coref_batch))
from corenlp_ray.stages.coref import coref_full_batch  # noqa: E402
register(Stage("coref.full", ("men_begin", "tok_pos"),
               ("men_chain", "men_canonical", "pron_idx"),
               coref_full_batch))

# optional annotators (not in the flagship chain; demand-driven)
from corenlp_ray.stages.entitylink import entitylink_batch  # noqa: E402
from corenlp_ray.stages.misc_annotators import (  # noqa: E402
    gender_batch, quote_batch, truecase_batch)
from corenlp_ray.stages.natlog import natlog_batch  # noqa: E402

register(Stage("natlog", ("dep_head",), ("tok_polarity",), natlog_batch))
register(Stage("entitylink", ("men_begin",), ("men_link",),
               entitylink_batch))
register(Stage("gender", ("men_begin",), ("men_gender",), gender_batch))
register(Stage("truecase", ("tok_word",), ("tok_truecase",),
               truecase_batch))

from corenlp_ray.functions.enhanced_ud import enhanced_batch  # noqa: E402

register(Stage("enhanced", ("dep_head", "tok_pos"),
               ("enh_gov", "enh_dep", "enh_label"), enhanced_batch))
register(Stage("quote", ("tok_lemma", "men_begin"),
               ("quo_begin", "quo_text", "quo_speaker"), quote_batch))

from corenlp_ray.stages.parse_tree import parse_tree_batch  # noqa: E402

register(Stage("parse", ("tok_pos", "dep_head"), ("parse_tree",),
               parse_tree_batch))

from corenlp_ray.stages.sentiment import sentiment_tree_batch  # noqa: E402

register(Stage("sentiment_tree", ("parse_tree",),
               ("sent_sentiment_tree",), sentiment_tree_batch))


# KBP statistical-extractor slot (KBPEnsembleExtractor's last
# fallback): set via register_weighted_models(kbp_model_path=...);
# read at pipeline-construction time on the driver and shipped to the
# extraction actors as a constructor kwarg.
_KBP_MODEL_PATH: str | None = None


def register_weighted_models(pos_model_path: str | None = None,
                             dep_model_path: str | None = None,
                             kbp_model_path: str | None = None,
                             coref_model_path: str | None = None,
                             parse_model_path: str | None = None,
                             ner_model_path: str | None = None,
                             sentiment_model_path: str | None = None,
                             relation_model_path: str | None = None) -> None:
    """Swap the rule cascades for TRAINED weights (the pinned-model
    actor stages in models/): re-registers 'pos' and/or 'depparse' so
    every pipeline built afterwards (incl. the flagship KG chain) runs
    the weighted path. The reference's equivalent is pointing
    pos.model / depparse.model at different .ser.gz files."""
    if pos_model_path is not None:
        from corenlp_ray.stages.pos import WeightedPosTagger

        register(Stage("pos", ("tok_word",), ("tok_pos",),
                       WeightedPosTagger,
                       lambda: {**(_pool() if callable(_pool) else _pool),
                                "fn_constructor_kwargs":
                                    {"model_path": pos_model_path}}))
    if dep_model_path is not None:
        from corenlp_ray.stages.depparse import WeightedDepParser

        register(Stage("depparse", ("tok_pos",),
                       ("dep_head", "dep_label"), WeightedDepParser,
                       lambda: {**(_pool() if callable(_pool) else _pool),
                                "fn_constructor_kwargs":
                                    {"model_path": dep_model_path}}))
    if kbp_model_path is not None:
        global _KBP_MODEL_PATH
        _KBP_MODEL_PATH = kbp_model_path
    if coref_model_path is not None:
        from corenlp_ray.models.coref_ranker import StatisticalCoref

        register(Stage("coref", ("men_begin", "tok_pos"),
                       ("men_chain", "men_canonical", "pron_idx"),
                       StatisticalCoref,
                       lambda: {**(_pool() if callable(_pool) else _pool),
                                "fn_constructor_kwargs":
                                    {"model_path": coref_model_path}}))
    if parse_model_path is not None:
        from corenlp_ray.stages.parse_tree import WeightedParseTree

        register(Stage("parse", ("tok_pos", "dep_head"), ("parse_tree",),
                       WeightedParseTree,
                       lambda: {**(_pool() if callable(_pool) else _pool),
                                "fn_constructor_kwargs":
                                    {"model_path": parse_model_path}}))
    if ner_model_path is not None:
        from corenlp_ray.stages.ner import WeightedNerTagger

        register(Stage("ner", ("tok_pos",), ("tok_ner", "men_begin"),
                       WeightedNerTagger,
                       lambda: {**(_pool() if callable(_pool) else _pool),
                                "fn_constructor_kwargs":
                                    {"model_path": ner_model_path}}))
    if sentiment_model_path is not None:
        from corenlp_ray.stages.sentiment import WeightedSentimentTree

        register(Stage("sentiment_tree", ("parse_tree",),
                       ("sent_sentiment_tree",), WeightedSentimentTree,
                       lambda: {**(_pool() if callable(_pool) else _pool),
                                "fn_constructor_kwargs":
                                    {"model_path": sentiment_model_path}}))
    if relation_model_path is not None:
        global _RELATION_MODEL_PATH
        _RELATION_MODEL_PATH = relation_model_path


# trained ACE-relation weights bound by register_weighted_models (the
# relation stage is not in the default chain, matching the reference's
# annotator defaults; consumers pass this to RelationExtractor)
_RELATION_MODEL_PATH: str | None = None

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

    def __init__(self, kbp_classifier_path=None):
        self.kbp = KbpExtractor(classifier_path=kbp_classifier_path
                                or _KBP_MODEL_PATH)

    def __call__(self, batch, cols=None):
        import pyarrow as pa

        # ONE Arrow→pylist conversion shared by both extractors (the
        # two kernels read the same 15 wide list columns; converting
        # twice was ~19% of this stage's wall time). When the fused
        # chain threads its pylist cache (stages/_cache.py), upstream
        # stages have already deposited most of these.
        from corenlp_ray.stages._cache import col

        shared = {name: col(batch, name, cols) for name in (
            "url", "tok_word", "tok_pos", "tok_lemma", "sent_begin",
            "sent_end", "dep_head", "dep_label", "men_begin", "men_end",
            "men_ner", "men_norm", "men_canonical", "pron_idx",
            "pron_canonical")}
        return pa.concat_tables([openie_batch(batch, cols=shared),
                                 self.kbp(batch, cols=shared)])


def extract_triples(docs_ds, distributed: bool = True):
    """annotated docs → triples Dataset (openie ∪ kbp, single pass)."""
    if distributed:
        return docs_ds.map_batches(
            TripleExtractor, batch_format="pyarrow",
            fn_constructor_kwargs={"kbp_classifier_path": _KBP_MODEL_PATH},
            **_pool())
    inst = TripleExtractor()
    return docs_ds.map_batches(lambda b: inst(b), batch_format="pyarrow")


class FusedDocAnnotator:
    """The whole per-document chain (extract → tokenize → pos → lemma →
    ner → depparse → coref → openie+kbp) in ONE actor-pool stage.

    This is the flagship execution shape: the chain is per-row pure, so
    fusing it removes inter-pool block transfers and — decisively — the
    pool-balance problem (four sequential pools bottleneck on the
    heaviest stage; one pool self-balances). It mirrors the reference's
    own execution: one in-process annotator pipeline per document
    (AnnotationPipeline.java:66-83), here replicated per actor. The
    staged path (annotate_pages + extract_triples) remains for partial
    pipelines and demand-driven outputs; kernels are IDENTICAL, so both
    paths produce identical triples (tested)."""

    def __init__(self, kbp_classifier_path=None):
        self.pos = PosTagger()
        self.ner = NerTagger()
        self.dep = DepParser()
        self.triples = TripleExtractor(kbp_classifier_path)

    def __call__(self, batch):
        # one mutable pylist cache threads the whole chain: each stage
        # reads upstream columns from it and deposits what it builds,
        # killing the repeated Arrow→pylist conversions (tok_word alone
        # was re-converted by six kernels — stages/_cache.py)
        cols: dict = {}
        b = extract_text_batch(batch)
        b = tokenize_ssplit_batch(b, cols=cols)
        b = self.pos(b, cols=cols)
        b = lemma_batch(b, cols=cols)
        b = self.ner(b, cols=cols)
        b = self.dep(b, cols=cols)
        b = coref_batch(b, cols=cols)
        return self.triples(b, cols=cols)


def pages_to_triples(pages_ds, distributed: bool = True):
    """pages → triples via the fused annotator pool (one actor per CPU,
    minus a driver/IO share)."""
    if distributed:
        n = _ncpus()
        # n-1 actors, floor 1: the pool must never reserve EVERY cpu or
        # the upstream read tasks starve and the pipeline wedges
        return pages_ds.map_batches(
            FusedDocAnnotator, batch_format="pyarrow", batch_size=16,
            concurrency=max(1, n - 1), num_cpus=1,
            fn_constructor_kwargs={
                "kbp_classifier_path": _KBP_MODEL_PATH})
    inst = FusedDocAnnotator()
    return pages_ds.map_batches(lambda b: inst(b), batch_format="pyarrow")


class DocsToTriples(FusedDocAnnotator):
    """documents rows → synthesized pages → triples, all inside ONE actor
    pool — page synthesis and the lang filter run on the pool too, so no
    task stage competes with the reserved actors for CPUs (explicit
    fusion instead of relying on the planner's operator-fusion
    heuristics)."""

    def __init__(self, pages_per_doc: int = 1, lang_filter: str = "en",
                 kbp_classifier_path=None):
        super().__init__(kbp_classifier_path)
        self.pages_per_doc = pages_per_doc
        self.lang_filter = lang_filter

    def __call__(self, batch):
        import pyarrow.compute as pc

        from corenlp_ray.sources.pages import _docs_to_pages

        pages = _docs_to_pages(batch, self.pages_per_doc)
        if self.lang_filter:
            pages = pages.filter(
                pc.equal(pages.column("lang"), self.lang_filter))
        return super().__call__(pages)


def documents_to_triples(sf_dir: str, pages_per_doc: int | None = None,
                         lang_filter: str = "en"):
    """The flagship front half: documents.parquet → triples Dataset, one
    fused actor pool, read split for sub-second task granularity."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    if pages_per_doc is None:
        pages_per_doc = int(os.environ.get("GRAFT_PAGES_PER_DOC", "1"))
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    n = _ncpus()
    # granularity: ~4 tasks per actor balances the pool without drowning
    # the scheduler in per-task dispatch overhead
    blocks = max(8, min(n_docs, 4 * n))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"],
                           override_num_blocks=blocks)
    return docs.map_batches(
        DocsToTriples, batch_format="pyarrow",
        concurrency=max(1, n - 1), num_cpus=1,
        fn_constructor_kwargs={"pages_per_doc": pages_per_doc,
                               "lang_filter": lang_filter,
                               "kbp_classifier_path": _KBP_MODEL_PATH})


def kg_pipeline(pages_ds, num_buckets: int = 16, canonicalize: bool = True,
                lang_filter: str = "en", distributed: bool = True,
                checkpoint_dir: str | None = None, fused: bool = True):
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
    if fused:
        triples = pages_to_triples(pages_ds, distributed=distributed)
    else:
        docs = annotate_pages(pages_ds, distributed=distributed)
        triples = extract_triples(docs, distributed=distributed)
    if canonicalize:
        if checkpoint_dir:
            import ray.data as rd

            triples.write_parquet(checkpoint_dir)
            triples = rd.read_parquet(checkpoint_dir)
        else:
            # coalesce the ~hundreds of annotation-task micro-blocks before
            # the wide phases — groupby fan-out scales with block count,
            # and triples rows are tiny relative to the pages they came from
            triples = triples.repartition(_ncpus()).materialize()
        # broadcast dict below ALIAS_VOCAB_BROADCAST_MAX surface forms,
        # fully distributed argmax + bucketed-join rewrite above it
        alias, triples = resolve_alias_scale(triples)
    else:
        alias = None
    return build_kg(triples, alias_map=alias, num_buckets=num_buckets)


def kg_from_documents(sf_dir: str, num_buckets: int = 16,
                      pages_per_doc: int | None = None,
                      checkpoint_dir: str | None = None):
    """Flagship end-to-end: documents.parquet → KG Dataset via the fused
    pool + canonicalization shuffle (triples pinned at the stage
    boundary)."""
    import ray.data as rd

    triples = documents_to_triples(sf_dir, pages_per_doc=pages_per_doc)
    if checkpoint_dir:
        triples.write_parquet(checkpoint_dir)
        triples = rd.read_parquet(checkpoint_dir)
    else:
        triples = triples.repartition(_ncpus()).materialize()
    alias, triples = resolve_alias_scale(triples)
    return build_kg(triples, alias_map=alias, num_buckets=num_buckets)


def run_kg(pages_ds, out_path: str, **kw):
    kg = kg_pipeline(pages_ds, **kw)
    write_kg(kg, out_path)
    return kg
