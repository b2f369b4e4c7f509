"""corenlp_ray — a Ray-Data-native knowledge-graph-construction engine.

A from-scratch, Ray-Data-idiomatic rebuild of the capabilities of
stanfordnlp/CoreNLP's annotation chain (tokenize → ssplit → pos → lemma →
ner → depparse → coref → openie/kbp → entity canonicalization → triple
store), expressed as zero-copy Arrow ``map_batches`` stages over
``ray.data.Dataset`` pipelines, plus the large-scale training-data
operations (dedup, similarity search, text analysis) such an engine needs
at 10^12-document scale.

Layout:
  corenlp_ray.sources     — page/document readers and deterministic synth
  corenlp_ray.stages      — the annotation chain (one module per annotator)
  corenlp_ray.functions   — pure per-token / per-string kernels + lexicons
  corenlp_ray.ops         — dedup / similarity / text-analysis operators
  corenlp_ray.pipelines   — stage registry (requires/provides DAG) + drivers
  corenlp_ray.state       — lineage manifests, checkpoint/resume

Nothing in this package calls ``ray.init``/``ray.shutdown``; sessions are
owned by bench.py, CLI entry points and the pytest fixture.
"""

__version__ = "0.1.0"
