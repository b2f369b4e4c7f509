"""Annotation-chain stages. Each module exposes

  * pure kernels (testable without Ray), and
  * a batch transform ``fn(batch: pyarrow.Table) -> pyarrow.Table`` or a
    callable class for actor-pool stages, suitable for
    ``Dataset.map_batches(..., batch_format="pyarrow")``.

A stage only APPENDS columns (the moral equivalent of the reference's
``Annotator.requirementsSatisfied()`` contract — see
/root/reference/src/edu/stanford/nlp/pipeline/Annotator.java:73-80).
"""
