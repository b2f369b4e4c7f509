"""Shared Arrow→pylist column cache for the fused per-document chain.

Every stage kernel converts its input list columns with ``to_pylist()``;
in the fused actor (pipelines/kg.FusedDocAnnotator) consecutive kernels
re-convert the SAME columns (tok_word alone is read by six stages —
measured ~15-20% of the chain's wall time). The fused path threads one
mutable ``cols`` dict through the kernels: reads hit the cache, and each
stage deposits the Python lists it just built (it has them in hand
before constructing the Arrow arrays). Staged / registry execution
passes no dict and behaves exactly as before; kernel outputs are
identical either way (tests/test_fused_vs_staged.py).
"""
from __future__ import annotations


def col(batch, name: str, cols: dict | None):
    """pylist of ``batch[name]``, via the cache when one is threaded."""
    if cols is None:
        return batch.column(name).to_pylist()
    v = cols.get(name)
    if v is None:
        v = batch.column(name).to_pylist()
        cols[name] = v
    return v


def put(cols: dict | None, **named_lists) -> None:
    """Deposit freshly built pylists for downstream stages."""
    if cols is not None:
        cols.update(named_lists)
