"""Stage registry + dependency-ordered pipeline assembly.

The analogue of the reference's annotator framework: named annotators with
``requires()`` / ``requirementsSatisfied()`` contracts, topologically
ordered at build time (/root/reference/src/edu/stanford/nlp/pipeline/
Annotator.java:54-84, StanfordCoreNLP.ensurePrerequisiteAnnotators
:481-553), plus the custom-annotator plugin point
(customAnnotatorClass.*, StanfordCoreNLP.java:150,686-688).

A Stage is (name, requires, provides, fn-or-actor-class, map_batches
kwargs). ``build(names)`` resolves transitive requirements and returns the
stages in dependency order; ``apply`` chains them onto a Dataset with
``batch_format="pyarrow"`` and zero-copy batches. Demand-driven assembly
(the simple-API trick, simple/Document.java): ask for only the stages
whose outputs you need.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Union


@dataclass(frozen=True)
class Stage:
    name: str
    requires: tuple
    provides: tuple
    fn: Union[Callable, type]
    # map_batches kwargs for the distributed path (actor pools etc.);
    # a dict, or a zero-arg callable evaluated at apply time (lets pool
    # sizes adapt to the cluster CPU count)
    compute: Union[dict, Callable[[], dict]] = field(default_factory=dict)


_REGISTRY: Dict[str, Stage] = {}


def register(stage: Stage) -> Stage:
    _REGISTRY[stage.name] = stage
    return stage


def get(name: str) -> Stage:
    return _REGISTRY[name]


def registry() -> Dict[str, Stage]:
    return dict(_REGISTRY)


def build(names: Sequence[str]) -> List[Stage]:
    """Resolve transitive requirements, return dependency-ordered stages."""
    provides_of: Dict[str, str] = {}
    for st in _REGISTRY.values():
        for p in st.provides:
            provides_of[p] = st.name
    needed: List[str] = []

    def add(name: str, chain=()):
        if name in chain:
            raise ValueError(f"annotator cycle at {name}")
        st = _REGISTRY[name]
        for req in st.requires:
            dep = provides_of.get(req)
            if dep is None:
                raise ValueError(
                    f"stage {name} requires {req!r} which nothing provides")
            if dep not in needed:
                add(dep, chain + (name,))
        if name not in needed:
            needed.append(name)

    for n in names:
        add(n)
    return [_REGISTRY[n] for n in needed]


def apply(ds, names: Sequence[str], distributed: bool = True):
    """Chain the (dependency-ordered) stages onto a Dataset.

    distributed=False forces plain task stages with the stateless variants
    (useful under tight CPU budgets / unit tests)."""
    for st in build(names):
        all_kwargs = st.compute() if callable(st.compute) \
            else dict(st.compute)
        kwargs = all_kwargs if distributed else {}
        fn = st.fn
        if not distributed and isinstance(fn, type):
            inst = fn(**all_kwargs.get("fn_constructor_kwargs", {}))
            fn = lambda b, _i=inst: _i(b)  # noqa: E731
        ds = ds.map_batches(fn, batch_format="pyarrow", **kwargs)
    return ds
