"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in corenlp_ray) calls ``ray.init``/``ray.shutdown``.

  * ``entry()``      — flagship KG pipeline on /root/testdata/sf0.001.
  * ``queries()``    — one callable(sf_dir) per implemented operator
                       (SURVEY.md §2 inventory + training-data ops).
  * ``oracle_sql()`` — DuckDB oracles for the SQL-expressible subset;
                       the rest get the driver's rows-only check and are
                       golden-tested in tests/.
"""
from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: synthesized Common-Crawl-style pages (derived
    1:1 from the sf0.001 documents table) → annotation chain → OpenIE+KBP
    triples → canonicalization shuffle → deduplicated KG."""
    from corenlp_ray.pipelines.queries import q_kg_triples

    return q_kg_triples("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from corenlp_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from corenlp_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
