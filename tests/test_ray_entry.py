"""Driver-contract smoke (__ray_entry__.py): entry() produces rows
with a stable schema under an already-initialized Ray session (the
driver calls ray.init itself), every oracle key has a query, and the
oracled queries all precede the rows-only ones in dict order (the
driver's correctness pass walks QUERIES in order with a fixed
budget)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_entry_returns_rows(ray_session):
    import __ray_entry__ as e

    import ray.data

    out = e.entry()
    if isinstance(out, ray.data.Dataset):
        n, cols = out.count(), set(out.schema().names)
    else:
        n, cols = len(out), set(out.columns)
    assert n >= 0
    assert {"subj", "pred", "obj"} <= cols


def test_queries_cover_oracles_in_order():
    import __ray_entry__ as e

    q = list(e.queries().keys())
    o = set(e.oracle_sql().keys())
    assert o <= set(q), o - set(q)
    # every oracled query before every rows-only query
    first_rows_only = next(i for i, k in enumerate(q) if k not in o)
    assert all(k in o for k in q[:first_rows_only])
    assert all(k not in o for k in q[first_rows_only:])
    # the driver's 50-query window must be spent ENTIRELY on oracled
    # queries (the catalog now carries more than 50 oracles; the
    # overflow is verified by tests/test_query_catalog.py instead)
    assert all(k in o for k in q[:50])
