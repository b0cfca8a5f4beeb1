"""Driver entry-contract gate (VERDICT r12 #7): `__spark_entry__`
must expose entry/queries/oracle_sql exactly as the correctness driver
consumes them. Part of the fast `pytest -m critical` subset."""

from __future__ import annotations

import os
import sys

import pytest

pytestmark = pytest.mark.critical

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402


def test_entry_runs_and_returns_rows(spark):
    out = E.entry(spark)
    rows = out.collect()
    assert len(out.columns) > 0
    assert len(rows) > 0


def test_queries_and_oracles_align():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 379
    assert set(oracles) <= set(qs)
    # every callable takes (spark, sf_dir)
    import inspect

    for name, fn in list(qs.items())[:5]:
        assert len(inspect.signature(fn).parameters) == 2, name


def test_query_results_are_scalar_only(spark, sf_dir):
    """The driver's canonicalizer sorts result rows over every column;
    array/map/struct cells crash it (unhashable) — no headline query
    may return a complex-typed column (verify-skill gotcha)."""
    from etl_everywhere_hub_spark.queries import headline_queries

    bad = []
    for name, q in sorted(headline_queries().items()):
        df = q.spark(spark, sf_dir)
        for f in df.schema.fields:
            if f.dataType.typeName() in ("array", "map", "struct"):
                bad.append(f"{name}.{f.name}")
    assert bad == [], bad
