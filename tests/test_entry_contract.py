"""Driver-contract tests for __spark_entry__.py: entry() smoke,
queries()/oracle_sql() key discipline, stable schemas.
"""

from __future__ import annotations

import pytest

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["id", "degree"]


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every query carries an oracle: the two hyperplane-LSH paths and
    # IVF gained full replay oracles (the plane bank is seeded and the
    # registered IVF runs train_iters=0, where the centroids ARE the
    # seed vectors — nothing depends on a float-sum combine order, so
    # the twins re-derive buckets/assignments/ranks bit-identically)
    missing = set(qs) - set(oracles)
    assert missing == set()


@pytest.mark.slow
def test_every_batch_query_plan_analyzes(spark):
    """Build (not execute) EVERY batch query's plan at sf0.001: schema
    access forces Catalyst analysis, so an unresolved column / bad
    function signature fails here instead of in the driver's gate.
    Streaming queries are excluded — calling them runs a real stream job;
    they execute end-to-end in tests/test_streaming.py.
    """
    qs = entrymod.queries()
    failures = {}
    for name, fn in qs.items():
        if name.startswith("streaming_"):
            continue
        try:
            df = fn(spark, "/root/testdata/sf0.001")
            assert df.columns  # plan built, schema resolvable
        except Exception as exc:  # noqa: BLE001 - collect all, report once
            failures[name] = repr(exc)[:200]
    assert not failures, failures
