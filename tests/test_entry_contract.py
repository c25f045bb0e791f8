"""Driver-contract tests for __spark_entry__.py: entry() smoke,
queries()/oracle_sql() key discipline, stable schemas.
"""

from __future__ import annotations

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
    # all but the explicitly-approximate ops carry an oracle
    missing = set(qs) - set(oracles)
    assert missing <= {"ann_topk_lsh", "ann_topk_ivf"}


def test_queries_are_callable_and_lazy(spark):
    qs = entrymod.queries()
    # spot-check plan construction (no execution) for a sample
    for name in ["degrees_total", "triplets", "text_stats", "sessionize_events"]:
        df = qs[name](spark, "/root/testdata/sf0.001")
        assert df.columns  # plan built, schema resolvable
