"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``flink_graph_spark/registry.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_graph_spark.registry import ORACLE_SQL, SPARK_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the
    customer–supplier bipartite graph from orders ⋈ lineitem and return
    the 20 highest-degree vertices (deterministic id tie-break).
    """
    return SPARK_QUERIES["top_degree_vertices"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-able query."""
    return dict(ORACLE_SQL)
