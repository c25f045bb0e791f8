"""Skew-safe two-phase ("salted") aggregation for NON-algebraic aggs.

Algebraic message combines (sum/min/max/count) are already skew-immune:
Spark's partial aggregation collapses a hub's millions of inputs to one
row per map partition before the shuffle. What partial aggregation can
NOT shrink are holistic/collection aggregates — ``collect_list`` /
``collect_set`` ship every element to the single reducer that owns the
hot key, and a hub key concentrates its whole neighborhood in one task.

``salted_agg`` splits such an aggregate into: (1) partial aggregate on
(key, salt) — the hub's rows spread over ``buckets`` reducers — then
(2) a final merge over ``buckets`` partial rows per key. The salt is a
deterministic hash of a value expression, so results are reproducible.

See SCALING.md §7: salting is needed ONLY on this path; adding it to
algebraic aggs would just double the shuffle count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_on: Column,
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase grouped aggregation: groupBy(keys + hash(salt_on) %
    buckets).agg(partial_aggs) → groupBy(keys).agg(final_aggs).

    ``final_aggs`` see the partial columns under the aliases the
    partials declared.
    """
    salted = df.withColumn(SALT_COL, F.pmod(F.hash(salt_on), F.lit(buckets)))
    stage1 = salted.groupBy(*keys, SALT_COL).agg(*partial_aggs)
    return stage1.groupBy(*keys).agg(*final_aggs)


def salted_adjacency(
    edges: DataFrame, buckets: int = 32, directed: bool = False
) -> DataFrame:
    """(id, ns) sorted distinct-neighbor arrays, hub-safe: a hub's
    neighbor set is collected in ``buckets`` shards and merged, so no
    single reduce task materializes the raw (pre-dedup) inbox alone.
    Drop-in for the adjacency build in ``library.jaccard``.
    """
    pairs = edges.select(F.col("src").alias("id"), F.col("dst").alias("nbr"))
    if not directed:
        pairs = pairs.unionByName(
            edges.select(F.col("dst").alias("id"), F.col("src").alias("nbr"))
        )
    return salted_agg(
        pairs,
        keys=["id"],
        salt_on=F.col("nbr"),
        partial_aggs=[F.collect_set("nbr").alias("part")],
        final_aggs=[
            F.sort_array(F.array_distinct(F.flatten(F.collect_list("part")))).alias(
                "ns"
            )
        ],
        buckets=buckets,
    )
