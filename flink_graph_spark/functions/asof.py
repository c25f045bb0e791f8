"""As-of (time-travel) join — for each left row, attach the latest
right row with the same key and ``right_ts <= left_ts``.

Spark lacks a native as-of join (Flink has temporal joins, DuckDB has
ASOF JOIN). The naive relational encoding — inner join on key with a
``right_ts <= left_ts`` filter, then argmax per left row — materializes
every (left row × earlier right row) pair before reducing: quadratic in
per-key history length, a scale-killer on long histories.

This implementation uses the merge shape instead: union both sides
tagged, one shuffle + sort per key, and a running ``last(...,
ignorenulls)`` window carries the most recent right payload forward
into each left row. Cost is O(n log n) per key partition, no pair
blowup, and the sort is exactly the one a 100 TB engine would already
pay for a merge join. Skew note: a single hot key serializes into one
partition's sort — same bound as any per-key window; salt upstream if
one key dominates.

Tie semantics (deterministic): right rows at ``right_ts == left_ts``
DO qualify (<=); among right rows sharing a timestamp the one with the
largest tiebreak column wins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    tiebreak: str,
) -> DataFrame:
    """Left as-of join. Returns all ``left`` columns plus each payload
    column as ``last_<name>`` (NULL when no right row precedes).

    ``on`` — equi-key column name present on both sides.
    ``tiebreak`` — right-side column breaking equal-timestamp ties
    (largest wins); must be part of ``payload`` ordering semantics.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).cast("timestamp_ntz").alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    tagged_right = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).cast("timestamp_ntz").alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    # Right rows sort before left rows at equal ts (is_left 0 < 1) so
    # ts == left_ts qualifies; larger tiebreak sorts later → wins last().
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = tagged_left.unionByName(tagged_right).select(
        "__is_left",
        *lcols,
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"last_{c}")
            for c in payload
        ],
    )
    return merged.where(F.col("__is_left") == 1).drop("__is_left")


# Registry query: latest event per (order's customer) at order time.
# DuckDB twin is the explicit row_number encoding (not DuckDB's native
# ASOF JOIN, whose equal-ts tie handling is implementation-defined) —
# max (ts, event_id) among events with ts <= o_orderdate.
ASOF_ORDER_EVENTS_SQL = """
WITH cand AS MATERIALIZED (
    SELECT o.o_orderkey, e.event_id, e.event_type,
           ROW_NUMBER() OVER (
               PARTITION BY o.o_orderkey
               ORDER BY e.ts DESC, e.event_id DESC
           ) AS rn
    FROM orders o
    JOIN events e
      ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
)
SELECT o.o_orderkey, o.o_custkey,
       c.event_id AS last_event_id, c.event_type AS last_event_type
FROM orders o
LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c ON o.o_orderkey = c.o_orderkey
ORDER BY o.o_orderkey
"""


def asof_order_events(orders: DataFrame, events: DataFrame) -> DataFrame:
    """(o_orderkey, o_custkey, last_event_id, last_event_type) — the
    most recent event by the ordering customer at order time."""
    out = asof_join(
        orders.select("o_orderkey", "o_custkey", "o_orderdate"),
        events.select(
            F.col("user_id").alias("o_custkey"), "ts", "event_id", "event_type"
        ),
        on="o_custkey",
        left_ts="o_orderdate",
        right_ts="ts",
        payload=("event_id", "event_type"),
        tiebreak="event_id",
    )
    return out.select(
        "o_orderkey", "o_custkey", "last_event_id", "last_event_type"
    ).orderBy("o_orderkey")


# ---- SCD2 dimension merge --------------------------------------------
#
# Slowly-changing-dimension type 2: given snapshot v1 and snapshot v2
# of a dimension table, emit the versioned history — unchanged rows
# keep (1, NULL), changed rows close the old version at 2 and open a
# new one, inserts open at 2, deletes close at 2. One full outer join
# on the business key + column comparison: the warehouse-merge staple
# at any scale (both sides shuffle once on the key; no windows).
# The second snapshot here is derived DETERMINISTICALLY from orders
# (every 50th order's priority rewritten, every 97th dropped, synthetic
# inserts appended) so the oracle replays the identical scenario.

def orders_snapshot_v2(orders: DataFrame) -> DataFrame:
    """Deterministic 'later' snapshot: priority rewritten on every 50th
    order, every 97th order deleted, 5 synthetic inserts."""
    spark = orders.sparkSession
    base = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 50 == 0, F.lit("9-RESTATED")
            ).otherwise(F.col("o_orderpriority")).alias("o_orderpriority"),
        )
    )
    ins = spark.range(1, 6).select(
        (F.col("id") + F.lit(900_000_000)).alias("o_orderkey"),
        F.lit("5-NEW").alias("o_orderpriority"),
    )
    return base.unionByName(ins)


ORDERS_V2_SQL = """
scd_v2 AS MATERIALIZED (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 50 = 0 THEN '9-RESTATED'
                ELSE o_orderpriority END AS o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT 900000000 + g.i AS o_orderkey, '5-NEW' AS o_orderpriority
    FROM generate_series(1, 5) g(i)
)"""


def scd2_merge(v1: DataFrame, v2: DataFrame) -> DataFrame:
    """(o_orderkey, o_orderpriority, valid_from, valid_to) SCD2 history
    from two snapshots (version ids 1 and 2; NULL valid_to = open)."""
    a = v1.select(
        F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("pa")
    )
    b = v2.select(
        F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("pb")
    )
    j = a.join(b, "k", "full_outer")
    unchanged = j.filter(F.col("pa") == F.col("pb")).select(
        F.col("k").alias("o_orderkey"),
        F.col("pa").alias("o_orderpriority"),
        F.lit(1).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    closed = j.filter(
        F.col("pa").isNotNull()
        & (F.col("pb").isNull() | (F.col("pa") != F.col("pb")))
    ).select(
        F.col("k").alias("o_orderkey"),
        F.col("pa").alias("o_orderpriority"),
        F.lit(1).cast("long").alias("valid_from"),
        F.lit(2).cast("long").alias("valid_to"),
    )
    opened = j.filter(
        F.col("pb").isNotNull()
        & (F.col("pa").isNull() | (F.col("pa") != F.col("pb")))
    ).select(
        F.col("k").alias("o_orderkey"),
        F.col("pb").alias("o_orderpriority"),
        F.lit(2).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    return unchanged.unionByName(closed).unionByName(opened)


SCD2_MERGE_SQL = """
SELECT k AS o_orderkey, pa AS o_orderpriority,
       CAST(1 AS BIGINT) AS valid_from, CAST(NULL AS BIGINT) AS valid_to
FROM scd_j WHERE pa = pb
UNION ALL
SELECT k, pa, 1, 2 FROM scd_j
WHERE pa IS NOT NULL AND (pb IS NULL OR pa <> pb)
UNION ALL
SELECT k, pb, 2, NULL FROM scd_j
WHERE pb IS NOT NULL AND (pa IS NULL OR pa <> pb)"""

SCD2_JOIN_SQL = """
scd_j AS MATERIALIZED (
    SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
           a.o_orderpriority AS pa, b.o_orderpriority AS pb
    FROM (SELECT o_orderkey, o_orderpriority FROM orders) a
    FULL OUTER JOIN scd_v2 b ON a.o_orderkey = b.o_orderkey
)"""
